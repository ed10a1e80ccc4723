package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-selection operators for training-data pipelines: pick WHICH
  * documents make the training mix once dedup/quality signals exist.
  *  - [[tokenBudget]]: per-stratum "best documents first until the token
  *    budget is spent" — the standard data-mixing step.
  *  - [[stratifiedSample]]: deterministic hash-bucket downsampling with a
  *    per-stratum rate — rebalances over-represented strata reproducibly.
  *  - [[exportShuffle]]: seeded deterministic global shuffle into numbered
  *    shards — the final "write the training set in random order" step.
  *  - [[mixSources]]: weight-proportional deterministic interleave of
  *    sources (stride scheduling) — the curriculum/domain-mixing step.
  */
object Selection {

  /** Per-stratum token-budget selection: within each stratum keep documents
    * in (score DESC, id ASC) order while the running token total stays at or
    * under `budget`. Semantically identical to the per-document window
    * `sum(tok) OVER (PARTITION BY stratum ORDER BY score DESC, id ROWS
    * UNBOUNDED PRECEDING..CURRENT)` + `cum <= budget` — but that plan sorts
    * whole strata through single tasks (a handful of languages at 100 TB =
    * a handful of tasks). Instead:
    *
    *  1. aggregate to (stratum, score) LEVELS — map-side combinable, and the
    *     result has one row per distinct score value, metadata-sized no
    *     matter the corpus;
    *  2. run the cumulative window on that level frame to get each level's
    *     starting offset `prev_tok`, and PRUNE levels that start at or past
    *     the budget (their documents can never fit: tokens are ≥ 1);
    *  3. join the offsets back (broadcast-sized build side) and cumulate
    *     only WITHIN a (stratum, score) level, ordered by id — fine-grained
    *     window keys that distribute across the cluster, fed only by the
    *     surviving levels.
    *
    * Output: (stratum, id, score, tok, cum) for kept documents, where `cum`
    * equals the naive per-document running total. */
  def tokenBudget(docs: DataFrame, stratumCol: String, idCol: String,
                  score: Column, tok: Column, budget: Long): DataFrame = {
    val feat = docs.select(col(stratumCol).as("stratum"), col(idCol).as("id"),
      score.as("score"), tok.cast("long").as("tok"))
    val lvl = feat.groupBy("stratum", "score").agg(sum("tok").as("lvl_tok"))
    val byScore = Window.partitionBy("stratum").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = lvl
      .withColumn("prev_tok", sum(col("lvl_tok")).over(byScore) - col("lvl_tok"))
      .filter(col("prev_tok") < budget)
      .select(col("stratum"), col("score"), col("prev_tok"))
    val withinLevel = Window.partitionBy("stratum", "score").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    feat.join(offsets, Seq("stratum", "score")) // inner join prunes dead levels
      .withColumn("cum", col("prev_tok") + sum(col("tok")).over(withinLevel))
      .filter(col("cum") <= budget)
      .select(col("stratum"), col("id"), col("score"), col("tok"), col("cum"))
  }

  /** Deterministic per-stratum downsampling: keep a row iff
    * `H(stratum ':' id) mod 1000 < ratePm(row)`, H = the portable
    * first-60-bits-of-md5 hash ([[Dedup.shingleHash]]). Per-row and
    * shuffle-free; no RNG state, so the sample is reproducible across
    * engines, retries, and partitionings, and raising a stratum's permille
    * strictly grows its sample (nested samples — the property data-mixing
    * reruns rely on). Output: the input rows that survive, plus their
    * `bucket` (0..999). */
  def stratifiedSample(docs: DataFrame, stratumCol: String, idCol: String,
                       ratePm: Column): DataFrame =
    docs.withColumn("bucket",
        Dedup.shingleHash(concat_ws(":", col(stratumCol), col(idCol)))
          % Dedup.MinhashP % 1000)
      .filter(col("bucket") < ratePm)

  /** Seeded deterministic training-export shuffle: route each document to a
    * shard by hash and order it within the shard by the same hash — the
    * "write the final corpus in random order, reproducibly" step every
    * training run needs (sequential readers must not see the corpus in
    * source/crawl order; re-runs and retried tasks must produce the SAME
    * order; changing `seed` produces an independent order).
    *
    * Scale shape: `H(seed ':' id)` is per-row (no RNG state, portable md5 —
    * the [[Dedup.shingleHash]] value DuckDB reproduces); the only shuffle is
    * the per-shard `row_number` window, whose partition key is the shard id.
    * A shard is an EXPORT FILE, so `numShards` is chosen to make one shard ≈
    * one output file (hundreds of MB) — one task sorting one export file's
    * ids is the intended physical plan, parallel across the thousands of
    * shards a 100 TB export writes. Hash ties (60-bit space) break by id, so
    * the order is total and engine-independent.
    *
    * Output: input columns + (shard, pos) — `pos` is 1-based within shard. */
  def exportShuffle(docs: DataFrame, idCol: String, seed: String,
                    numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val byShard = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
    docs
      .withColumn("__h", Dedup.shingleHash(concat_ws(":", lit(seed), col(idCol))))
      .withColumn("shard", (col("__h") % numShards).cast("int"))
      .withColumn("pos", row_number().over(byShard).cast("long"))
      .drop("__h")
  }

  /** Concat-and-chunk sequence packing: the step between "selected corpus"
    * and "training shards" — documents are laid end to end in a seeded
    * deterministic order and the concatenated token stream is cut into
    * fixed windows of `windowTokens` (the GPT-pretraining packing shape:
    * documents SPLIT across window boundaries; no padding waste). Each
    * output row is one (document, window) overlap with enough coordinates
    * to materialize the window: where the document starts inside it and how
    * many of its tokens land there.
    *
    * Scale shape: the global token prefix-sum NEVER runs as one corpus-wide
    * window. Like [[tokenBudget]]/[[mixSources]], it decomposes over seeded
    * hash buckets: per-bucket token sums (map-side combinable — the frame is
    * `buckets` rows, metadata-sized) prefix-sum to bucket base offsets on
    * the tiny frame, and the per-document cumulation runs WITHIN a bucket —
    * fine-grained window keys that spread across the cluster. The global
    * order is (bucket, hash, id), reproducible across engines, retries and
    * partitionings; re-packing after an upstream change moves only the
    * buckets whose contents changed... plus everything downstream of the
    * first moved token — which is why the seed is part of the contract.
    *
    * Zero-token documents contribute nothing to the stream and are dropped
    * (a packed window cannot hold them).
    *
    * Output: (id, tok, gstart, bin, off_in_bin, len_in_bin) — `gstart` the
    * document's global token offset, `bin` the window id, `off_in_bin`
    * where the document's surviving tokens begin within the window,
    * `len_in_bin` how many land there. Σ len_in_bin over a bin =
    * `windowTokens` (except the last). */
  def packSequences(docs: DataFrame, idCol: String, tok: Column,
                    windowTokens: Long, seed: String = "pack",
                    buckets: Int = 4096): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val base = docs.select(col(idCol).as("id"), tok.cast("long").as("tok"))
      .filter(col("tok") >= 1)
      .withColumn("__h", Dedup.shingleHash(concat_ws(":", lit(seed), col("id"))))
      .withColumn("__b", (col("__h") % buckets).cast("int"))
    val counts = base.groupBy("__b").agg(sum("tok").as("__n"))
    // tiny frame (≤ `buckets` rows): the single-partition window is fine HERE
    val byBucket = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("__off", sum(col("__n")).over(byBucket) - col("__n"))
      .select(col("__b"), col("__off"))
    val withinBucket = Window.partitionBy("__b").orderBy(col("__h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("cum", col("__off") + sum(col("tok")).over(withinBucket))
      .withColumn("gstart", col("cum") - col("tok"))
      .select(col("id"), col("tok"), col("gstart"),
        col("cum"),
        explode(sequence(expr(s"gstart div $windowTokens"),
          expr(s"(cum - 1) div $windowTokens"))).as("bin"))
      .withColumn("off_in_bin",
        greatest(col("gstart") - col("bin") * windowTokens, lit(0L)))
      .withColumn("len_in_bin",
        least(col("cum"), (col("bin") + 1) * windowTokens) -
          greatest(col("gstart"), col("bin") * windowTokens))
      .select(col("id"), col("tok"), col("gstart"), col("bin"),
        col("off_in_bin"), col("len_in_bin"))
  }

  /** Weight-proportional deterministic source interleave (stride scheduling):
    * document r (1-based, in seeded-hash order) of a source with weight w is
    * placed at integer coordinate `r · 1000000 div w`; reading the corpus in
    * `(coord, source, id)` order yields every prefix with per-source shares
    * proportional to the weights — the curriculum/domain-mixing step, with no
    * RNG and no resampling (each source's own order is itself a seeded
    * shuffle, so a budget cut = a prefix = a smaller valid mix).
    *
    * Scale shape: the per-source rank is the same level-offset trick as
    * [[tokenBudget]] — NO corpus-wide per-source window (a source is
    * terabytes; one task must never sort one). Ranks decompose over hash
    * buckets: per-(source, bucket) counts (map-side combinable,
    * metadata-sized result) prefix-sum to bucket offsets, and `row_number`
    * runs only WITHIN a (source, bucket) — fine-grained window keys that
    * spread across the cluster. `weights` is one row per source — a
    * broadcast-scale control frame by construction.
    *
    * Output: (source, id, rank, coord). */
  def mixSources(docs: DataFrame, sourceCol: String, idCol: String,
                 weights: DataFrame, seed: String = "mix",
                 buckets: Int = 4096): DataFrame = {
    val base = docs.select(col(sourceCol).as("source"), col(idCol).as("id"))
      .withColumn("__h", Dedup.shingleHash(concat_ws(":", lit(seed), col("source"), col("id"))))
      .withColumn("__b", (col("__h") % buckets).cast("int"))
    val counts = base.groupBy("source", "__b").agg(count(lit(1)).as("__n"))
    val byBucket = Window.partitionBy("source").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("__off", sum(col("__n")).over(byBucket) - col("__n"))
      .select(col("source"), col("__b"), col("__off"))
    val withinBucket = Window.partitionBy("source", "__b").orderBy(col("__h"), col("id"))
    base
      .join(offsets, Seq("source", "__b"))
      .withColumn("rank", col("__off") + row_number().over(withinBucket))
      // LEFT join + in-row check: an inner join would silently DROP every
      // document of a source missing from `weights` — a training-mix
      // operator must under-represent nothing quietly. The guard lives in
      // the output expression so column pruning can never elide it.
      .join(broadcast(weights.select(col("source"), col("weight").cast("long"))),
        Seq("source"), "left")
      .withColumn("coord",
        when(col("weight").isNull || col("weight") <= 0,
          raise_error(concat(lit("mixSources: missing or non-positive weight "),
            lit("for source "), col("source"))).cast("long"))
          .otherwise(expr("rank * 1000000 div weight")))
      .select(col("source"), col("id"), col("rank"), col("coord"))
  }

  /** Exact stratified train/val/test split assignment — every row of every
    * stratum lands in EXACTLY one named split, and each stratum's split
    * sizes are the largest-remainder (Hamilton) apportionment of its row
    * count by the declared weights: |quota_s − n·w_s/W| < 1 per stratum,
    * Σ quotas = n exactly. The apportionment step of dataset splitting —
    * a sampling RATE (q41) can miss a stratum's last row or double a
    * split's share by rounding; training/eval splits need exact disjoint
    * quotas per language/source stratum.
    *
    * Deterministic, no RNG: rows rank within their stratum by the seeded
    * portable md5 hash (ties by id), so the assignment is reproducible
    * across runs, engines and partitionings. Ranks are weight-independent;
    * a weight change only moves the cumulative boundaries (but
    * largest-remainder quotas are famously non-monotone in the weights —
    * no per-split nesting guarantee is claimed).
    *
    * Quota arithmetic is pure integer: base_s = n·w_s div W, remainder
    * r_s = n·w_s mod W; the n − Σ base_s leftover units go to the largest
    * r_s (ties by declared split order). All engine-portable.
    *
    * 100 TB posture: per-stratum rank uses the [[mixSources]] bucket
    * decomposition — md5-bucket counts (≤ `buckets` rows per stratum)
    * give bucket offsets via a metadata-scale window, ranks are offset +
    * within-bucket row_number — never a corpus-wide sort; the quota frame
    * is (strata × splits) rows with ≤64 splits, window partitions of ≤64;
    * the boundary join back is stratum-keyed with a ×|splits| bounded
    * fan-out filtered to one row. */
  def splitAssign(docs: DataFrame, strataCol: String, idCol: String,
                  splits: Seq[(String, Long)], seed: String = "split",
                  buckets: Int = 4096): DataFrame = {
    validateSplits(splits, "splitAssign")
    val totalW = splits.map(_._2).sum
    val sdf = splitFrame(docs.sparkSession, splits)
    val (ranked, totals) = rankedBase(docs, strataCol, idCol, seed, buckets)

    // largest-remainder quotas → cumulative [lo, hi] rank boundaries
    val byIdx = Window.partitionBy("stratum").orderBy("__i")
    val bounds = hamiltonQuotas(totals, sdf, totalW, col("__nt"))
      .withColumn("__hi",
        sum(col("__quota")).over(byIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__lo", col("__hi") - col("__quota"))
      .select(col("stratum"), col("split"), col("__lo"), col("__hi"))

    ranked
      .join(bounds, Seq("stratum"))
      .filter(col("rank_in_stratum") > col("__lo") &&
        col("rank_in_stratum") <= col("__hi"))
      .select(col("id"), col("stratum"), col("split"), col("rank_in_stratum"))
  }

  /** The STANDING-pipeline form of [[splitAssign]]: apportion a NEW batch
    * so the CUMULATIVE split sizes track the exact Hamilton quotas of the
    * cumulative corpus — per-batch exactness ([[splitAssign]] each batch
    * independently) lets the global train/val/test ratio wander when batch
    * strata fluctuate; a standing intake needs the ratio to hold over
    * everything ingested so far.
    *
    * `prior` is the accumulated per-(stratum, split) assignment count —
    * (`stratum`, `split`, `n_assigned`) — from previous batches (merge
    * batch outputs with [[splitCounters]]). Batch rows rank exactly as in
    * [[splitAssign]] (same seeded-md5 bucket decomposition; pass a
    * per-batch seed); the rank line is cut into intervals sized
    * `need_s,j = max(0, cumQuota_s,j − assigned_s,j)` in declared split
    * order, where `cumQuota` is the Hamilton apportionment of the
    * cumulative stratum total (prior + batch). Since Σ_j cumQuota = n_cum
    * and Σ_j assigned = n_prior, the unclamped needs sum to the batch size
    * — every batch row lands in exactly one split; clamping (a split
    * already OVER its cumulative quota, possible because Hamilton is
    * non-monotone and batches are irrevocable) shifts the excess to later
    * splits, so the cumulative deviation |assigned − cumQuota| stays
    * bounded by small per-stratum constants instead of growing with
    * batches (property-tested over random batch sequences). With an empty
    * `prior` this IS [[splitAssign]] (needs = quotas).
    *
    * Same output schema as [[splitAssign]]; `rank_in_stratum` is
    * batch-local. Same 100 TB posture — the only new frame is `prior`,
    * (strata × splits)-sized. */
  def splitAssignContinuing(docs: DataFrame, strataCol: String, idCol: String,
                            splits: Seq[(String, Long)], prior: DataFrame,
                            seed: String, buckets: Int = 4096): DataFrame = {
    validateSplits(splits, "splitAssignContinuing")
    require(prior.columns.toSeq == Seq("stratum", "split", "n_assigned"),
      s"splitAssignContinuing: prior must be (stratum, split, n_assigned) — " +
        s"splitCounters output — got ${prior.columns.toSeq}")
    val known = splits.map(_._1).toSet
    // clamped probe: ≤ 65 distinct names decide (declared splits are ≤ 64,
    // one extra proves corruption) — never a wide collect on a bad prior
    val badSplits = prior.select("split").distinct().limit(known.size + 1)
      .collect().map(_.getString(0)).filterNot(known)
    require(badSplits.isEmpty,
      s"splitAssignContinuing: prior carries unknown split names " +
        s"${badSplits.mkString(", ")} — the declared splits are ${known.mkString(", ")}")
    val totalW = splits.map(_._2).sum
    val sdf = splitFrame(docs.sparkSession, splits)
    val (ranked, totals) = rankedBase(docs, strataCol, idCol, seed, buckets,
      op = "splitAssignContinuing")

    // Pre-aggregate by (stratum, split): a hand-built prior with duplicate
    // rows (e.g. raw un-merged splitCounters parts) would otherwise
    // multiply the bound rows after the quota left join, silently cutting
    // overlapping rank intervals — summing duplicates makes any
    // non-negative counter frame safe to pass. The frame stays
    // (strata × splits)-sized either way.
    val priorChecked = prior.select(col("stratum"), col("split"),
      when(col("n_assigned").isNull || col("n_assigned") < 0,
        raise_error(lit("splitAssignContinuing: null/negative n_assigned in " +
          "prior — counters must be non-negative")).cast("long"))
        .otherwise(col("n_assigned").cast("long")).as("__asg"))
      .groupBy("stratum", "split").agg(sum(col("__asg")).as("__asg"))
    val priorTotals = priorChecked.groupBy("stratum")
      .agg(sum(col("__asg")).as("__np"))

    // Hamilton quotas of the CUMULATIVE stratum totals, minus what earlier
    // batches already assigned (clamped at 0), cut in declared order
    val byIdx = Window.partitionBy("stratum").orderBy("__i")
    val bounds = hamiltonQuotas(
        totals.join(broadcast(priorTotals), Seq("stratum"), "left_outer")
          .withColumn("__ntc", col("__nt") + coalesce(col("__np"), lit(0L))),
        sdf, totalW, col("__ntc"))
      .join(broadcast(priorChecked), Seq("stratum", "split"), "left_outer")
      .withColumn("__need",
        greatest(lit(0L), col("__quota") - coalesce(col("__asg"), lit(0L))))
      .withColumn("__hi",
        sum(col("__need")).over(byIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__lo", col("__hi") - col("__need"))
      .select(col("stratum"), col("split"), col("__lo"), col("__hi"))

    ranked
      .join(bounds, Seq("stratum"))
      .filter(col("rank_in_stratum") > col("__lo") &&
        col("rank_in_stratum") <= col("__hi"))
      .select(col("id"), col("stratum"), col("split"), col("rank_in_stratum"))
  }

  /** Fold a batch's [[splitAssign]]/[[splitAssignContinuing]] output into
    * the accumulated per-(stratum, split) counters the continuing form
    * takes as `prior`. */
  def splitCounters(assignments: DataFrame, prior: DataFrame): DataFrame = {
    require(prior.columns.toSeq == Seq("stratum", "split", "n_assigned"),
      s"splitCounters: prior must be (stratum, split, n_assigned), got ${prior.columns.toSeq}")
    assignments.groupBy("stratum", "split").agg(count(lit(1)).as("n_assigned"))
      .unionByName(prior)
      .groupBy("stratum", "split").agg(sum(col("n_assigned")).as("n_assigned"))
  }

  private def validateSplits(splits: Seq[(String, Long)], op: String): Unit = {
    require(splits.nonEmpty && splits.size <= 64,
      s"$op: 1..64 splits, got ${splits.size}")
    require(splits.forall(_._2 > 0),
      s"$op: weights must be positive, got $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"$op: duplicate split names in ${splits.map(_._1)}")
  }

  private def splitFrame(ss: org.apache.spark.sql.SparkSession,
                         splits: Seq[(String, Long)]): DataFrame = {
    import ss.implicits._
    splits.zipWithIndex.map { case ((nm, w), i) => (nm, w, i) }
      .toDF("split", "__w", "__i")
  }

  /** The shared seeded-md5 bucket-decomposed per-stratum rank (never a
    * corpus sort) + stratum totals. Null strata are refused loudly: the
    * stratum-keyed equi-joins downstream are null-rejecting, so a
    * null-stratum row would silently vanish — violating the "every row
    * lands in EXACTLY one split" contract. */
  private def rankedBase(docs: DataFrame, strataCol: String, idCol: String,
                         seed: String, buckets: Int,
                         op: String = "splitAssign"): (DataFrame, DataFrame) = {
    val base = docs.select(
        when(col(strataCol).isNull,
          raise_error(lit(s"$op: null $strataCol — every row must " +
            "land in exactly one split, but a null stratum would drop from " +
            "the stratum-keyed quota joins; filter or impute strata first"))
            .cast(docs.schema(strataCol).dataType))
          .otherwise(col(strataCol)).as("stratum"),
        col(idCol).as("id"))
      .withColumn("__h", Dedup.shingleHash(
        concat_ws(":", lit(seed), col("stratum"), col("id"))))
      .withColumn("__b", (col("__h") % buckets).cast("int"))
    val counts = base.groupBy("stratum", "__b").agg(count(lit(1)).as("__n"))
    val byBucket = Window.partitionBy("stratum").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("__off", sum(col("__n")).over(byBucket) - col("__n"))
      .select(col("stratum"), col("__b"), col("__off"))
    val totals = counts.groupBy("stratum").agg(sum(col("__n")).as("__nt"))
    val withinBucket = Window.partitionBy("stratum", "__b").orderBy(col("__h"), col("id"))
    val ranked = base
      .join(offsets, Seq("stratum", "__b"))
      .withColumn("rank_in_stratum", col("__off") + row_number().over(withinBucket))
    (ranked, totals)
  }

  /** Largest-remainder (Hamilton) quotas per stratum over `totalCol` rows:
    * base = n·w div W, the n − Σ base leftovers to the largest remainders
    * (ties by declared split order). Returns the totals × splits frame
    * with `__quota` (and `__i` for declared-order windows). */
  private def hamiltonQuotas(totals: DataFrame, sdf: DataFrame, totalW: Long,
                             totalCol: Column): DataFrame = {
    val byRem = Window.partitionBy("stratum")
      .orderBy(col("__rem").desc, col("__i"))
    totals.crossJoin(broadcast(sdf))
      .withColumn("__nn", totalCol)
      .withColumn("__basq", expr(s"__nn * __w div ${totalW}L"))
      .withColumn("__rem", expr(s"__nn * __w % ${totalW}L"))
      .withColumn("__left", col("__nn") - sum(col("__basq")).over(Window.partitionBy("stratum")))
      .withColumn("__quota",
        col("__basq") + when(row_number().over(byRem) <= col("__left"), 1L).otherwise(0L))
  }

  /** EXACT global score-quantile cut without a global sort — the "keep the
    * best `pct`% of the corpus by LM score" thresholding step. The k-th
    * smallest integer score (k = ⌈pct·N/100⌉, duplicates counted) is found
    * by the classic two-level decomposition:
    *
    *  1. ONE aggregate buckets scores into ≤ `maxBuckets` equal-width ranges
    *     (width derived from min/max — one metadata-scale pre-aggregate);
    *     bucket counts collect to the driver (≤ maxBuckets rows);
    *  2. the driver's cumulative sum locates the bucket holding position k;
    *  3. a distributed top-k (`orderBy.limit` → TakeOrdered) runs on THAT
    *     BUCKET'S rows only — a 1/maxBuckets slice of the corpus — and its
    *     max is the exact threshold.
    *
    * Kept = `score <= threshold` (ties at the threshold all kept — ≥ k rows,
    * deterministic). Integer scores only (the repo's micros contract):
    * equality and bucket arithmetic must be exact for the oracle to agree.
    * Output: (id, score, thr) for kept documents.
    *
    * CACHE LIFETIME: this convenience form discards the managed cleanup, so
    * the (id, score) MEMORY_AND_DISK cache it builds lives until the
    * session evicts it (the returned frame reads through the cache, so it
    * cannot be unpersisted here). One-shot jobs don't care; a LONG-LIVED
    * caller invoking this repeatedly should use [[quantileCutManaged]] and
    * release the handle after its consuming action. */
  def quantileCut(scored: DataFrame, idCol: String, scoreCol: String,
                  pct: Int, maxBuckets: Int = 4096): DataFrame =
    quantileCutManaged(scored, idCol, scoreCol, pct, maxBuckets)._1

  /** [[quantileCut]] plus the cleanup handle for the cached score frame
    * (the managed-persist contract of [[Dedup.jaccardJoin]]): the operator
    * runs FOUR actions over the scored frame (stats, bucket counts, the
    * one-bucket top-k, the final filter), so an unpersisted input replays
    * its whole upstream pipeline four times — measured 6.8 s → ~3 s at
    * sf0.1 when the input composes the q55 LM scoring. The cache is
    * (id, score) — 16 bytes/row, corpus-scale but column-minimal. */
  def quantileCutManaged(scored: DataFrame, idCol: String, scoreCol: String,
                         pct: Int, maxBuckets: Int = 4096): (DataFrame, () => Unit) = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100], got $pct")
    val backing = scored.select(col(idCol).as("id"), col(scoreCol).cast("long").as("score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Flat lineage barrier over the cache (graft.plans.Barrier contract):
    // the operator runs FOUR actions, and each would re-run Catalyst
    // ANALYSIS of the caller's full scoring plan (q63 composes the q55
    // bigram-LM pipeline) even with the persist hot.
    val base = graft.plans.Barrier.flatten(backing)
    val stats = base.agg(count(lit(1)).as("n"), min("score").as("lo"),
      max("score").as("hi")).head()
    val n = stats.getLong(0)
    require(n > 0, "quantileCut: empty input")
    val (lo, hi) = (stats.getLong(1), stats.getLong(2))
    val k = (pct.toLong * n + 99) / 100
    val width = math.max(1L, (hi - lo) / maxBuckets + 1)
    val counts = base
      .groupBy(expr(s"(score - $lo) div $width").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // driver cumsum over ≤ maxBuckets rows: find the bucket holding rank k
    var cum = 0L
    var target = -1L
    var before = 0L
    counts.iterator.takeWhile(_ => target < 0).foreach { case (b, c) =>
      if (cum + c >= k) { target = b; before = cum } else cum += c
    }
    val kInBucket = (k - before).toInt
    // exact k'-th smallest within the one target bucket: distributed top-k
    val thr = base
      .filter(expr(s"(score - $lo) div $width") === target)
      .orderBy("score").limit(kInBucket)
      .agg(max("score")).head().getLong(0)
    (base.filter(col("score") <= thr).withColumn("thr", lit(thr)),
      () => { backing.unpersist(); () })
  }

  /** EXACT PER-GROUP score quantile — the grouped form of [[quantileCut]],
    * fully DISTRIBUTED (no driver-side bucket state at all, so the group
    * count is unbounded): "the per-source median document length", "each
    * language's 90th-percentile quality score". Same two-level bucket
    * decomposition, with every stage keyed by the group:
    *
    *  1. per-group (n, lo, hi) aggregate — a groups-scale frame;
    *  2. equal-width bucket counts per (group, bucket) — ONE corpus pass;
    *     the per-group running sum over that ≤ (groups × maxBuckets) grid
    *     locates each group's bucket holding rank k_g = ⌈pct·n_g/100⌉;
    *  3. only THAT bucket's rows per group (a ~1/maxBuckets slice) rank
    *     within the group, and the k'-th value is the exact threshold —
    *     never a per-group sort of the corpus.
    *
    * Output: one row per group — (`groupCol`, `n`, `thr`), `thr` = the
    * exact k-th smallest `valueCol` of the group, duplicates counted
    * (rank semantics: the value at `row_number() = ⌈pct·n/100⌉` ordered by
    * value — engine-portable, tie-break-free). Integer values only (the
    * micros contract: bucket arithmetic and equality must be exact). Null
    * groups and null values are refused loudly ([[splitAssign]]'s rule:
    * the keyed joins would silently drop them). */
  def groupedQuantile(docs: DataFrame, groupCol: String, valueCol: String,
                      pct: Int, maxBuckets: Int = 4096): DataFrame =
    groupedQuantiles(docs, groupCol, valueCol, Seq(pct), maxBuckets)
      .select(col(groupCol), col("n"), col("thr"))

  /** The VECTOR form of [[groupedQuantile]]: every percentile in `pcts`
    * for every group, still in the SAME two corpus passes — the bucket
    * grid is computed once, each (group, pct) rank locates its own target
    * bucket on the grid, and the one in-bucket ranking pass serves every
    * percentile landing in that bucket (a row joins at most |pcts| target
    * rows). The per-source length/quality PROFILE (p10/p50/p90) costs the
    * same as a single median. Output: one row per (group, pct) —
    * (`groupCol`, `n`, `pct`, `thr`). */
  def groupedQuantiles(docs: DataFrame, groupCol: String, valueCol: String,
                       pcts: Seq[Int], maxBuckets: Int = 4096): DataFrame = {
    require(pcts.nonEmpty && pcts.size <= 64,
      s"groupedQuantiles: 1..64 percentiles, got ${pcts.size}")
    require(pcts.forall(p => p >= 1 && p <= 100),
      s"groupedQuantiles: pcts in [1,100], got $pcts")
    require(pcts.distinct.size == pcts.size,
      s"groupedQuantiles: duplicate percentiles in $pcts")
    require(maxBuckets >= 2, s"groupedQuantiles: maxBuckets >= 2, got $maxBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
      when(col(groupCol).isNull,
        raise_error(lit("groupedQuantile: null group — the group-keyed " +
          "quantile joins would silently drop it; filter or label first"))
          .cast(docs.schema(groupCol).dataType))
        .otherwise(col(groupCol)).as("__g"),
      when(col(valueCol).isNull,
        raise_error(lit("groupedQuantile: null value — a quantile over " +
          "unknown values is not a statistic")).cast("long"))
        .otherwise(col(valueCol).cast("long")).as("__v"))
    val stats = base.groupBy("__g").agg(
        count(lit(1)).as("__n"), min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
      .withColumn("__w", expr(s"(__hi - __lo) div $maxBuckets + 1"))
      .select("__g", "__n", "__lo", "__w")
    // one rank per (group, pct): k = ceil(pct * n / 100). The single-pct
    // form (the [[groupedQuantile]]/[[robustOutliers]] path) stays a plain
    // projection — no pct cross join in its plan at all.
    val ranks = pcts match {
      case Seq(p) => stats.select(col("__g"), lit(p).as("__pct"),
        expr(s"(__n * $p + 99) div 100").as("__k"))
      case _ => stats.select("__g", "__n")
        .crossJoin(broadcast(pcts.toDF("__pct")))
        .withColumn("__k", expr("(__n * __pct + 99) div 100"))
        .select("__g", "__pct", "__k")
    }
    // bucket counts + per-group running sum over the bounded grid
    val bucketed = base.join(stats, "__g")
      .withColumn("__b", expr("(__v - __lo) div __w"))
    val counts = bucketed.groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
    val byB = Window.partitionBy("__g").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val target = counts
      .withColumn("__cum", sum(col("__c")).over(byB))
      .join(ranks, "__g")
      .filter(col("__cum") >= col("__k") && col("__cum") - col("__c") < col("__k"))
      .select(col("__g"), col("__pct"), col("__b").as("__tb"),
        (col("__k") - (col("__cum") - col("__c"))).as("__kin"))
    // exact k'-th smallest within each (group, pct)'s one target bucket;
    // the target frame is (groups × pcts)-scale — broadcast it. A row
    // joins every pct whose rank lands in its bucket (≤ |pcts| fan-out).
    val thr = bucketed.join(broadcast(target), Seq("__g"))
      .filter(col("__b") === col("__tb"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__g", "__pct").orderBy("__v")))
      .filter(col("__rn") <= col("__kin"))
      .groupBy("__g", "__pct").agg(max(col("__v")).as("thr"))
    stats.select(col("__g"), col("__n").as("n"))
      .join(thr, "__g")
      .select(col("__g").as(groupCol), col("n"),
        col("__pct").as("pct"), col("thr"))
  }

  /** Robust per-group OUTLIER flagging via median/MAD — the
    * length/score-anomaly filter a curation pipeline runs per source
    * ("drop documents whose word count is wildly atypical FOR THEIR
    * source", where a global cut would mis-score sources with different
    * typical lengths). Exact integer statistics end to end:
    * `med_g` = the group's ⌈n/2⌉-th smallest value ([[groupedQuantile]]
    * at pct=50), `mad_g` = the median of |value − med_g| (same machinery
    * on the deviations), outlier ⇔ |value − med_g| > madMult·mad_g. No
    * 1.4826 consistency constant — that's a float; the caller tunes the
    * integer `madMult` instead (5 ≈ the classic 3·1.4826). NOTE: a group
    * whose majority value is one point (mad = 0) flags EVERY deviating
    * row — the statistic is telling the truth about that distribution;
    * widen with madMult only on real spread.
    *
    * Output: one row per input doc — (`idCol`, `groupCol`, `value`,
    * `med`, `mad`, `is_outlier`). Two corpus passes per quantile (the
    * [[groupedQuantile]] shape) + two groups-scale broadcast joins back;
    * never a per-group sort. */
  def robustOutliers(docs: DataFrame, idCol: String, groupCol: String,
                     valueCol: String, madMult: Long = 5,
                     maxBuckets: Int = 4096): DataFrame = {
    require(madMult >= 0, s"robustOutliers: madMult >= 0, got $madMult")
    val med = groupedQuantile(docs, groupCol, valueCol, 50, maxBuckets)
      .select(col(groupCol), col("thr").as("med"))
    val withMed = docs.select(col(idCol), col(groupCol),
        col(valueCol).cast("long").as("value"))
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col("value") - col("med")))
    val mad = groupedQuantile(withMed, groupCol, "__dev", 50, maxBuckets)
      .select(col(groupCol), col("thr").as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("value"), col("med"), col("mad"),
        (col("__dev") > lit(madMult) * col("mad")).as("is_outlier"))
  }

  /** Weight-proportional SYSTEMATIC sampling (PPS): pick exactly `k`
    * documents (with multiplicity) with probability proportional to an
    * integer weight — the fixed-budget importance subsample step (e.g.
    * DSIR/quality-weighted corpus selection), with NO RNG: documents are
    * laid end-to-end on a weight line in seeded-hash order and a systematic
    * grid of k points with stride `W div k` (grid phase = seeded hash mod
    * stride) picks the document whose interval contains each point. All
    * integer arithmetic — reproducible across engines, retries and
    * partitionings; a document heavier than the stride is legitimately
    * picked more than once (`n_picks` carries the multiplicity — the PPS
    * contract; Σ n_picks = k exactly).
    *
    * Scale shape: the global weight prefix-sum decomposes over seeded hash
    * buckets exactly like [[packSequences]] — per-bucket sums (metadata-
    * sized frame) prefix-summed for base offsets, per-document cumulation
    * within buckets; the grid parameters ride a broadcast 1-row frame. No
    * corpus-wide window, no driver action.
    *
    * Zero/negative-weight documents are excluded (they own no interval).
    * REFUSES (raise_error) when total weight < k — a stride of zero has no
    * meaningful grid and silently returning fewer picks would corrupt a
    * fixed-budget pipeline. Output: (id, w, n_picks), n_picks ≥ 1. */
  def weightedSystematic(docs: DataFrame, idCol: String, weightCol: String,
                         k: Long, seed: String, buckets: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = docs.select(col(idCol).as("id"), col(weightCol).cast("long").as("w"))
      .filter(col("w") >= 1)
      .withColumn("__h", Dedup.shingleHash(concat_ws(":", lit(seed), col("id"))))
      .withColumn("__b", (col("__h") % buckets).cast("int"))
    val counts = base.groupBy("__b").agg(sum("w").as("__n"))
    val byBucket = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("__off", sum(col("__n")).over(byBucket) - col("__n"))
      .select(col("__b"), col("__off"))
    // grid parameters: 1-row broadcast. stride = W div k; phase g0 < stride
    val grid = counts.agg(sum("__n").as("__W"))
      .select(col("__W"),
        when(expr(s"__W div $k") >= 1, expr(s"__W div $k"))
          .otherwise(raise_error(format_string(
            s"weightedSystematic: total weight %s < k=$k — no grid stride; " +
              "lower k or supply heavier weights", col("__W").cast("string")))
            .cast("long")).as("__stride"))
      .select(col("__stride"),
        pmod(Dedup.shingleHash(lit(seed)), col("__stride")).as("__g0"))
    val withinBucket = Window.partitionBy("__b").orderBy(col("__h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("cum", col("__off") + sum(col("w")).over(withinBucket))
      .withColumn("gstart", col("cum") - col("w"))
      .crossJoin(broadcast(grid))
      // picks(x) = #grid points < x = clamp(ceil((x − g0)/stride), 0, k)
      .withColumn("__pc", least(greatest(
        expr("(cum - __g0 + __stride - 1) div __stride"), lit(0L)), lit(k)))
      .withColumn("__pg", least(greatest(
        expr("(gstart - __g0 + __stride - 1) div __stride"), lit(0L)), lit(k)))
      .withColumn("n_picks", col("__pc") - col("__pg"))
      .filter(col("n_picks") > 0)
      .select(col("id"), col("w"), col("n_picks"))
  }

  /** Per-domain document cap — the Common-Crawl-style anti-SEO policy: no
    * single web domain may contribute more than `cap` documents, the kept
    * `cap` chosen by seeded deterministic hash order (not crawl order, which
    * over-represents whatever the crawler saw first). Combined with
    * [[graft.llm.TextAnalysis.urlHost]] this is the "cap every domain at N
    * pages" step big-corpus recipes apply before any quality filter.
    *
    * Scale shape: rank-by-hash within domain is a `row_number` window keyed
    * on the domain, and the `pos <= cap` filter sits DIRECTLY on it, which
    * Spark's InferWindowGroupLimit rewrites into a per-key top-k
    * (WindowGroupLimit): every map task keeps at most `cap` rows per domain
    * BEFORE the shuffle, so a 10^8-page megadomain contributes `cap` rows
    * per upstream partition to the exchange, not 10^8 — the skew a plain
    * window would die on is bounded by construction. Hash ties break by id;
    * the order is total and engine-portable ([[Dedup.shingleHash]]).
    *
    * Output: the surviving rows + `pos` (1-based rank within domain).
    * `pos` is a RESERVED output name and `__h` a reserved scratch name:
    * inputs already carrying either are refused loudly — the alternative
    * silently overwrote a caller's column with the rank. */
  def domainCap(docs: DataFrame, domainCol: String, idCol: String,
                cap: Int, seed: String): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    for (reserved <- Seq("__h", "pos"))
      require(!docs.columns.contains(reserved),
        s"domainCap reserves column name '$reserved' (rank scratch/output) — " +
          s"rename the input column first (have: ${docs.columns.mkString(", ")})")
    val byDomain = Window.partitionBy(col(domainCol))
      .orderBy(col("__h"), col(idCol))
    docs
      .withColumn("__h", Dedup.shingleHash(concat_ws(":", lit(seed), col(idCol))))
      .withColumn("pos", row_number().over(byDomain).cast("long"))
      .filter(col("pos") <= cap)
      .drop("__h")
  }
}
