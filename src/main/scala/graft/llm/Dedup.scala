package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * Scale posture (the 100 TB contract):
  *  - NOTHING here does an all-pairs comparison. Candidate generation is
  *    bucket-based (LSH banding): only documents sharing a band bucket meet in
  *    the join, so the shuffle is keyed on band hashes and the quadratic blowup
  *    is confined to genuine near-duplicate clusters.
  *  - Signatures are computed per-row with higher-order functions (no shuffle,
  *    no UDF), so the heavy part is embarrassingly parallel map work.
  *  - Exact dedup is a hash-groupBy (map-side partial aggregation applies);
  *    never a self-join.
  */
object Dedup {

  /** Word n-gram shingles of a lowercased text column, WITH duplicates —
    * cheaper when the consumer is duplicate-insensitive (min / explode+agg). */
  def shinglesRaw(text: Column, n: Int): Column = {
    val words = split(lower(text), " ")
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingles of a lowercased text column. */
  def shingles(text: Column, n: Int = 3): Column = array_distinct(shinglesRaw(text, n))

  /** Mersenne-prime modulus for the permutation family (fits 31 bits, so
    * `a*x + b` stays within a signed 64-bit product). */
  val MinhashP = 2147483647L

  /** Base hash of a shingle: first 60 bits of md5 as a signed long — computed
    * ONCE per shingle; all minhash permutations derive from it arithmetically.
    * (Hashing per (seed, shingle) pair would cost numHashes× the md5 work —
    * measured 111 s → ~10 s at sf0.1 for the near-dup query.) Portable: DuckDB
    * computes the identical value via `('0x'||substr(md5(s),1,15))::BIGINT`. */
  def shingleHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** (doc_id, whs: ARRAY<BIGINT>) — per-word base hashes H(word) mod P in
    * word order, each DISTINCT word md5'd exactly ONCE across the whole corpus
    * (vocabulary ≪ corpus: Heaps' law puts vocab at ~K·N^0.5, so at 100 TB the
    * dictionary is a few GB of (word, hash) pairs while occurrences are the
    * corpus itself — md5 per occurrence is the wrong cost model at any scale).
    *
    * Shape: explode → distinct-word dictionary (map-side partial agg collapses
    * each partition to its local vocab before the shuffle) → hash the dict →
    * join back to occurrences → groupBy collect+sort. The dict side carries NO
    * broadcast hint on purpose: a hint is honored regardless of size, and a
    * multi-GB vocabulary would OOM the driver / hit the 8 GB broadcast hard
    * limit. AQE sees the dict's true size at runtime (it sits behind the
    * distinct's shuffle) and converts to a broadcast join when it is small —
    * the common case — while a genuinely huge vocab degrades to a shuffled
    * join on the word key: still linear, never all-pairs.
    *
    * The final aggregate is also a HARD materialization boundary: a
    * column-level `transform(words, md5…)` gets inlined by CollapseProject
    * into every `element_at` of a consuming n-gram lambda, re-evaluating the
    * whole md5 array per element — measured O(n²) blowup (12 s → 120 s).
    * Do not "simplify" this back to a transform. */
  def wordHashFrame(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = docs.select(col(idCol).as("doc_id"),
      posexplode(split(lower(col(textCol)), " ")).as(Seq("__p", "__w")))
    val dict = occ.select(col("__w")).distinct()
      .select(col("__w"), (shingleHash(col("__w")) % MinhashP).as("__h"))
    occ.join(dict, "__w")
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__h")))),
        s => s.getField("__h")).as("whs"))
  }

  /** Word n-gram hash values from pre-hashed words (`whs` MUST be a
    * materialized attribute, e.g. [[wordHashFrame]] output): left polynomial
    * combine `((h1·31 + h2)·31 + h3) mod P` — plain 64-bit integer
    * arithmetic, so any engine reproduces it exactly. Duplicates retained
    * (consumers are min- or set-insensitive). */
  def ngramHashes(wh: Column, n: Int): Column =
    if (n > 7)
      // the mod-at-the-end product overflows a signed long for n ≥ 8
      // (P·31^7 ≈ 2^65.7): ARITHMETIC_OVERFLOW under Spark 4's default ANSI
      // mode, silently-negative "hashes" without it. The stepwise form is
      // value-identical (same modular algebra) and bounded at any n.
      graft.llm.Decontam.ngramHashesMod(wh, n, MinhashP)
    else
      when(size(wh) >= n,
        transform(sequence(lit(0), size(wh) - n),
          i => (0 until n).map(j => element_at(wh, i + j + 1))
            .reduce((a, b) => a * 31L + b) % MinhashP))
        .otherwise(array().cast("array<bigint>"))

  /** MinHash signature from PRE-HASHED shingle values (`xs` values in [0, P)):
    * element h is `min over x of (A_h·x + B_h) mod P` — the standard
    * universal-hash permutation family. Per-row computation, no shuffle.
    *
    * IMPORTANT: `xs` must be a materialized column, not an inline expression —
    * a nested lambda re-evaluates its argument per outer element, so inlining
    * the md5 here multiplies the hashing cost by numHashes (measured: 6 s →
    * 57 s at sf0.1). NOTE: [[nearDupPairs]] no longer uses this form at all —
    * nested HOFs run interpreted and their JIT behavior is per-JVM fragile
    * (see the note there); this stays as the array-form reference
    * implementation for array-shaped callers. */
  def minhashSignature(xs: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(xs,
        x => ((h.cast("long") * 1000003L + 12345L) * x + (h.cast("long") * 999983L + 7L)) % MinhashP)))

  /** LSH band keys for a signature: `bands` buckets of `rows` hashes each;
    * the key is the joined band slice (no extra hashing needed — the join is
    * on the exact values). Returns ARRAY<STRUCT<b INT, bkey STRING>>. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("b"),
        concat_ws("|",
          (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*).as("bkey")))

  /** Near-duplicate pairs via MinHash + LSH banding + exact Jaccard verify.
    * Output: (doc_a, doc_b, jac) with doc_a < doc_b, jac >= `threshold`.
    *
    * Plan shape: map (shingle+sign) → explode bands → shuffle on (b, bkey)
    * self-join → distinct pairs → re-join signatures for the verify. No
    * cross-join anywhere; at 1000 executors every stage partitions on either
    * the band key or the doc id. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 12, bands: Int = 4, threshold: Double = 0.5): DataFrame =
    nearDupPairsManaged(docs, idCol, textCol, numHashes, bands, threshold)._1

  /** (doc_id, mh: ARRAY<BIGINT>[numHashes]) MinHash signatures — the stage
    * [[nearDupPairsManaged]] and [[incrementalNearDupManaged]] share, and the
    * frame a pipeline PERSISTS as its dedup index (signatures, not text, are
    * what an incremental dedup stores between batches).
    *
    * Signature stage in ROW form, fully codegen'd: word-order gram hashes
    * via lead() windows, then numHashes min-aggregates — NOT the nested
    * `transform(seq, h => array_min(transform(xs, …)))` HOF. The nested-HOF
    * form runs in the interpreted expression path, and its per-JVM JIT
    * profile is fragile: measured 1.5 s vs 13.8 s for IDENTICAL sweeps in
    * different JVMs (both best-of-2 attempts slow — a sticky compilation
    * mode, not GC/disk). Window+aggregate stays inside whole-stage codegen,
    * which is immune to that and faster in the good case too.
    * Arithmetic is value-identical to the oracle: gram = ((h1·31+h2)·31+h3)
    * mod P over per-word hash-once md5 values; mh[h] = min((A_h·g + B_h)
    * mod P). At scale: one keyed shuffle on doc_id (the window), the
    * groupBy reuses that partitioning, per-row state is bounded (no
    * collect_list arrays). Unpersisted — the caller owns caching. */
  def minhashSigFrame(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val occ = docs.select(col(idCol).as("doc_id"),
      posexplode(split(lower(col(textCol)), " ")).as(Seq("__p", "__w")))
    val dict = occ.select(col("__w")).distinct()
      .select(col("__w"), (shingleHash(col("__w")) % MinhashP).as("__h"))
    val byDoc = Window.partitionBy("doc_id").orderBy("__p")
    val gram = occ.join(dict, "__w")
      .select(col("doc_id"), col("__p"), col("__h"))
      .withColumn("__h2", lead(col("__h"), 1).over(byDoc))
      .withColumn("__h3", lead(col("__h"), 2).over(byDoc))
      .filter(col("__h3").isNotNull)
      .withColumn("__g", ((col("__h") * 31L + col("__h2")) * 31L + col("__h3")) % MinhashP)
    gram.groupBy("doc_id")
      .agg(
        min((lit(12345L) * col("__g") + lit(7L)) % MinhashP).as("__m0"),
        (1 until numHashes).map(h =>
          min((lit(h * 1000003L + 12345L) * col("__g") + lit(h * 999983L + 7L)) % MinhashP)
            .as(s"__m$h")): _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(h => col(s"__m$h")): _*).as("mh"))
  }

  /** Exploded LSH band keys of a signature frame: (doc_id, b, bkey). */
  private def bandFrame(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(col("doc_id"), explode(bandKeys(col("mh"), bands, rows)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bkey").as("bkey"))

  /** [[nearDupPairs]] plus a cleanup handle that unpersists the cached
    * signature frame. Callers that run this repeatedly in one long-lived
    * session (e.g. per-batch dedup) MUST invoke it after the consuming action;
    * one-shot query/bench paths may ignore it (process exit / clearCache). */
  def nearDupPairsManaged(docs: DataFrame, idCol: String, textCol: String,
                          numHashes: Int = 12, bands: Int = 4,
                          threshold: Double = 0.5): (DataFrame, () => Unit) = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes): a remainder would " +
        "compute minhashes the banding silently never reads, quietly loosening " +
        "the LSH calibration the caller asked for")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    // Persisted: the frame feeds both sides of the band self-join — without
    // the cache the whole hash pipeline runs per use (measured 124 s → 12 s
    // at sf0.1 even before word-level hashing).
    val sig = minhashSigFrame(docs, idCol, textCol, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (nearDupPairsCore(base, sig, numHashes, bands, threshold),
      () => { sig.unpersist(); () })
  }

  /** [[nearDupPairs]] over an already-persisted signature frame covering a
    * SUPERSET of `docs` (per-doc signatures depend only on the doc's own
    * text, so a superset-computed frame carries identical values — the
    * compute-once contract a standing intake uses: the batch is signed ONCE
    * for the cross-corpus probe and the in-batch pass reuses it here
    * restricted to the surviving ids, instead of re-running the whole
    * sign pipeline). The caller owns `sigs`' persist/cleanup. */
  def nearDupPairsFromSigs(docs: DataFrame, idCol: String, textCol: String,
                           sigs: DataFrame, numHashes: Int = 12,
                           bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    require(sigs.columns.toSeq == Seq("doc_id", "mh"),
      s"nearDupPairsFromSigs: sigs must be (doc_id, mh) — minhashSigFrame " +
        s"output — got ${sigs.columns.toSeq}")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    // restrict the superset to the requested docs (batch-scale equi-join
    // riding the caller's caches on both sides)
    val sig = sigs.join(base.select("doc_id"), "doc_id")
    nearDupPairsCore(base, sig, numHashes, bands, threshold)
  }

  private def nearDupPairsCore(base: DataFrame, sig: DataFrame,
                               numHashes: Int, bands: Int,
                               threshold: Double): DataFrame = {
    val rows = numHashes / bands
    val bandDf = bandFrame(sig, bands, rows)

    val cand = bandDf.as("x").join(bandDf.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    // Exact-Jaccard verify: the joins carry raw TEXT (cheap); shingle sets are
    // built AFTER the join, so only candidate pairs — a tiny fraction of the
    // corpus — pay the shingle construction.
    val out = cand
      .join(base.select(col("doc_id").as("doc_a"), col("__text").as("__ta")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("__text").as("__tb")), "doc_b")
      .withColumn("sh_a", shingles(col("__ta")))
      .withColumn("sh_b", shingles(col("__tb")))
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
    out
  }

  /** CORPUS SNAPSHOT DIFF — classify every document across two corpus
    * versions (the crawl-refresh question: what did the new snapshot add,
    * drop, keep, lightly edit, or rewrite?):
    *
    *  - `added`     — id only in `cur`;
    *  - `removed`   — id only in `prev`;
    *  - `identical` — same id, byte-equal text;
    *  - `retouched` — same id, text changed but shingle Jaccard ≥
    *    `threshold` (boilerplate tweak / timestamp churn — usually NOT
    *    worth re-ingesting);
    *  - `rewritten` — same id, Jaccard < `threshold` (real new content).
    *
    * The refresh policy this feeds: re-process `added` + `rewritten`,
    * drop `removed`, skip `identical`/`retouched` — typically the vast
    * majority of a crawl refresh, which is exactly the point.
    *
    * Scale posture: ONE id-keyed full-outer join (equi, shuffle-keyed on
    * the id — co-partitioned/bucketed snapshots join without a shuffle);
    * the Jaccard runs ROW-LOCALLY on the already-joined pair (the two
    * texts are in the same row — no per-shingle row explosion, no pair
    * shuffle, no similarity join). The in-row sets are HASHED grams (the
    * q33 hash-invariance argument: counts equal the string-shingle counts
    * absent a 64-bit collision — the oracle computes the string form and
    * hash-matches), each word hashed ONCE and each gram array
    * materialized ONCE behind a single-row Generate barrier — without the
    * barriers CollapseProject inlines the arrays per reference and the
    * whole gram pipeline runs 4× per row (the [[wordHashFrame]] trap; a
    * string-set first cut of this operator measured ~5× slower). Null-id
    * rows are refused loudly (a full-outer join never matches nulls, so a
    * null id would silently misclassify as added+removed), and so are
    * DUPLICATE ids within a snapshot (they would cross-multiply in the
    * join and misclassify every copy — see [[diffSide]]'s in-plan guard).
    * For snapshots that re-mint ids between crawls, use
    * [[snapshotDiffByKey]] with a stable content key.
    *
    * Output: (doc_id, status, jac_micros) — jac_micros the exact integer
    * micro Jaccard for changed pairs (null for added/removed/identical). */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, idCol: String,
                   textCol: String, n: Int = 3,
                   threshold: Double = 0.5): DataFrame =
    diffTail(
      diffSide(prev, "a", idCol, textCol, "snapshotDiff", Nil)
        .join(diffSide(cur, "b", idCol, textCol, "snapshotDiff", Nil),
          Seq("doc_id"), "full_outer"),
      Seq("doc_id"), n, threshold)

  /** CONTENT-KEYED [[snapshotDiff]] — classify across two snapshots joined
    * on a stable CONTENT key (canonical URL, content address) instead of the
    * document id, for crawl refreshes that RE-MINT ids (row numbers, ingest
    * sequence): id-keyed diffing would classify every such document as
    * added+removed even when its text never changed. The per-side doc ids
    * ride along as provenance: output (key, prev_id, cur_id, status,
    * jac_micros), with `prev_id`/`cur_id` null on the absent side. Same
    * statuses, same exact micro-Jaccard, same guards (null keys/texts and
    * DUPLICATE keys within a snapshot refused loudly) as the id-keyed form;
    * with a key that equals the id it is the id-keyed diff plus the two
    * provenance columns (spec-asserted). */
  def snapshotDiffByKey(prev: DataFrame, cur: DataFrame, keyCol: String,
                        idCol: String, textCol: String, n: Int = 3,
                        threshold: Double = 0.5): DataFrame =
    diffTail(
      diffSide(prev, "a", keyCol, textCol, "snapshotDiffByKey", Seq(idCol))
        .withColumnRenamed(s"__c0a", "prev_id")
        .join(
          diffSide(cur, "b", keyCol, textCol, "snapshotDiffByKey", Seq(idCol))
            .withColumnRenamed(s"__c0b", "cur_id"),
          Seq("doc_id"), "full_outer")
        .withColumnRenamed("doc_id", "key"),
      Seq("key", "prev_id", "cur_id"), n, threshold)

  /** One guarded snapshot side: null key/text refused loudly, then an
    * aggregate-shaped UNIQUENESS guard — a duplicate key within a snapshot
    * would make the full-outer join emit one row per cross-pair, silently
    * multiplying and misclassifying documents, so it is refused in-plan (the
    * groupBy collapses each key to one row and a lazy per-row check raises
    * when the collapsed count exceeds 1; min() over the guaranteed-single
    * survivor is the identity). The key aggregate's exchange is the same
    * doc_id partitioning the full-outer join needs, so the guard adds no
    * extra shuffle. Extra carried columns (`extras`) come through as
    * `__c<i><t>`. */
  private def diffSide(df: DataFrame, t: String, keyCol: String,
                       textCol: String, op: String,
                       extras: Seq[String]): DataFrame = {
    val checked = df.select(
      when(col(keyCol).isNull,
        raise_error(lit(s"$op: null $keyCol in the $t snapshot — " +
          "a full-outer join never matches nulls, so the row would " +
          "misclassify as added+removed; repair keys first"))
          .cast(df.schema(keyCol).dataType))
        .otherwise(col(keyCol)).as("doc_id") +:
      // null TEXT is refused too: row-presence is what classifies
      // added/removed, so a present row with unknown text has no honest
      // bucket (it is neither equal nor comparably different)
      when(col(textCol).isNull,
        raise_error(lit(s"$op: null $textCol in the $t snapshot — " +
          "a present document with unknown text cannot be classified; " +
          "filter or repair first")).cast("string"))
        .otherwise(col(textCol)).as(s"__t$t") +:
      extras.zipWithIndex.map { case (c, i) => col(c).as(s"__c$i$t") }: _*)
    checked.groupBy("doc_id")
      .agg(count(lit(1)).as("__cnt"),
        min(col(s"__t$t")).as(s"__t$t") +:
          extras.indices.map(i => min(col(s"__c$i$t")).as(s"__c$i$t")): _*)
      .select(col("doc_id") +:
        when(col("__cnt") > 1,
          raise_error(concat(lit(s"$op: duplicate $keyCol "),
            col("doc_id").cast("string"),
            lit(s" in the $t snapshot — a duplicated key cross-multiplies " +
              "in the full-outer join and misclassifies every copy; " +
              "dedup the snapshot first"))).cast("string"))
          .otherwise(col(s"__t$t")).as(s"__t$t") +:
        extras.indices.map(i => col(s"__c$i$t")): _*)
  }

  /** The shared gram-Jaccard classification tail over a full-outer-joined
    * pair frame carrying `__ta`/`__tb` plus `carry` columns. */
  private def diffTail(joined: DataFrame, carry: Seq[String], n: Int,
                       threshold: Double): DataFrame = {
    require(n >= 1, s"snapshotDiff: n must be >= 1, got $n")
    val carryCols = carry.map(col)

    // per-word hash once (absent side -> empty array, so the gram stage
    // below is null-safe), materialized behind barrier #1
    def whsOf(t: Column): Column =
      when(t.isNull, array().cast("array<bigint>"))
        .otherwise(transform(split(lower(t), " "), w => shingleHash(w) % MinhashP))
    val withWhs = joined
      .select(carryCols ++ Seq(col("__ta"), col("__tb"),
        explode(array(struct(whsOf(col("__ta")).as("wa"),
          whsOf(col("__tb")).as("wb")))).as("__w")): _*)
      .select(carryCols ++ Seq(col("__ta"), col("__tb"),
        col("__w.wa").as("__wa"), col("__w.wb").as("__wb")): _*)
    // distinct hashed n-gram sets from the word hashes (the q33 stepwise
    // combine, values < 2^31 so products stay ANSI-safe), barrier #2
    def gramsOf(whs: Column): Column = array_distinct(
      when(size(whs) >= n,
        transform(sequence(lit(0), size(whs) - n),
          i => (1 until n).foldLeft(element_at(whs, i + 1))(
            (acc, j) => (acc * 31L + element_at(whs, i + j + 1)) % MinhashP)))
        .otherwise(array().cast("array<bigint>")))
    val withSets = withWhs
      .select(carryCols ++ Seq(col("__ta"), col("__tb"),
        explode(array(struct(gramsOf(col("__wa")).as("sa"),
          gramsOf(col("__wb")).as("sb")))).as("__s")): _*)
      .select(carryCols ++ Seq(col("__ta"), col("__tb"),
        col("__s.sa").as("__sa"), col("__s.sb").as("__sb")): _*)

    // exact integer micro-Jaccard; union size 0 (both texts under n
    // words) counts as identical-content -> equal-text wins first and
    // 1e6 covers the rest
    val jac = when(col("__uni") > 0, expr("1000000 * __inter div __uni"))
      .otherwise(lit(1000000L))
    // the retouched/rewritten cutoff in exact integer micros: ⌈t·10^6⌉ with
    // the repo's float-ceil epsilon convention (cf. jaccardJoin's prefix
    // bound) — a bare (t·10^6).toLong truncates non-representable thresholds
    // (0.7 → 699999), so a pair with Jaccard strictly BELOW the threshold
    // (exactly 699999 micros) would classify retouched instead of rewritten
    val cutoff = math.ceil(threshold * 1e6 - 1e-9).toLong
    withSets
      .withColumn("__inter",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("__uni",
        size(array_union(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("__jac",
        when(col("__ta").isNull || col("__tb").isNull ||
          col("__ta") === col("__tb"), lit(null).cast("long"))
          .otherwise(jac))
      .select(carryCols ++ Seq(
        when(col("__ta").isNull, lit("added"))
          .when(col("__tb").isNull, lit("removed"))
          .when(col("__ta") === col("__tb"), lit("identical"))
          .when(col("__jac") >= cutoff, lit("retouched"))
          .otherwise(lit("rewritten")).as("status"),
        col("__jac").as("jac_micros")): _*)
  }

  /** INCREMENTAL near-dup dedup: probe a NEW BATCH of documents against an
    * EXISTING corpus's MinHash band index — the index-reuse shape a
    * continuously-ingesting pipeline runs per crawl drop. Unlike
    * [[nearDupPairs]] (all same-corpus pairs), candidates here are strictly
    * CROSS-SIDE: batch docs never pair with each other (within-batch dedup is
    * a separate, much smaller [[nearDupPairs]] over the batch alone; after the
    * drop the batch's signatures are appended to the index).
    *
    * Scale posture: the corpus side is touched ONLY through its signature /
    * band frames — exactly what the stored index contains, so at 100 TB this
    * reads the (small) index table, never the corpus text; corpus TEXT is
    * fetched per matched id for the verify join only. The band join is keyed
    * on (b, bkey); with a small batch AQE broadcasts the batch side, so the
    * index is probed without shuffling it.
    *
    * Output: (batch_id, corpus_id, jac) — batch doc, its corpus near-dup,
    * exact shingle Jaccard ≥ `threshold`. */
  def incrementalNearDup(corpus: DataFrame, batch: DataFrame,
                         idCol: String, textCol: String,
                         numHashes: Int = 12, bands: Int = 4,
                         threshold: Double = 0.5): DataFrame =
    incrementalNearDupManaged(corpus, batch, idCol, textCol, numHashes, bands,
      threshold)._1

  /** [[incrementalNearDup]] plus the cleanup handle for the cached batch
    * signature frame (same managed-persist contract as [[jaccardJoin]]).
    * Computes the corpus signatures from text — the one-shot/query shape.
    * A STANDING pipeline should persist the signature frame once and call
    * [[incrementalNearDupIndexedManaged]] instead, so per-batch cost stays
    * flat in corpus size (signatures are never recomputed from text). */
  def incrementalNearDupManaged(corpus: DataFrame, batch: DataFrame,
                                idCol: String, textCol: String,
                                numHashes: Int = 12, bands: Int = 4,
                                threshold: Double = 0.5): (DataFrame, () => Unit) = {
    val p = incrementalNearDupProbe(corpus, batch, idCol, textCol, numHashes,
      bands, threshold)
    (p.pairs, p.cleanup)
  }

  /** [[incrementalNearDupManaged]] exposing the persisted BATCH signature
    * frame ([[IndexedProbe.sigs]]) so a caller that also runs an in-batch
    * near-dup pass over (a subset of) the same batch can reuse the one sign
    * pipeline via [[nearDupPairsFromSigs]] instead of re-signing from text. */
  def incrementalNearDupProbe(corpus: DataFrame, batch: DataFrame,
                              idCol: String, textCol: String,
                              numHashes: Int = 12, bands: Int = 4,
                              threshold: Double = 0.5): IndexedProbe = {
    val (pairs, sigB, cleanup) =
      indexedNearDupCore(minhashSigFrame(corpus, idCol, textCol, numHashes),
        corpus, batch, idCol, textCol, numHashes, bands, threshold)
    IndexedProbe(pairs, sigB, cleanup)
  }

  /** The STORED-INDEX form of [[incrementalNearDup]]: probe a new batch
    * against a PERSISTED corpus signature frame (`corpusSigs` —
    * [[minhashSigFrame]] output, (doc_id, mh ARRAY<BIGINT>), e.g. the
    * union of per-batch signature parts a standing intake appends). The
    * corpus TEXT frame is touched only by the verify join — candidates
    * only on the probe side; the scan never feeds the band stage — so
    * per-batch work is (batch signatures + index scan + candidate
    * verify), flat in corpus size where the text-recompute form grows
    * linearly with everything ingested.
    *
    * The stored signature width is guarded (one-row probe): an index
    * written with a different `numHashes` would band differently and
    * silently lose recall — refused loudly instead. */
  def incrementalNearDupIndexedManaged(corpusSigs: DataFrame, corpusText: DataFrame,
                                       batch: DataFrame,
                                       idCol: String, textCol: String,
                                       numHashes: Int = 12, bands: Int = 4,
                                       threshold: Double = 0.5): (DataFrame, () => Unit) = {
    val p = incrementalNearDupIndexedProbe(corpusSigs, corpusText, batch,
      idCol, textCol, numHashes, bands, threshold)
    (p.pairs, p.cleanup)
  }

  /** The batch-signature-sharing form of [[incrementalNearDupIndexedManaged]]:
    * also returns the persisted batch signature frame (same reuse contract
    * as [[BandedProbe.sigs]]). */
  final case class IndexedProbe(pairs: DataFrame, sigs: DataFrame,
                                cleanup: () => Unit)

  def incrementalNearDupIndexedProbe(corpusSigs: DataFrame, corpusText: DataFrame,
                                     batch: DataFrame,
                                     idCol: String, textCol: String,
                                     numHashes: Int = 12, bands: Int = 4,
                                     threshold: Double = 0.5): IndexedProbe = {
    require(corpusSigs.columns.toSeq == Seq("doc_id", "mh"),
      s"incrementalNearDupIndexed: corpusSigs must be (doc_id, mh) — " +
        s"minhashSigFrame output — got ${corpusSigs.columns.toSeq}")
    // width guard over EVERY stored row, not a one-row sample: the documented
    // input is a UNION of per-batch signature parts, so parts written under a
    // different numHashes (an intake restarted with a changed config) can
    // coexist with matching-width parts — a sampled probe would pass, band
    // with truncated/foreign slices, and silently lose recall, the exact
    // failure this guard exists to refuse loudly. One min/max aggregate over
    // the (already index-scale) signature frame; the result is one row. An
    // empty index passes and probes to nothing.
    val w = corpusSigs
      .agg(min(size(col("mh"))).as("lo"), max(size(col("mh"))).as("hi")).head()
    if (!w.isNullAt(0)) require(w.getInt(0) == numHashes && w.getInt(1) == numHashes,
      s"incrementalNearDupIndexed: stored signature widths span " +
        s"[${w.getInt(0)}, ${w.getInt(1)}] but numHashes=$numHashes — a " +
        "mismatched part bands differently and silently loses recall; " +
        "re-sign the corpus or match the parameters")
    val (pairs, sigB, cleanup) = indexedNearDupCore(corpusSigs, corpusText,
      batch, idCol, textCol, numHashes, bands, threshold)
    IndexedProbe(pairs, sigB, cleanup)
  }

  private def indexedNearDupCore(corpusSigs: DataFrame, corpusText: DataFrame,
                                 batch: DataFrame, idCol: String, textCol: String,
                                 numHashes: Int, bands: Int,
                                 threshold: Double): (DataFrame, DataFrame, () => Unit) = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    // The corpus signature frame is NOT persisted: it is a stored index
    // scan (one pass); only the batch side — small, read by both the band
    // join and nothing else, but recomputed per band without the cache —
    // is worth pinning.
    val sigB = minhashSigFrame(batch, idCol, textCol, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bandFrame(sigB, bands, rows).as("x")
      .join(bandFrame(corpusSigs, bands, rows).as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("batch_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    (verifyCrossPairs(cand, corpusText, batch, idCol, textCol, threshold),
      sigB, () => { sigB.unpersist(); () })
  }

  /** Band-join candidate (batch_id, corpus_id) pairs WITHOUT the verify
    * tail — the measurement seam for the verify-tail experiment
    * (`graft.tools.VerifyPairsProbe`): both verify variants run over the
    * same materialized candidate frame, so the comparison isolates the
    * tail. */
  private[graft] def crossCandidates(corpus: DataFrame, batch: DataFrame,
                                     idCol: String, textCol: String,
                                     numHashes: Int = 12, bands: Int = 4)
      : (DataFrame, () => Unit) = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    val sigB = minhashSigFrame(batch, idCol, textCol, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bandFrame(sigB, bands, rows).as("x")
      .join(bandFrame(minhashSigFrame(corpus, idCol, textCol, numHashes),
        bands, rows).as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("batch_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    (cand, () => { sigB.unpersist(); () })
  }

  /** The exact-Jaccard verify tail shared by the cross-side probes: texts
    * joined per CANDIDATE pair only, shingle sets built after the join.
    * Kept over the precompute-per-doc alternative
    * ([[verifyCrossPairsPre]]) on measurement — see BASELINE.md's r18
    * verify-tail experiment. */
  private[graft] def verifyCrossPairs(cand: DataFrame, corpusText: DataFrame,
                               batch: DataFrame, idCol: String, textCol: String,
                               threshold: Double): DataFrame = {
    val bText = batch.select(col(idCol).as("batch_id"), col(textCol).as("__tb"))
    val cText = corpusText.select(col(idCol).as("corpus_id"), col(textCol).as("__tc"))
    cand
      .join(bText, "batch_id")
      .join(cText, "corpus_id")
      .withColumn("sh_b", shingles(col("__tb")))
      .withColumn("sh_c", shingles(col("__tc")))
      .withColumn("jac",
        size(array_intersect(col("sh_b"), col("sh_c"))).cast("double") /
          size(array_union(col("sh_b"), col("sh_c"))))
      .filter(col("jac") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jac"))
  }

  /** EXPERIMENTAL alternative verify tail (r18): shingle sets computed
    * ONCE per distinct candidate doc per side and joined to the pairs —
    * trades [[verifyCrossPairs]]'s per-pair shingle recompute (a doc in
    * 45 pairs splits/dedups its text 45×) for shipping shingle ARRAYS
    * through the pair joins. Semantically identical (same shingles, same
    * Jaccard); kept for the measurement record only — see BASELINE.md. */
  private[graft] def verifyCrossPairsPre(cand: DataFrame, corpusText: DataFrame,
                                         batch: DataFrame, idCol: String,
                                         textCol: String,
                                         threshold: Double): DataFrame = {
    val bSh = batch.select(col(idCol).as("batch_id"), col(textCol).as("__tb"))
      .join(cand.select("batch_id").distinct(), "batch_id")
      .select(col("batch_id"), shingles(col("__tb")).as("sh_b"))
    val cSh = corpusText.select(col(idCol).as("corpus_id"), col(textCol).as("__tc"))
      .join(cand.select("corpus_id").distinct(), "corpus_id")
      .select(col("corpus_id"), shingles(col("__tc")).as("sh_c"))
    cand
      .join(bSh, "batch_id")
      .join(cSh, "corpus_id")
      .withColumn("jac",
        size(array_intersect(col("sh_b"), col("sh_c"))).cast("double") /
          size(array_union(col("sh_b"), col("sh_c"))))
      .filter(col("jac") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jac"))
  }

  /** The state bucket of an LSH band key under a `numBuckets`-way layout:
    * a uniform hash of the (band, key) pair — deterministic across engines
    * and restarts (xxhash64 with Spark's fixed seed). Writer and probe must
    * derive buckets through this one function (cf.
    * [[Novelty.gramBucket]]'s layout contract). */
  def bandBucket(b: Column, bkey: Column, numBuckets: Int): Column = {
    require(numBuckets >= 1 && numBuckets <= Novelty.MaxBuckets,
      s"bandBucket: numBuckets must be in [1, ${Novelty.MaxBuckets}], got $numBuckets")
    pmod(xxhash64(b, bkey), lit(numBuckets.toLong)).cast("int")
  }

  /** The PERSISTED band-index frame a bucket-partitioned standing intake
    * appends per batch: the exploded LSH band keys of a signature frame
    * plus the signature WIDTH (`w` — the per-part witness the probe's
    * width guard aggregates, so a part written under a different numHashes
    * is refused loudly even when its buckets are never probed) and the
    * `bkt` state bucket (write with `partitionBy("bkt")`). Probing this
    * layout reads only the buckets the batch's own band keys touch —
    * sub-linear in index size — where the flat (doc_id, mh) layout forces
    * a full-index scan per batch. */
  def bandIndexFrame(sigs: DataFrame, numHashes: Int, bands: Int,
                     numBuckets: Int): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    require(sigs.columns.toSeq == Seq("doc_id", "mh"),
      s"bandIndexFrame: expected (doc_id, mh) — minhashSigFrame output — " +
        s"got ${sigs.columns.toSeq}")
    bandFrame(sigs, bands, numHashes / bands)
      .select(col("doc_id"), col("b"), col("bkey"),
        lit(numHashes).as("w"),
        bandBucket(col("b"), col("bkey"), numBuckets).as("bkt"))
  }

  /** The state bucket of a DOCUMENT ID under a `numBuckets`-way layout —
    * the text-part companion of [[bandBucket]]: a standing intake writes
    * its corpus text parts partitioned by this, so the candidate VERIFY
    * join reads only the buckets the matched corpus ids live in instead
    * of scanning every text part per batch (the last corpus-scale
    * per-batch read once the signature probe is banded). Writer and
    * reader must share this one function. */
  def docBucket(id: Column, numBuckets: Int): Column = {
    require(numBuckets >= 1 && numBuckets <= Novelty.MaxBuckets,
      s"docBucket: numBuckets must be in [1, ${Novelty.MaxBuckets}], got $numBuckets")
    pmod(id, lit(numBuckets.toLong)).cast("int")
  }

  /** A bucket-pruned incremental near-dup probe: the pair frame, the
    * band/text buckets it actually read (telemetry — the no-silent-caps
    * rule for a standing service; `probedTextBuckets` is None when the
    * text side was unbucketed), and the managed-persist cleanup. */
  /** `sigs` is the PERSISTED batch signature frame ([[minhashSigFrame]] of
    * the probe's batch side) — exposed so a standing caller can reuse the
    * one sign pass for its in-batch dedup and its corpus signature write
    * (per-doc signatures depend only on the doc's own text, so the values
    * are identical wherever they are reused). Valid until `cleanup`. */
  final case class BandedProbe(pairs: DataFrame, probedBuckets: Seq[Int],
                               probedTextBuckets: Option[Seq[Int]],
                               sigs: DataFrame,
                               cleanup: () => Unit)

  /** [[incrementalNearDupIndexedManaged]] over a BUCKET-PARTITIONED band
    * index ([[bandIndexFrame]] parts, typically a parquet read of every
    * `bands=<batch>` part directory): the batch is signed and banded, its
    * distinct state buckets are collected (≤ `numBuckets` values — clamped
    * metadata-scale by [[Novelty.MaxBuckets]]), and the index is read
    * FILTERED to those buckets — with `bkt` a partition directory column
    * the probe never opens a non-matching bucket's files, so per-batch
    * index I/O is proportional to the touched buckets, not the corpus
    * vocabulary. Pruning is exact: a pruned-away index row's (b, bkey)
    * hashes to a bucket the batch never probes, so it cannot band-collide
    * with any batch row. The inner band join keeps the big index side
    * streamable (AQE broadcasts the batch bands; nothing exchanges the
    * index). Candidates verify against corpus TEXT per matched pair only.
    *
    * The width guard (`widthVerified = false`) aggregates min/max over the
    * UNPRUNED index's `w` column: a part written under a different
    * numHashes must refuse loudly even when this batch never probes its
    * buckets. That aggregate is O(standing state) PER BATCH — the one
    * remaining full-index term in a pruned probe — so a standing caller
    * that pins the width in state-dir METADATA (graft.app.Intake's
    * `_num_hashes` marker: validated against the config before any part is
    * written or probed) passes `widthVerified = true` and the guard is
    * skipped entirely; the aggregate form remains the fallback for
    * marker-less legacy state. Same refusal semantics, metadata cost. */
  /** `maxBroadcastRows`: the batch band side is pinned as the broadcast
    * build only while its (cached, counted — measured, not assumed) row
    * count stays under this bound; a larger batch degrades to the plain
    * inner join over the PRUNED index — bounded by the batch's bucket
    * coverage, never a forced broadcast OOM. */
  def incrementalNearDupBanded(banded: DataFrame, corpusText: DataFrame,
                               batch: DataFrame, idCol: String, textCol: String,
                               numHashes: Int = 12, bands: Int = 4,
                               numBuckets: Int = 64,
                               threshold: Double = 0.5,
                               maxBroadcastRows: Long = 4L << 20,
                               widthVerified: Boolean = false): BandedProbe = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    require(banded.columns.toSet == Set("doc_id", "b", "bkey", "w", "bkt"),
      s"incrementalNearDupBanded: banded index must be (doc_id, b, bkey, w, " +
        s"bkt) — bandIndexFrame output — got ${banded.columns.toSeq}")
    if (!widthVerified) {
      val wides = banded.agg(min(col("w")).as("lo"), max(col("w")).as("hi")).head()
      if (!wides.isNullAt(0))
        require(wides.getInt(0) == numHashes && wides.getInt(1) == numHashes,
          s"incrementalNearDupBanded: stored band-index widths span " +
            s"[${wides.getInt(0)}, ${wides.getInt(1)}] but numHashes=$numHashes " +
            "— a mismatched part bands differently and silently loses recall; " +
            "re-sign the corpus or match the parameters")
    }
    val sigB = minhashSigFrame(batch, idCol, textCol, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bb = bandFrame(sigB, bands, numHashes / bands)
      .withColumn("bkt", bandBucket(col("b"), col("bkey"), numBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE action derives both probe inputs — the touched buckets AND the
    // band-row count (per-bucket counts are ≤ numBuckets rows): the batch
    // band side carries an explicit broadcast while it is MEASURED small
    // (the count reads the cache the candidate join reuses): the hint
    // makes "index streamed, zero index exchange" the STATIC plan — AQE's
    // runtime conversion would still submit (and pay for) the index-side
    // shuffle write before converting. Over the bound, degrade to the
    // plain join over the pruned index instead of a broadcast OOM.
    val bktCounts = bb.groupBy("bkt").agg(count(lit(1)).as("c")).collect()
    val bkts = bktCounts.map(_.getInt(0)).toSeq.sorted
    val bbRows = bktCounts.map(_.getLong(1)).sum
    val build = if (bbRows <= maxBroadcastRows) broadcast(bb.as("x")) else bb.as("x")
    val cand = banded.where(col("bkt").isin(bkts: _*)).as("y")
      .join(build,
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("batch_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    // the candidate VERIFY read: when the corpus text side carries a `bkt`
    // column (doc-bucketed text parts, [[docBucket]]), the candidates are
    // pinned and their corpus-id buckets collected (candidate-scale, ≤
    // numBuckets values) so the text read prunes to matched buckets —
    // without it, the verify was the last per-batch read that scanned the
    // WHOLE accumulated corpus. Pruning is exact: a text row outside the
    // candidate buckets cannot be any candidate's corpus id.
    val (out, textBkts, candCleanup) =
      if (corpusText.columns.contains("bkt")) {
        val candP = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tb = candP.select(docBucket(col("corpus_id"), numBuckets).as("tb"))
          .distinct().collect().map(_.getInt(0)).toSeq.sorted
        (verifyCrossPairs(candP,
          corpusText.where(col("bkt").isin(tb: _*)).drop("bkt"),
          batch, idCol, textCol, threshold),
          Some(tb), () => { candP.unpersist(); () })
      } else
        (verifyCrossPairs(cand, corpusText, batch, idCol, textCol, threshold),
          None, () => ())
    BandedProbe(out, bkts, textBkts, sigB,
      () => { candCleanup(); bb.unpersist(); sigB.unpersist(); () })
  }

  /** STREAMING [[incrementalNearDup]]: dedup-on-arrival — each micro-batch's
    * documents are MinHash-signed ROW-LOCALLY and probed against the static
    * corpus band index; near-dup pairs (batch_id, corpus_id, jac ≥ threshold)
    * emit when the watermark passes the document's event time.
    *
    * Signature values are IDENTICAL to the batch path (same per-word hash,
    * same mod-at-end gram combine, same permutation family — the spec
    * asserts set equality with [[incrementalNearDup]] over the same data),
    * but computed within the row via [[minhashSignature]]'s array form: a
    * stream has no corpus-wide word dictionary to join, so the md5 runs once
    * per word occurrence — the right cost model for arrival-rate data.
    * Intermediate arrays sit behind Generate barriers (`explode(array(…))`)
    * per [[wordHashFrame]]'s CollapseProject warning.
    *
    * State: the band join is stream-static (stateless); the only stateful
    * stage is the watermark-bounded per-(doc, corpus-candidate) band dedup,
    * mirroring [[graft.llm.Decontam.contaminationStream]]'s shape. */
  def incrementalNearDupStream(batch: DataFrame, tsCol: String, idCol: String,
      textCol: String, corpus: DataFrame, corpusIdCol: String,
      corpusTextCol: String, numHashes: Int = 12, bands: Int = 4,
      threshold: Double = 0.5, watermarkDelay: String = "10 minutes"): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    val corpusBands =
      bandFrame(minhashSigFrame(corpus, corpusIdCol, corpusTextCol, numHashes),
        bands, rows)
        .withColumnRenamed("doc_id", "corpus_id")
    val corpusText = corpus.select(col(corpusIdCol).as("corpus_id"),
      col(corpusTextCol).as("__tc"))

    val whsOf = transform(col("__ws"), w => shingleHash(w) % MinhashP)
    val gramsOf = when(size(col("__whs")) >= 3,
      transform(sequence(lit(0), size(col("__whs")) - 3),
        i => ((element_at(col("__whs"), i + 1) * 31L
          + element_at(col("__whs"), i + 2)) * 31L
          + element_at(col("__whs"), i + 3)) % MinhashP))
      .otherwise(array().cast("array<bigint>"))

    batch
      .select(col(tsCol).as("__ts"), col(idCol).as("doc_id"),
        col(textCol).as("__tb"),
        explode(array(split(lower(col(textCol)), " "))).as("__ws"))
      .select(col("__ts"), col("doc_id"), col("__tb"),
        explode(array(whsOf)).as("__whs"))
      .select(col("__ts"), col("doc_id"), col("__tb"),
        explode(array(gramsOf)).as("__gs"))
      .filter(size(col("__gs")) > 0) // <3-word docs have no signature (batch parity)
      .select(col("__ts"), col("doc_id"), col("__tb"),
        explode(bandKeys(minhashSignature(col("__gs"), numHashes), bands, rows))
          .as("band"))
      .select(col("__ts"), col("doc_id"), col("__tb"),
        col("band.b").as("b"), col("band.bkey").as("bkey"))
      .withWatermark("__ts", watermarkDelay)
      .join(corpusBands, Seq("b", "bkey")) // stream-static: stateless probe
      .groupBy(col("__ts"), col("doc_id"), col("__tb"), col("corpus_id"))
      .agg(count(lit(1)).as("__nbands")) // candidate dedup, watermark-bounded
      .join(corpusText, "corpus_id") // static text fetch, candidates only
      .withColumn("jac",
        size(array_intersect(shingles(col("__tb")), shingles(col("__tc"))))
          .cast("double") /
          size(array_union(shingles(col("__tb")), shingles(col("__tc")))))
      .filter(col("jac") >= threshold)
      .select(col("doc_id").as("batch_id"), col("corpus_id"), col("jac"))
  }

  /** EXACT n-gram Jaccard similarity join via prefix filtering (the
    * AllPairs/PPJoin family — Bayardo et al., WWW'07; published, widely
    * reimplemented). Unlike [[nearDupPairs]] (MinHash — probabilistic recall),
    * this returns EXACTLY the pairs with Jaccard(shingles_a, shingles_b) ≥ t:
    *
    *  1. global shingle document-frequency (one groupBy — map-side combined);
    *  2. each doc sorts its shingle set by (df ASC, shingle) — rarest first —
    *     and keeps only the PREFIX of length |S| − ⌈t·|S|⌉ + 1. Any pair with
    *     J ≥ t must share at least one prefix shingle under a consistent
    *     global order (the prefix-filter guarantee), so recall is lossless;
    *  3. candidates = equi-join on prefix shingles (a < b), pre-pruned by the
    *     size filter t·|Sa| ≤ |Sb| ∧ t·|Sb| ≤ |Sa|;
    *  4. exact Jaccard verify on the full sets, candidates only.
    *
    * Scale posture: the join keys are by construction the RAREST shingles in
    * the corpus (df-ascending prefixes), so bucket sizes are small and skew is
    * structurally avoided — the opposite of joining on common tokens. Every
    * stage is a keyed shuffle (shingle or doc_id); nothing is all-pairs. */
  def jaccardJoin(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, threshold: Double = 0.5): DataFrame =
    jaccardJoinManaged(docs, idCol, textCol, n, threshold)._1

  /** [[jaccardJoin]] plus a cleanup handle (same contract as
    * [[nearDupPairsManaged]]): the shingle-set frame feeds the df count, the
    * prefix build AND both verify joins, and the prefix frame feeds both sides
    * of the candidate self-join — without persists each reference recomputes
    * the whole upstream (the measured round-2 trap: self-joins ×N the
    * pipeline). */
  /** Per-doc distinct hashed n-gram sets (doc_id, sh: array<bigint>), empty
    * sets dropped — the shared base of [[jaccardJoinManaged]] and
    * [[containmentJoinManaged]].
    *
    * Shingle identity is a 64-bit hash, never a string: every downstream join
    * keys on 8-byte values and the verify intersects long arrays. Jaccard /
    * containment on hashed sets equals the string-set value absent a 64-bit
    * collision inside one candidate pair (~|S|²/2⁶⁴ — negligible);
    * array_distinct guards the within-doc case.
    *
    * Built explode-first (word → xxhash64 per occurrence → collect in word
    * order → n-gram = xxhash64 of n consecutive word hashes): the string
    * shingle form `transform(shingles(text), …)` re-evaluates the captured
    * `split(lower(text))` per lambda element — measured 13.5 s vs 1.4 s for
    * this shape at sf0.1. xxhash64 over materialized longs is codegen'd and
    * ANSI-safe (no overflow, unlike a 64-bit polynomial combine). */
  private[llm] def hashedGramSets(docs: DataFrame, idCol: String, textCol: String,
                                  n: Int): DataFrame = {
    val wh = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("__p", "__w")))
      .select(col("doc_id"), col("__p"), xxhash64(col("__w")).as("__h"))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__h")))),
        s => s.getField("__h")).as("whs"))
    val ngrams = when(size(col("whs")) >= n,
      transform(sequence(lit(0), size(col("whs")) - n),
        i => xxhash64((0 until n).map(j => element_at(col("whs"), i + j + 1)): _*)))
      .otherwise(array().cast("array<bigint>"))
    wh.select(col("doc_id"), array_distinct(ngrams).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  def jaccardJoinManaged(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, threshold: Double = 0.5): (DataFrame, () => Unit) = {
    // gram identity/build rationale: [[hashedGramSets]]
    val base = hashedGramSets(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = base.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfreq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
    // Per-doc global order (df ASC, hash) → keep the prefix, WITH each
    // token's position: position feeds the PPJoin positional filter below.
    val prefixes = exploded.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("sz"),
        // ceil over a FLOAT product needs the epsilon guard: for thresholds
        // like 0.07, `100 * 0.07` is 7.000000000000001 in binary — ceil
        // jumps to 8 and the prefix loses its last token, silently breaking
        // the prefix filter's losslessness. Subtracting 1e-9 (far above the
        // ~1e-13 representation error, far below 1) restores the exact
        // integer ceiling; non-integer products are unaffected.
        posexplode(expr(s"slice(transform(gs, x -> x.g), 1, " +
          s"size(gs) - cast(ceil(size(gs) * $threshold - 1e-9) as int) + 1)")).as(Seq("p", "g")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Candidates: shared prefix token + size filter + POSITIONAL filter
    // (PPJoin, Xiao et al.): a token at 0-based position p leaves at most
    // sz − p overlapping elements, so max over shared tokens of
    // min(sz_a−p_a, sz_b−p_b) must reach the overlap requirement
    // α = ⌈t/(1+t)·(sz_a+sz_b)⌉ for J ≥ t to be possible.
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") * threshold <= col("a.sz") &&
          col("a.sz") * threshold <= col("b.sz"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(max(least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p"))).as("ub"))
      // same float-ceil epsilon guard as the prefix length above: an
      // overshot α would over-prune candidates the exact verify never sees
      .filter(col("ub") >=
        ceil(lit(threshold / (1 + threshold)) * (col("sz_a") + col("sz_b")) - lit(1e-9)))
      .select(col("doc_a"), col("doc_b"))
    val out = cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
    (out, () => { prefixes.unpersist(); base.unpersist(); () })
  }

  /** EXACT n-gram CONTAINMENT join: all DIRECTED pairs (a, b), a ≠ b, with
    * |grams(a) ∩ grams(b)| / |grams(a)| ≥ t — "a is (mostly) inside b".
    * The asymmetric sibling of [[jaccardJoin]]: quote inclusion, doc-in-doc
    * subsumption and template-plus-payload pages have high containment but
    * arbitrarily LOW Jaccard when |b| ≫ |a|, so a Jaccard threshold can
    * never find them.
    *
    * Prefix filtering adapts to the asymmetry (AllPairs/PPJoin family,
    * Bayardo WWW'07; overlap form): the required overlap α = ⌈t·|a|⌉
    * depends only on the PROBE side, so only `a` is prefix-pruned (prefix =
    * the |a| − α + 1 rarest grams under the global (df ASC, hash) order —
    * any b with overlap ≥ α must share a prefix gram, by pigeonhole) while
    * `b` is indexed in FULL with positions (there is no upper size filter:
    * b may be arbitrarily larger). The PPJoin positional bound
    * max over shared grams of min(|a|−p_a, |b|−p_b) ≥ α prunes candidates
    * before the exact verify on the full sets.
    *
    * Thresholds travel as INTEGER MICROS end to end: α and every filter are
    * exact integer arithmetic (⌈t·s⌉ = (s·t_micros + 999999) div 10^6), so
    * there is no float-ceil epsilon anywhere and the DuckDB oracle replays
    * the identical predicate. Output `cont_micros` = overlap·10^6 div |a|.
    *
    * Skew note (the honest cost of the full-side index): a gram's full
    * posting list joins whenever the gram lands in ANY probe prefix. Prefix
    * grams are df-ascending-rarest, so common grams enter only through
    * probe docs so small that the common gram is among their rarest — the
    * posting lists actually joined stay near the df floor. Docs shorter
    * than `n` words have no grams and are excluded (containment over an
    * empty set is undefined). */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, thresholdMicros: Long = 600000L): DataFrame =
    containmentJoinManaged(docs, idCol, textCol, n, thresholdMicros)._1

  /** [[containmentJoin]] plus the persist-cleanup handle (same contract as
    * [[jaccardJoinManaged]]). */
  def containmentJoinManaged(docs: DataFrame, idCol: String, textCol: String,
                             n: Int = 3, thresholdMicros: Long = 600000L)
      : (DataFrame, () => Unit) = {
    require(thresholdMicros >= 1 && thresholdMicros <= 1000000L,
      s"containmentJoin: thresholdMicros must be in [1, 1000000], got $thresholdMicros")
    val base = hashedGramSets(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = base.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfreq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
    // ONE positional df-sorted index serves both sides: the probe filters
    // it to prefixes, the indexed side uses it whole.
    val sorted = exploded.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("sz"),
        posexplode(expr("transform(gs, x -> x.g)")).as(Seq("p", "g")))
      // α = ⌈t·sz⌉ in exact integer micros, carried per row
      .withColumn("alpha",
        expr(s"(sz * ${thresholdMicros}L + 999999L) div 1000000L"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // probe prefix: 0-based positions 0 .. sz − α (length sz − α + 1)
    val probe = sorted.filter(col("p") <= col("sz") - col("alpha"))
    val cand = probe.as("a")
      .join(sorted.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.sz") >= col("a.alpha")) // overlap ≤ |b|: size lower bound
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.alpha").as("alpha_a"))
      .agg(max(least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p"))).as("ub"))
      .filter(col("ub") >= col("alpha_a"))
      .select(col("doc_a"), col("doc_b"))
    val out = cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("ov", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .filter(col("ov") * lit(1000000L) >= lit(thresholdMicros) * size(col("sh_a")))
      .select(col("doc_a"), col("doc_b"),
        expr("ov * 1000000L div size(sh_a)").as("cont_micros"))
    (out, () => { sorted.unpersist(); base.unpersist(); () })
  }

  /** Exact-duplicate groups on a content key: hash-groupBy keeping the minimum
    * id as the canonical survivor. `keyExpr` is the normalized content (e.g.
    * `md5(text)` or a normalization thereof). */
  def exactDupGroups(docs: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    docs.groupBy(keyExpr.as("content_key"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_dups"),
        concat_ws(",", sort_array(collect_list(col(idCol)))).as("members"))

  /** Corpus-wide REPEATED n-gram span detection — the substring-level dedup
    * pass (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): find word n-grams that occur in ≥ `minDocs` distinct
    * documents (boilerplate, licenses, navigation chrome, templated spam)
    * and merge each document's flagged occurrences into maximal word spans
    * `[span_start, span_end)` for removal/masking. Document-level dedup
    * misses these entirely — two different pages sharing a 200-word footer
    * are not near-duplicates, but the footer still appears a million times
    * in the training set.
    *
    * Scale shape: n-grams travel as stepwise-mod 58-bit hashes
    * ([[graft.llm.Decontam.ngramHashesMod]] — a 31-bit space saturates at
    * corpus scale), built from the once-per-distinct-word dictionary. The
    * frequent-gram set is the heavy-hitter TAIL of a map-side-combined
    * count — small by construction (the whole point is that repeats are
    * rare relative to the corpus), so AQE broadcasts it and occurrences
    * never shuffle for the probe. Only FLAGGED occurrences (the repeats
    * themselves) reach the per-document island-merge window, whose key is
    * doc_id — fine-grained and skew-free.
    *
    * Output: (doc_id, span_start, span_end) — 0-based word offsets,
    * end-exclusive, spans disjoint with ≥ one unflagged word between them. */
  def repeatedNgramSpans(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 8, minDocs: Long = 2): DataFrame =
    repeatedNgramSpansManaged(docs, idCol, textCol, n, minDocs)._1

  /** [[repeatedNgramSpans]] plus a cleanup handle: the word-hash frame feeds
    * both the frequency count and the flagged-occurrence probe — without the
    * persist the corpus scan + dictionary join run twice. */
  def repeatedNgramSpansManaged(docs: DataFrame, idCol: String, textCol: String,
                                n: Int, minDocs: Long): (DataFrame, () => Unit) = {
    val wh = wordHashFrame(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = wh.select(col("doc_id"),
      posexplode(graft.llm.Decontam.ngramHashesMod(col("whs"), n)).as(Seq("p", "ng")))
    val freq = grams.groupBy("ng")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("ng")
    val flagged = grams.join(freq, "ng").select(col("doc_id"), col("p"))
    (mergeIslands(flagged, n), () => { wh.unpersist(); () })
  }

  /** Island merge shared by every span producer: flagged (doc_id, p) n-gram
    * start positions → maximal disjoint word spans `[span_start, span_end)`,
    * chaining occurrences whose windows `[p, p+n)` touch or overlap (next
    * start at most n past the previous). Doc-keyed windows over FLAGGED
    * rows only — fine-grained, skew-free. */
  def mergeIslands(flagged: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    val prev = lag(col("p"), 1).over(byDoc)
    flagged
      .withColumn("brk", when(prev.isNull || col("p") > prev + n, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).cast("long").as("span_start"),
        (max(col("p")) + n).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** The REMOVAL half of substring-level dedup: rebuild each document's word
    * stream with the flagged spans cut out. `spans` is
    * [[repeatedNgramSpans]]' output shape (doc_id, span_start, span_end) —
    * disjoint, end-exclusive, in-bounds by construction there, but any span
    * frame with that shape works (e.g. contaminated-span masks). Documents
    * with no spans pass through untouched. Row-local after the one
    * spans-per-doc aggregation: the rebuild is a higher-order filter over
    * the word array — no shuffle of the corpus beyond the broadcast-sized
    * span join (spans exist only for flagged documents).
    *
    * Output: (doc_id, n_words, n_removed, clean_text) — clean_text in the
    * analysis tokenization (lowercased, single-space), the same convention
    * as [[TextAnalysis.chunkWords]]. */
  def removeSpans(docs: DataFrame, spans: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val byDoc = spans.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(
        col("span_start").as("s"), col("span_end").as("e")))).as("spans"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .join(byDoc, Seq("doc_id"), "left")
      .withColumn("__ws", split(lower(col("__text")), " "))
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        coalesce(expr("aggregate(spans, cast(0 as bigint), (a, sp) -> a + sp.e - sp.s)"),
          lit(0L)).as("n_removed"),
        when(col("spans").isNull, array_join(col("__ws"), " "))
          .otherwise(expr(
            "array_join(filter(__ws, (w, i) -> " +
              "!exists(spans, sp -> i >= sp.s and i < sp.e)), ' ')"))
          .as("clean_text"))
  }

  private def shr(a: Column, b: Column): Column = call_function("shiftright", a, b)

  /** 60-bit SimHash per document: bit j of the hash is the sign of the sum
    * over tokens of (bit j of md5(token) → ±1), i.e. bit j is set iff more
    * than half the tokens have it set (2·S_j > n). Computed as explode →
    * hash-once-per-token → groupBy with 60 integer sums: the partial (map-side)
    * aggregation keeps it scalable, and there is no per-token array allocation
    * (the per-row fold-of-60-arrays form measured 72 s → ~8 s at sf0.1).
    *
    * Tokens are word 3-gram shingles, not bare words: on corpora drawn from a
    * small vocabulary every document contains nearly every word, so a
    * bag-of-WORDS simhash collapses (measured: background pairs at Hamming 0);
    * shingle sets keep background pairs ~random (Hamming ≈ 30) while true
    * near-duplicates stay ≤ ~10. */
  def simhashDf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Word arrays are MATERIALIZED through an exchange before the shingle
    // lambda touches them: `shingles(text)` directly would re-evaluate the
    // captured `split(lower(text))` on every lambda element (the round-2 HOF
    // trap — measured 13.5 s vs 1.4 s for this shape on q33's identical
    // stage). Shingle STRINGS and their md5 hashes are unchanged, so the
    // DuckDB oracle math is untouched.
    val words = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("__p", "__w")))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__w")))),
        s => s.getField("__w")).as("ws"))
    val shingleStrs = when(size(col("ws")) >= 3,
      transform(sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2), element_at(col("ws"), i + 3))))
      .otherwise(array().cast("array<string>"))
    val tok = words
      .select(col("doc_id"), explode(array_distinct(shingleStrs)).as("s"))
      .select(col("doc_id"), shingleHash(col("s")).as("h"))
    val sums = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"s$j"))
    val aggs = count(lit(1)).as("n") +: sums
    val agged = tok.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val sh = (0 until 60).map(j =>
      when(col(s"s$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    agged.select(col("doc_id"), sh.as("sh"))
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** SimHash near-duplicate pairs: band the 60-bit hash into `bands`
    * equal-width buckets (any shared band ⇒ candidate — Hamming-LSH), then
    * verify `hamming <= maxDist`. Same no-all-pairs discipline as
    * [[nearDupPairs]].
    *
    * Recall contract, stated honestly (pigeonhole): a pair at Hamming
    * distance d < `bands` ALWAYS shares an untouched band and is found
    * exhaustively; beyond that the banding is probabilistic (the
    * Hamming-LSH S-curve — a distance-10 pair under 4 bands is generated
    * only when some band dodges all 10 differing bits, ≈20% for random bit
    * placement), exactly like MinHash banding above its threshold. Raise
    * `bands` to buy guaranteed radius at the cost of shorter (less
    * selective) band keys: selectivity is ~2^(60/bands) values per key. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 10, bands: Int = 4): DataFrame =
    simhashPairsManaged(docs, idCol, textCol, maxDist, bands)._1

  /** [[simhashPairs]] plus a cleanup handle: the signature frame feeds both
    * sides of the band self-join — without the persist each side recomputes
    * the full tokenize+aggregate pipeline (same contract as
    * [[nearDupPairsManaged]]). */
  def simhashPairsManaged(docs: DataFrame, idCol: String, textCol: String,
                          maxDist: Int = 10, bands: Int = 4): (DataFrame, () => Unit) = {
    require(bands >= 1 && 60 % bands == 0,
      s"bands must divide the 60-bit hash evenly, got $bands")
    val width = 60 / bands
    val mask = (1L << width) - 1
    val withH = simhashDf(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandDf = withH.select(col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("b"), shr(col("sh"), b * width).bitwiseAND(lit(mask)).as("bkey")))).as("band"))
      .select(col("doc_id"), col("sh"), col("band.b").as("b"), col("band.bkey").as("bkey"))
    val out = bandDf.as("x").join(bandDf.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hamming(col("x.sh"), col("y.sh")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
    (out, () => { withH.unpersist(); () })
  }

  /** Exact n-gram Jaccard similarity between two text columns (for pair
    * verification / small candidate sets). */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val (sa, sb) = (shingles(a, n), shingles(b, n))
    size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
  }
}
