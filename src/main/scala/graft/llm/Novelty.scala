package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus novelty scoring — how much of each document's n-gram content is
  * NEW relative to everything that came before it in corpus order.
  *
  * The measurement behind dataset-redundancy curves (how fast a growing
  * crawl stops contributing new text) and behind "freshness" selection
  * policies: a document whose 8-grams have all been seen in earlier
  * documents is a rephrase/boilerplate candidate even when no single
  * earlier document is a near-duplicate (MinHash/SimHash find PAIRS; this
  * finds diffuse redundancy against the whole prefix of the corpus).
  *
  * Semantics: a gram's OWNER is the smallest `idCol` containing it; a gram
  * is novel for exactly its owner. `novelty_micros` = novel-gram share of
  * the document's distinct grams, in integer micro-units (exact, no float
  * drift between engines).
  *
  * Two forms share the statistic:
  *  - [[ngramNovelty]] — batch, over one frame (ownership recomputed from
  *    scratch);
  *  - [[ngramNoveltyAgainst]] + [[gramIndex]]/[[mergeGramIndex]] —
  *    incremental, the standing-intake form: score each NEW batch against
  *    a persisted gram-owner index, then fold the batch into the index.
  *    When batches arrive in non-decreasing id order (append-only intake —
  *    ids are ingest sequence numbers), incremental-over-batches equals
  *    the batch statistic over the concatenated corpus EXACTLY; and the
  *    probe is naturally replay-idempotent (an index that already contains
  *    the batch yields the same scores, because the owner min is
  *    unchanged), which is what a `foreachBatch` at-least-once driver
  *    needs.
  *
  * Spark-first shape and 100 TB posture: distinct word n-grams per doc
  * (row-local, codegen), one gram-keyed partial-aggregated `min(id)` — the
  * same shuffle the repeated-span and decontam tiers run — an equi-join
  * back on the gram (exchange reuse: the aggregate's partitioning feeds
  * the join), then one doc-keyed aggregate. The incremental probe joins
  * the batch's grams against the index gram-keyed — candidates are
  * CROSS-SIDE only (batch gram → its own index rows: one per merged index,
  * one per PART in the log-structured delta layout, min-folded after the
  * join; hot grams never go N×M). No driver state, no sort, no
  * cartesian. */
object Novelty {

  /** Distinct hashed `n`-grams of each document, one row per (doc, gram):
    * (`idCol`, `gram` BIGINT). Gram identity rationale: per-word xxhash64
    * once, gram = xxhash64 of the n consecutive word hashes — never a
    * string (gram STRING construction was the measured hot path; the
    * shuffle keys on 8-byte longs); see [[Dedup.hashedGramSets]]. */
  private def explodedGrams(docs: DataFrame, idCol: String, textCol: String,
                            n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(!Set("gram", "owner", "n_grams", "n_novel", "novelty_micros")(idCol),
      s"Novelty: idCol '$idCol' collides with an output/working column name")
    Dedup.hashedGramSets(
        docs.select(col(idCol).as("doc_id"), col(textCol)), "doc_id", textCol, n)
      .select(col("doc_id").as(idCol), explode(col("sh")).as("gram"))
  }

  /** [[explodedGrams]] exposed for COMPUTE-ONCE callers (guide §1.4): a
    * standing intake derives three per-batch frames from the same exploded
    * (doc, gram) rows — the bucket-stats probe, the novelty scores, and the
    * gram-index delta — and without a shared materialized frame each one
    * re-runs the explode/collect pipeline over the batch text. Persist the
    * result and pass it to [[ngramNoveltyAgainstGrams]] /
    * [[gramIndexFromGrams]] / [[gramBucketStatsAgg]]; the values are
    * IDENTICAL to the internal form (same function). */
  def explodedGramFrame(docs: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = explodedGrams(docs, idCol, textCol, n)

  /** The per-doc novelty aggregate shared by both forms: count distinct
    * grams and owned grams per doc, then re-attach every input doc (docs
    * below `n` words have zero grams and a null ratio). */
  private def perDocStats(docs: DataFrame, exploded: DataFrame,
                          owner: DataFrame, idCol: String): DataFrame = {
    val per = exploded.join(owner, "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("owner") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          expr("n_novel * 1000000 div n_grams")).as("novelty_micros"))
  }

  /** Per-document novelty against the `idCol`-ordered corpus prefix.
    *
    * Returns one row per input document: `idCol`, `n_grams` (distinct word
    * `n`-grams, 0 for docs shorter than `n` words), `n_novel` (grams this
    * document owns), `novelty_micros` (= n_novel·10^6 div n_grams, null
    * when the document has no grams).
    *
    * Tokenization is the catalog's standard: lowercase, split on a single
    * space (empty tokens preserved — both engines agree). Every OUTPUT is
    * a count — identical to the string-gram computation absent a 64-bit
    * collision between two distinct grams of the corpus (the q33
    * hash-invariance argument; the oracle computes the string form and
    * hash-matches). */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 8): DataFrame =
    ngramNoveltyFromGrams(docs, explodedGrams(docs, idCol, textCol, n), idCol)

  /** [[ngramNovelty]] from an already-materialized [[explodedGramFrame]]
    * (the exploded rows are referenced twice here — owner aggregate and
    * per-doc stats — so callers sharing them with other consumers should
    * persist the frame). */
  def ngramNoveltyFromGrams(docs: DataFrame, exploded: DataFrame,
                            idCol: String): DataFrame = {
    // the gram's owner: the earliest document containing it
    val owner = exploded.groupBy("gram").agg(min(col(idCol)).as("owner"))
    perDocStats(docs, exploded, owner, idCol)
  }

  /** The persisted-index form of the gram-owner map: one row per distinct
    * gram of `docs`, (`gram` BIGINT, `owner` = min `idCol` containing it).
    * Write it out (parquet), fold new batches in with [[mergeGramIndex]],
    * probe with [[ngramNoveltyAgainst]]. Index size is vocabulary-scale
    * (distinct grams), not corpus-scale. */
  def gramIndex(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 8): DataFrame =
    gramIndexFromGrams(explodedGrams(docs, idCol, textCol, n), idCol)

  /** [[gramIndex]] from an already-materialized [[explodedGramFrame]] —
    * the compute-once form for callers that also score/probe the same
    * batch's grams. */
  def gramIndexFromGrams(exploded: DataFrame, idCol: String): DataFrame =
    exploded.groupBy("gram").agg(min(col(idCol)).as("owner"))

  /** Fold one gram-owner index into another: per gram, the smaller owner
    * wins (set union with min semantics). Both frames must be
    * (gram, owner)-shaped — [[gramIndex]] output or a prior merge. */
  def mergeGramIndex(index: DataFrame, delta: DataFrame): DataFrame = {
    Seq(index, delta).foreach { f =>
      require(f.columns.toSeq == Seq("gram", "owner"),
        s"mergeGramIndex: expected (gram, owner) frames, got ${f.columns.toSeq}")
    }
    index.union(delta).groupBy("gram").agg(min(col("owner")).as("owner"))
  }

  /** Collapse an arbitrary UNION of gram-owner parts (duplicate grams across
    * parts allowed — the log-structured delta layout a standing intake
    * appends) into a unique-gram index: per gram, the smallest owner wins.
    * Min-merging is idempotent and order-free, so overlapping or replayed
    * parts are harmless by construction. One gram-keyed aggregate —
    * vocabulary-scale, the COMPACTION cost paid every K batches instead of
    * every batch. */
  def compactGramIndex(parts: DataFrame): DataFrame = {
    require(parts.columns.toSeq == Seq("gram", "owner"),
      s"compactGramIndex: expected a (gram, owner) part union, got ${parts.columns.toSeq}")
    parts.groupBy("gram").agg(min(col("owner")).as("owner"))
  }

  /** Hard ceiling on the state-bucket count: the per-batch probe collects
    * the batch's distinct bucket ids (≤ numBuckets values) to prune the
    * index read, so the bucket domain must stay metadata-scale by
    * construction. 16384 buckets of a 100 TB-corpus vocabulary index keep
    * each bucket well under a task's working set. */
  val MaxBuckets: Int = 1 << 14

  /** The state bucket of a gram under a `numBuckets`-way layout:
    * `pmod(gram, numBuckets)` — gram values are already uniform hashes
    * (mod-P polynomial over per-word xxhash/md5 values), so the residue is
    * uniform and DETERMINISTIC across engines and restarts. Both the index
    * writer and the probe derive buckets through this one function; a
    * layout written under a different bucket count must be refused by the
    * caller (the bucket ids would not line up and pruning would silently
    * drop matches). */
  def gramBucket(gram: Column, numBuckets: Int): Column = {
    require(numBuckets >= 1 && numBuckets <= MaxBuckets,
      s"gramBucket: numBuckets must be in [1, $MaxBuckets], got $numBuckets")
    pmod(gram, lit(numBuckets.toLong)).cast("int")
  }

  /** A (gram, owner) index frame with its `bkt` state bucket attached —
    * what a bucket-partitioned intake WRITES (`partitionBy("bkt")`), so the
    * per-batch probe can prune the read to the buckets the batch actually
    * touches instead of scanning (and worse, exchanging) the full
    * vocabulary-scale index. */
  def withGramBucket(index: DataFrame, numBuckets: Int): DataFrame = {
    require(index.columns.toSeq == Seq("gram", "owner"),
      s"withGramBucket: expected a (gram, owner) frame, got ${index.columns.toSeq}")
    index.withColumn("bkt", gramBucket(col("gram"), numBuckets))
  }

  /** The distinct state buckets a batch's grams touch — the PRUNING SET for
    * a bucket-partitioned index probe: `index.where(bkt isin …)` before
    * [[ngramNoveltyAgainst]] reads only matching bucket directories, and
    * every pruned-away index gram provably cannot match any batch gram
    * (the bucket is a pure function of the gram), so the scores are
    * unchanged. One batch-scale pass + a collect clamped at
    * [[MaxBuckets]] values by construction. */
  def gramBuckets(batch: DataFrame, idCol: String, textCol: String, n: Int,
                  numBuckets: Int): Seq[Int] =
    gramBucketStats(batch, idCol, textCol, n, numBuckets)._1

  /** [[gramBuckets]] plus the batch's DISTINCT-GRAM COUNT in the same
    * single pass (buckets partition the gram space, so the per-bucket
    * distinct counts sum exactly): the count is what a caller needs to
    * decide whether the batch-gram side is small enough to pin as a
    * broadcast build ([[ngramNoveltyAgainst]]'s `broadcastProbe`) or must
    * degrade to the shuffled join — measured, not assumed. */
  def gramBucketStats(batch: DataFrame, idCol: String, textCol: String,
                      n: Int, numBuckets: Int): (Seq[Int], Long) = {
    val rows = explodedGrams(batch, idCol, textCol, n)
      .select(gramBucket(col("gram"), numBuckets).as("bkt"), col("gram"))
      .groupBy("bkt").agg(count_distinct(col("gram")).as("c"))
      .collect()
    (rows.map(_.getInt(0)).toSeq.sorted, rows.map(_.getLong(1)).sum)
  }

  /** [[gramBucketStats]] as a ONE-ROW AGGREGATE frame instead of a collect:
    * (`gbkts` ARRAY<STRUCT<bkt INT, c BIGINT>>) — the per-bucket distinct-gram
    * counts packed into a single row so the probe can RIDE another action's
    * plan (a cross join into [[Clusters.connectedComponentsManagedProbed]]'s
    * first certificate: guide §1.2, merge driver actions). Always exactly one
    * row (an empty batch yields an empty array, never zero rows — a zero-row
    * side would erase the host action's row through the cross join). Decode
    * with [[parseGramBucketStats]]. */
  def gramBucketStatsAgg(exploded: DataFrame, numBuckets: Int): DataFrame =
    exploded
      .select(gramBucket(col("gram"), numBuckets).as("bkt"), col("gram"))
      .groupBy("bkt").agg(count_distinct(col("gram")).as("c"))
      .agg(collect_list(struct(col("bkt"), col("c"))).as("gbkts"))

  /** Decode one [[gramBucketStatsAgg]] value (a `gbkts` array cell from the
    * host action's Row) into [[gramBucketStats]]'s (buckets, distinct-gram
    * count) shape. */
  def parseGramBucketStats(cell: Seq[org.apache.spark.sql.Row]): (Seq[Int], Long) =
    (cell.map(_.getInt(0)).sorted, cell.map(_.getLong(1)).sum)

  /** Per-document novelty of a NEW batch against the accumulated corpus —
    * the standing-intake form of [[ngramNovelty]].
    *
    * A batch gram's owner is the least of the index owner (null when the
    * corpus has never seen the gram) and the earliest batch doc containing
    * it — so in-batch redundancy counts exactly as the batch form counts
    * it, and corpus history counts through the index. Same output schema
    * as [[ngramNovelty]], one row per batch document.
    *
    * Exactness contract: when every id in `batch` is ≥ every owner in
    * `index` (append-only, id-ordered intake), the scores equal
    * [[ngramNovelty]] over the concatenated corpus. Replay-idempotent: an
    * index that ALREADY contains this batch (a `foreachBatch` retry after
    * the index update committed) yields identical scores, because
    * including a doc's own id in the min changes nothing.
    *
    * The contract is ENFORCED, not just documented: an index owner LARGER
    * than the batch's earliest id for a shared gram is refused loudly (a
    * lazy per-gram `raise_error`, zero extra passes). In a valid
    * append-only intake every index owner ≤ every batch id, so
    * `__iown ≤ __bown` always; on a legitimate replay the batch's own
    * grams fold back with their own ids, so equality is the worst case —
    * `__iown > __bown` can only arise when a LARGER-id document was
    * ingested into the index before this batch, i.e. out-of-order intake.
    * The check fires exactly when it matters: an out-of-order ingest whose
    * documents share no grams leaves every owner min (and thus every
    * score) identical to the in-order batch statistic, and is allowed
    * through. */
  /** `broadcastProbe`: when the caller can BOUND the batch (a standing
    * intake's admission control — maxFilesPerTrigger / batch sizing), set
    * true to pin the batch-gram side as the broadcast build: the plan is
    * then statically a broadcast join with the index STREAMED — zero
    * exchange of the index, deterministically. Left false (default), the
    * planner decides: AQE converts to broadcast when the gram set turns
    * out small, but only AFTER the shuffle stages are submitted — the
    * index-side shuffle WRITE still happens once, which is exactly the
    * per-batch cost a standing service must not pay. The hint is the
    * batch-bounds contract made explicit; an unbounded caller must leave
    * it off (a forced broadcast of a huge gram set fails loudly rather
    * than degrading). */
  def ngramNoveltyAgainst(index: DataFrame, batch: DataFrame, idCol: String,
                          textCol: String, n: Int = 8,
                          broadcastProbe: Boolean = false): DataFrame =
    ngramNoveltyAgainstGrams(index, batch,
      explodedGrams(batch, idCol, textCol, n), idCol, broadcastProbe)

  /** [[ngramNoveltyAgainst]] from an already-materialized
    * [[explodedGramFrame]] (compute-once for callers that also build the
    * batch's gram-index delta and bucket stats from the same rows — the
    * exploded frame is referenced three times inside this plan alone, so
    * callers should persist it). Values identical to the text form. */
  def ngramNoveltyAgainstGrams(index: DataFrame, batch: DataFrame,
                               exploded: DataFrame, idCol: String,
                               broadcastProbe: Boolean = false): DataFrame = {
    require(index.columns.toSeq == Seq("gram", "owner"),
      s"ngramNoveltyAgainst: index must be (gram, owner) — gramIndex/" +
        s"mergeGramIndex/compactGramIndex output, or a raw PART UNION of " +
        s"them — got ${index.columns.toSeq}")
    val batchOwner = exploded.groupBy("gram").agg(min(col(idCol)).as("__bown"))
    // The index may carry DUPLICATE gram rows (the log-structured part-union
    // shape: base + deltas, each owning the gram once) — the post-join min
    // folds them to the true index owner; on a unique-gram index min is the
    // identity, so the merged-index path pays nothing.
    //
    // JOIN SHAPE (the 100 TB decision): the index probe is an INNER join
    // with the batch grams, min-folded, then a batch-scale LEFT OUTER
    // stitches the misses back — NOT a single left-outer with the batch as
    // the outer-preserving side. In that one-join form the batch side is
    // the left of a LEFT OUTER, which is not a legal broadcast build side,
    // so the planner is FORCED into a sort-merge join that EXCHANGES the
    // full vocabulary-scale index every probe — the dominant per-batch cost
    // of a standing intake at scale. In the inner form the big index is the
    // streamed side: AQE broadcasts the (batch-vocabulary-scale) gram set
    // and the index is scanned ONCE with zero shuffle — and when a huge
    // batch genuinely exceeds the broadcast threshold it degrades to the
    // shuffled join, never anything worse than the old shape. Cost: the
    // batch grams are computed once more (batch-scale, codegen'd row-local
    // work) — the right trade against shuffling the index.
    val ownerType = index.schema("owner").dataType
    val iownChecked = when(col("__iown").isNull || col("__iown") <= col("__bown"),
        col("__iown"))
      .otherwise(raise_error(concat(
        lit("ngramNoveltyAgainst: index owner "), col("__iown").cast("string"),
        lit(" > batch owner "), col("__bown").cast("string"),
        lit(" for a shared gram — the index contains a LARGER-id document " +
          "than this batch, so the intake is out of id order and the " +
          "incremental-equals-batch exactness contract is void; feed " +
          "batches in non-decreasing id order"))).cast(ownerType))
    // least() skips nulls: an index miss leaves the batch owner; cross-side
    // candidates only (each batch gram meets only its own index rows).
    // The ordering check runs on the FOLDED index owner: the true
    // concatenated-corpus owner is min(all part owners, batch owner), so a
    // larger-but-not-minimal part owner provably cannot change any score.
    val probeGrams = exploded.select(col("gram")).distinct()
    val matched = index.withColumnRenamed("owner", "__iown")
      .join(if (broadcastProbe) broadcast(probeGrams) else probeGrams,
        Seq("gram"))
      .groupBy("gram").agg(min(col("__iown")).as("__iown"))
    val owner = batchOwner
      .join(matched, Seq("gram"), "left_outer")
      .select(col("gram"), least(col("__bown"), iownChecked).as("owner"))
    perDocStats(batch, exploded, owner, idCol)
  }
}
