package graft.app

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.llm.{Dedup, Drift, Novelty, Selection, UrlFilter}

/** Standing corpus-intake pipeline — the q88 capstone (domain blocklist →
  * n-gram novelty → exact stratified split) driven CONTINUOUSLY from a
  * document stream, instead of as a batch job over a finished corpus, with
  * an optional PAIRWISE near-dup gate (the q59 incremental-MinHash probe
  * against the accumulated corpus) between the blocklist and novelty
  * stages, and optional per-batch DRIFT monitoring (q87/q90's statistics)
  * against the accumulated reference — blocklist kills bad sources,
  * near-dup kills single-document copies, novelty kills diffuse
  * redundancy, drift watches what survives, split routes it. This closes
  * the loop between the repo's two halves: the llm curation operators and
  * the streaming engine tier.
  *
  * Spark-first shape: the novelty stage is stateful ACROSS batches (each
  * batch scores against everything already ingested), but its state is a
  * vocabulary-scale gram-owner TABLE, not per-key stream state — so the
  * pipeline runs as `foreachBatch` over a parquet index, the same pattern
  * the incremental MinHash tier uses (q59), not as a
  * `flatMapGroupsWithState` (gram state is not keyed by a stream key, and
  * the index must be joinable at corpus-scale — a parquet side input is
  * exactly that).
  *
  * PER-BATCH COST IS FLAT IN CORPUS SIZE — every piece of standing state
  * is probed by scan and written by DELTA, never rewritten whole:
  *
  *  - Gram index: LOG-STRUCTURED. Batch `i` writes only its own grams as
  *    `indexDir/delta=<i>` (batch-vocabulary-scale); the probe reads the
  *    union of the latest `base=<h>` plus the deltas in (h, i) —
  *    [[Novelty.ngramNoveltyAgainst]] min-folds duplicate gram rows after
  *    the join, so the raw part union needs no pre-merge. Every
  *    `compactEvery` pending deltas, the parts STRICTLY BELOW the current
  *    batch are folded into a new base ([[Novelty.compactGramIndex]]) and
  *    retired — amortized O(vocab/K) write per batch instead of O(vocab),
  *    where the full-rewrite protocol paid O(vocab · batches) total I/O
  *    over a run (quadratic in batch count).
  *  - Near-dup gate: the survivors' MinHash SIGNATURES are persisted per
  *    batch (`corpusDir/sigs=<i>`) and the probe joins the stored
  *    signature parts ([[Dedup.incrementalNearDupIndexedManaged]]); the
  *    corpus TEXT parts are touched only by the candidate verify join —
  *    signatures are never recomputed from accumulated text.
  *  - Drift state: domain-scale (value, count) tables per statistic, one
  *    fold per batch; the KS/TV compare runs on the counts
  *    ([[Drift.ecdfDriftFromCounts]]/[[Drift.categoricalDriftFromCounts]])
  *    and never re-scans the corpus.
  *  - With `stateBuckets` > 0 the probes are additionally PRUNED, not just
  *    scan-shaped: gram-index and band-index parts are written partitioned
  *    by a key bucket, each batch reads only the buckets its own keys
  *    touch, and nothing ever exchanges the standing index (the novelty
  *    probe's inner-join shape keeps the index on the streamed side).
  *
  * Besides the assignments, every batch writes its DROP LEDGER
  * (`outDir/rejects/batch=<i>`: (doc_id, stage, reason) for each document
  * the blocklist/near-dup/in-batch/novelty stages rejected) and a
  * TELEMETRY row (`outDir/metrics/batch=<i>`: stage counts, state part
  * counts/bytes, probed buckets/bytes) — a standing curation service must
  * account for what it dropped and what its probes actually read.
  *
  * Restart determinism (spec-verified across a kill/resume): batch `i`
  * always scores against state written by batches STRICTLY BELOW `i`,
  * writes its outputs with per-batch overwrite, and only then appends its
  * own state parts — so a replayed batch reads the same state, recomputes
  * byte-identical assignments, and re-overwrites the same paths.
  * Compaction only ever folds parts strictly below the current batch, so
  * a replay sees identical CONTENT whether or not the compaction landed;
  * and because gram-index merging is an idempotent min, even overlapping
  * leftover parts from a mid-compaction crash are harmless by
  * construction. The novelty probe itself is also replay-idempotent even
  * if the batch's own delta already landed (a doc's own id in the owner
  * min changes nothing — see [[Novelty.ngramNoveltyAgainst]]).
  *
  * Exactness contract, inherited from the novelty operator: when doc ids
  * arrive in non-decreasing order across batches (ids are ingest sequence
  * numbers — the append-only intake shape), the novelty scores equal the
  * batch statistic over the concatenated corpus exactly — and the
  * operator REFUSES out-of-order ingest that would corrupt a score.
  * Split quotas are exact PER BATCH (each batch apportioned by largest
  * remainder within its strata) or CUMULATIVE (`countersDir` set); a null
  * stratum refuses loudly ([[Selection.splitAssign]]).
  */
object Intake {

  /** The intake document wire schema (JSON lines): ingest-ordered id,
    * stratum label, text, and the host for the blocklist stage. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType),
    StructField("host", StringType)))

  final case class Config(
      inputDir: String,
      checkpointDir: String,
      /** Log-structured gram-owner index root: batch i appends
        * `delta=<i>`; every `compactEvery` pending deltas fold into
        * `base=<h>` (h = the newest part strictly below the compacting
        * batch) and retire. */
      indexDir: String,
      /** Assignment output root: batch i overwrites `batch=i`; with
        * `driftDir` set, drift reports land at `drift/batch=i`. */
      outDir: String,
      blocklist: Seq[String],
      /** Optional PAIRWISE near-dup gate between the blocklist and the
        * novelty stages (the q59 incremental-MinHash probe): batch docs
        * whose shingle Jaccard against any ACCUMULATED corpus doc reaches
        * the threshold are dropped before novelty scoring. Requires
        * `corpusDir`. Cross-side only — within-batch near-dups are the
        * novelty stage's job (exact dups score 0) or `inBatchNearDup`'s
        * pass; the accumulated corpus grows by each batch's near-dup
        * SURVIVORS: text at `corpusDir/part=<batch>` (verify joins only)
        * and their MinHash signatures at `corpusDir/sigs=<batch>` (the
        * probe's index — append-only, replay overwrites its own parts). */
      nearDupThreshold: Option[Double] = None,
      corpusDir: Option[String] = None,
      /** Also dedup WITHIN each batch (requires `nearDupThreshold`): after
        * the cross-batch gate, the batch's own near-dup pairs
        * ([[Dedup.nearDupPairs]], same threshold/parameters) collapse to
        * clusters ([[graft.llm.Clusters.assign]]) and only each cluster's
        * canonical (minimum-id) document survives. Off by default — exact
        * within-batch duplicates already score novelty 0, so this matters
        * when batches are large enough to carry internal NEAR-duplicates
        * past the noveltyMinMicros gate. */
      inBatchNearDup: Boolean = false,
      numHashes: Int = 12,
      bands: Int = 4,
      noveltyMinMicros: Long = 200000L,
      splits: Seq[(String, Long)] = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L),
      /** When set, split assignment runs in the CONTINUING form
        * ([[Selection.splitAssignContinuing]]): per-(stratum, split)
        * counters persist here (versioned `v=<batch>`, same
        * strictly-below-replay protocol as the gram index), and each
        * batch is cut against the CUMULATIVE Hamilton quotas — the global
        * ratio holds over everything ingested, not merely within each
        * batch. Unset = independent per-batch quotas (q88 semantics). */
      countersDir: Option[String] = None,
      /** When set, per-batch drift monitoring: the batch's word-count
        * distribution (integer-ECDF KS) and language mix (categorical TV)
        * are compared against the ACCUMULATED reference of all prior
        * surviving batches, written to `outDir/drift/batch=<i>` as
        * (stat, grp_a, grp_b, n_a, n_b, d_micros); the domain-scale count
        * state versions here (`wc/v=<i>`, `lang/v=<i>`, strictly-below
        * replay like the counters). The first batch has no reference and
        * writes no report. Thresholding is the caller's policy — this is
        * the measurement, logged beside the assignments it describes. */
      driftDir: Option[String] = None,
      n: Int = 8,
      seed: String = "intake",
      /** Fold pending gram-index deltas into a new base once this many
        * accumulate (amortized O(vocab/K) index write per batch). */
      compactEvery: Int = 8,
      /** BUCKET-PARTITIONED state layout (> 0 = bucket count, 0 = the flat
        * legacy layout): gram-index parts are written partitioned by
        * `bkt = pmod(gram, stateBuckets)` ([[Novelty.gramBucket]]) and the
        * near-dup state as pre-banded parts partitioned by a hash of the
        * band key ([[Dedup.bandIndexFrame]]), so each batch's probes READ
        * ONLY the buckets the batch touches (partition-directory pruning)
        * and nothing ever exchanges or scans the full standing index —
        * the difference between per-batch cost proportional to the BATCH
        * and proportional to everything ever ingested, which is the whole
        * game at 100 TB. How much the pruning saves is proportional to
        * the batch's KEY coverage of the bucket domain: band keys are
        * doc-scale (bands × docs), so the near-dup probe prunes hard for
        * ordinary micro-batches; gram keys are vocabulary-scale, so a
        * bulk batch touches most gram buckets and the layout's win there
        * is the scan-not-exchange posture (the index streams through a
        * broadcast join, never shuffles) plus hard pruning for narrow
        * tail batches. SIZING: pick the bucket count so bucket FILES stay
        * chunk-sized — B ≈ expected state bytes / 128–512 MB (a 100 TB
        * corpus's few-TB gram index wants thousands of buckets; a local
        * run wants 64) — an oversized B turns every part into thousands
        * of sub-KB files and file overhead dominates (measured ~5× the
        * per-batch cost at B=4096 over a 3 MB index). Scores are
        * layout-invariant (spec-asserted
        * against the flat layout): a pruned-away row's bucket is a pure
        * function of its key, so it provably cannot match any batch key.
        * The bucket count is pinned per state directory (a `_state_buckets`
        * marker): restarting with a different value is refused loudly —
        * bucket ids from two layouts do not line up, and a silent mix
        * would drop matches. */
      stateBuckets: Int = 0,
      /** The probes pin their batch-key side as a broadcast build only
        * while its MEASURED size (distinct grams / band rows, counted on
        * already-cached frames) stays under this bound; a larger batch
        * degrades to the shuffled join over the bucket-PRUNED index —
        * bounded by the batch's key coverage, never a forced broadcast
        * OOM. 4M longs ≈ 32 MB of key payload, comfortably inside
        * executor broadcast budgets. */
      maxBroadcastKeys: Long = 4L << 20,
      /** Retired state (compacted index parts, superseded counter/drift
        * versions) is deleted after each batch unless this is set. */
      keepAllIndexVersions: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None)

  private def versionsOf(spark: SparkSession, dir: String,
                         prefix: String = "v="): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).collect { case s if s.startsWith(prefix) =>
        s.stripPrefix(prefix).toLong }
  }

  private def delete(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Pin a state directory's bucket layout: the first writer records
    * `stateBuckets` in a `_state_buckets` marker; every later run must
    * match it exactly — bucket ids from two layouts do not line up, so a
    * silent mix would prune away genuine matches. */
  private def layoutGuard(spark: SparkSession, dir: String, buckets: Int): Unit = {
    val p = new Path(dir, "_state_buckets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val found =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      require(found == buckets,
        s"Intake: state at $dir was written with stateBuckets=$found but " +
          s"this run is configured with stateBuckets=$buckets — bucket ids " +
          "from the two layouts do not line up, so pruned probes would " +
          "silently drop matches; keep the recorded layout or rebuild the state")
    } else {
      val out = fs.create(p, true)
      try out.write(buckets.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Write a bkt-carrying frame as a bucket-partitioned part: repartition
    * by the bucket FIRST, so each bucket directory holds one file per
    * owning task instead of one per upstream partition (a direct
    * `partitionBy` from a B-spanning shuffle writes tasks × buckets small
    * files — the classic dynamic-partition file explosion). */
  private def writeBucketed(df: DataFrame, path: String): Unit =
    df.repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(path)

  /** (total, probed) byte size of one state part — ONE recursive listing
    * per part (directory-listing scale, used only by the per-batch
    * telemetry frame). `probed` = the bucket ids the batch's probe read;
    * None = the probe was unpruned, so probed equals total. */
  private def partBytes(spark: SparkSession, path: String,
                        probed: Option[Set[Int]]): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (0L, 0L)
    else {
      var tot = 0L
      var pr = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        tot += f.getLen
        val parent = f.getPath.getParent.getName
        val hit = probed match {
          case None => true
          case Some(ks) => parent.startsWith("bkt=") &&
            scala.util.Try(parent.stripPrefix("bkt=").toInt).toOption.exists(ks)
        }
        if (hit) pr += f.getLen
      }
      (tot, pr)
    }
  }

  /** One micro-batch of the intake pipeline: blocklist → (optional)
    * stored-signature near-dup gate → incremental novelty against the
    * pre-batch part union → (optional) drift report → exact split →
    * overwrite `outDir/batch=<id>` (assignments), `outDir/rejects/batch=
    * <id>` (the per-stage DROP LEDGER: every document the batch rejected,
    * with the stage and a reason — audits and threshold tuning need the
    * rejects as much as the survivors), `outDir/metrics/batch=<id>` (the
    * state-size/probe-I/O telemetry row — the no-silent-caps rule for a
    * standing service), and append this batch's state parts. Assignments,
    * rejects and every scored state part are a deterministic function of
    * (batch contents, id, on-disk state parts < id) — the replay contract
    * above; the telemetry row alone may differ across a replay that
    * straddles a compaction (it reports the bytes of whatever pre-batch
    * parts exist). Package-visible so the spec can drive a replayed batch
    * directly. */
  private[app] def processBatch(spark: SparkSession, cfg: Config,
                                batch: DataFrame, id: Long): Unit = {
    import spark.implicits._
    require(cfg.nearDupThreshold.isEmpty || cfg.corpusDir.nonEmpty,
      "Intake: nearDupThreshold requires corpusDir (the accumulated corpus " +
        "the near-dup probe compares against)")
    require(cfg.compactEvery >= 1,
      s"Intake: compactEvery must be >= 1, got ${cfg.compactEvery}")
    require(cfg.stateBuckets == 0 ||
      (cfg.stateBuckets >= 1 && cfg.stateBuckets <= Novelty.MaxBuckets),
      s"Intake: stateBuckets must be 0 (flat layout) or in " +
        s"[1, ${Novelty.MaxBuckets}], got ${cfg.stateBuckets}")
    layoutGuard(spark, cfg.indexDir, cfg.stateBuckets)
    cfg.corpusDir.foreach(cd => layoutGuard(spark, cd, cfg.stateBuckets))
    val bucketed = cfg.stateBuckets > 0
    val cleanups = scala.collection.mutable.ArrayBuffer[() => Unit]()
    val b = batch.persist()
    cleanups += (() => { b.unpersist(); () })
    try {
      val bl = cfg.blocklist.toDF("entry")
      val flagged = UrlFilter.domainBlocklist(b, "host", Seq("doc_id"), bl)
      val blocklisted = flagged
        .filter(!col("blocked"))
        .select("doc_id", "lang", "text")
      val rejBlocklist = flagged.filter(col("blocked"))
        .select(col("doc_id"), lit("blocklist").as("stage"),
          concat(lit("blocked_by:"), col("blocked_by")).as("reason"))

      // optional q59-shape near-dup gate: probe the STORED signature parts
      // < id (part=id / sigs=id / bands=id excluded — a crashed run may
      // have written them; replay must not compare the batch against
      // itself). Corpus text parts feed ONLY the candidate verify join.
      // Bucketed layout: the stored state is PRE-BANDED and partitioned by
      // the band-key bucket, so the probe reads only matching buckets.
      var sigParts = 0
      var probedSigBkts: Option[Seq[Int]] = None // None = unpruned probe
      var probedTextBkts: Option[Seq[Int]] = None
      val (kept1, rejNearDup) = (cfg.nearDupThreshold, cfg.corpusDir) match {
        case (Some(t), Some(cd)) =>
          val parts = versionsOf(spark, cd, prefix = "part=").filter(_ < id).sorted
          sigParts = parts.size
          if (parts.isEmpty)
            (blocklisted, spark.emptyDataset[(Long, String, String)]
              .toDF("doc_id", "stage", "reason"))
          else {
            // bucketed layout: text parts carry the doc bucket, so the
            // candidate verify read prunes to matched buckets (the text
            // scan was the last per-batch read linear in corpus size)
            val corpusText =
              if (bucketed)
                parts.map(p => spark.read
                    .schema("doc_id BIGINT, text STRING, bkt INT")
                    .parquet(s"$cd/part=$p")
                    .select("doc_id", "text", "bkt"))
                  .reduce(_.unionByName(_))
              else spark.read
                .schema("doc_id BIGINT, text STRING")
                .parquet(parts.map(p => s"$cd/part=$p"): _*)
                .select(col("doc_id"), col("text"))
            val dups =
              if (bucketed) {
                // per-part reads unioned (NOT one multi-root read): the
                // part dirs are themselves name=value shaped, so Spark's
                // partition discovery over several roots would try to
                // treat them as a partition column and refuse
                val banded = parts.map(p => spark.read
                    .schema("doc_id BIGINT, b INT, bkey STRING, w INT, bkt INT")
                    .parquet(s"$cd/bands=$p")
                    .select("doc_id", "b", "bkey", "w", "bkt"))
                  .reduce(_.unionByName(_))
                val probe = Dedup.incrementalNearDupBanded(
                  banded, corpusText, blocklisted.select("doc_id", "text"),
                  "doc_id", "text", cfg.numHashes, cfg.bands,
                  cfg.stateBuckets, t, cfg.maxBroadcastKeys)
                cleanups += probe.cleanup
                probedSigBkts = Some(probe.probedBuckets)
                probedTextBkts = probe.probedTextBuckets
                probe.pairs
              } else {
                val corpusSigs = spark.read
                  .schema("doc_id BIGINT, mh ARRAY<BIGINT>")
                  .parquet(parts.map(p => s"$cd/sigs=$p"): _*)
                  .select(col("doc_id"), col("mh"))
                val (pairs, release) = Dedup.incrementalNearDupIndexedManaged(
                  corpusSigs, corpusText, blocklisted.select("doc_id", "text"),
                  "doc_id", "text", cfg.numHashes, cfg.bands, t)
                cleanups += release
                pairs
              }
            // one row per dropped doc (used by both the anti-join and the
            // ledger) — persisted so the probe runs once
            val dupAgg = dups
              .groupBy(col("batch_id").as("doc_id"))
              .agg(min(col("corpus_id")).as("__dup_of"))
              .persist()
            cleanups += (() => { dupAgg.unpersist(); () })
            (blocklisted.join(dupAgg.select("doc_id"), Seq("doc_id"), "left_anti"),
              dupAgg.select(col("doc_id"), lit("near_dup").as("stage"),
                concat(lit("near_dup_of:"), col("__dup_of")).as("reason")))
          }
        case _ =>
          (blocklisted, spark.emptyDataset[(Long, String, String)]
            .toDF("doc_id", "stage", "reason"))
      }
      // optional WITHIN-batch dedup: the batch's own near-dup pairs
      // collapse to clusters, the minimum id per cluster survives —
      // deterministic, so replay-safe like every other stage
      require(!cfg.inBatchNearDup || cfg.nearDupThreshold.nonEmpty,
        "Intake: inBatchNearDup requires nearDupThreshold (the same " +
          "calibration the cross-batch gate uses)")
      val (kept1x, rejInBatch) = (cfg.inBatchNearDup, cfg.nearDupThreshold) match {
        case (true, Some(t)) =>
          val (pairs, relP) = Dedup.nearDupPairsManaged(
            kept1.select("doc_id", "text"), "doc_id", "text",
            cfg.numHashes, cfg.bands, t)
          cleanups += relP
          val (assigned0, relA) = graft.llm.Clusters.assignManaged(
            kept1.select("doc_id"), pairs.select("doc_a", "doc_b"))
          cleanups += relA
          val assigned = assigned0.persist()
          cleanups += (() => { assigned.unpersist(); () })
          (kept1.join(
            assigned.filter(col("doc_id") === col("cluster_id"))
              .select("doc_id"), "doc_id"),
            assigned.filter(col("doc_id") =!= col("cluster_id"))
              .select(col("doc_id"), lit("in_batch_near_dup").as("stage"),
                concat(lit("canonical:"), col("cluster_id")).as("reason")))
        case _ =>
          (kept1, spark.emptyDataset[(Long, String, String)]
            .toDF("doc_id", "stage", "reason"))
      }
      val kept1p = kept1x.persist()
      cleanups += (() => { kept1p.unpersist(); () })

      // the index this batch scores against: the part union STRICTLY
      // below id — latest base plus the deltas above it (a crashed run
      // may already have written delta=id; replay must not read its own
      // output). ngramNoveltyAgainst min-folds the duplicate gram rows.
      // Bucketed layout: the read is PRUNED to the buckets the batch's own
      // grams touch (partition-directory pruning — non-matching buckets'
      // files are never opened; exact, because a pruned gram's bucket is a
      // pure function of the gram, so it cannot match any batch gram).
      val baseV = versionsOf(spark, cfg.indexDir, prefix = "base=")
        .filter(_ < id).sorted.lastOption
      val deltaVs = versionsOf(spark, cfg.indexDir, prefix = "delta=")
        .filter(d => d < id && baseV.forall(d > _)).sorted
      val partPaths = baseV.map(v => s"${cfg.indexDir}/base=$v").toSeq ++
        deltaVs.map(v => s"${cfg.indexDir}/delta=$v")
      var probedGramBkts: Option[Seq[Int]] = None // None = unpruned probe
      var batchGrams = -1L // measured distinct grams (bucketed path only)
      def readIndexParts(): DataFrame =
        if (bucketed)
          // per-part reads unioned — see the bands read above for why a
          // multi-root partitioned read is refused by partition discovery
          partPaths.map(pp =>
            spark.read.schema("gram BIGINT, owner BIGINT, bkt INT")
              .parquet(pp).select("gram", "owner", "bkt"))
            .reduce(_.unionByName(_))
        else spark.read.parquet(partPaths: _*)
      val prevIndex =
        if (partPaths.isEmpty) None
        else if (bucketed) {
          val (bkts, nGrams) = Novelty.gramBucketStats(
            kept1p.select("doc_id", "text"), "doc_id", "text", cfg.n,
            cfg.stateBuckets)
          probedGramBkts = Some(bkts)
          batchGrams = nGrams
          Some(readIndexParts()
            .where(col("bkt").isin(bkts: _*))
            .select("gram", "owner"))
        } else Some(readIndexParts().select("gram", "owner"))

      val scored = (prevIndex match {
        case Some(idx) =>
          // broadcastProbe while the batch-gram side is MEASURED small
          // (the bucketed path counts distinct grams in the same pass
          // that derives the pruning set): the index is then STREAMED,
          // never exchanged; an oversized batch degrades to the shuffled
          // join over the PRUNED index instead of a broadcast OOM. The
          // flat layout has no measurement pass — the planner decides.
          Novelty.ngramNoveltyAgainst(idx, kept1p.select("doc_id", "text"),
            "doc_id", "text", cfg.n,
            broadcastProbe = bucketed && batchGrams <= cfg.maxBroadcastKeys)
        case None =>
          Novelty.ngramNovelty(kept1p.select("doc_id", "text"),
            "doc_id", "text", cfg.n)
      }).persist() // feeds both the gate and the reject ledger
      cleanups += (() => { scored.unpersist(); () })
      val rejNovelty = scored
        .filter(col("novelty_micros").isNull ||
          col("novelty_micros") < cfg.noveltyMinMicros)
        .select(col("doc_id"), lit("novelty").as("stage"),
          concat(lit("novelty_micros:"),
            coalesce(col("novelty_micros").cast("string"), lit("null")))
            .as("reason"))
      val kept2 = kept1p
        .join(scored.filter(col("novelty_micros") >= cfg.noveltyMinMicros)
          .select("doc_id"), "doc_id")
        .select("doc_id", "lang")

      // probe-I/O telemetry, measured NOW — after the probes, before this
      // batch's state writes land and before compaction retires the very
      // parts the probes read (listing them later would read 0)
      val idxSizes = partPaths.map(pp =>
        partBytes(spark, pp, probedGramBkts.map(_.toSet)))
      val (idxBytes, idxBytesProbed) =
        (idxSizes.map(_._1).sum, idxSizes.map(_._2).sum)
      val sigPartDirs = cfg.corpusDir.toSeq.flatMap { cd =>
        versionsOf(spark, cd, prefix = "part=").filter(_ < id).sorted
          .map(p => if (bucketed) s"$cd/bands=$p" else s"$cd/sigs=$p")
      }
      val sigSizes = sigPartDirs.map(pd =>
        partBytes(spark, pd, probedSigBkts.map(_.toSet)))
      val (sigBytes, sigBytesProbed) =
        (sigSizes.map(_._1).sum, sigSizes.map(_._2).sum)
      val textSizes = cfg.corpusDir.toSeq.flatMap { cd =>
        versionsOf(spark, cd, prefix = "part=").filter(_ < id).sorted
          .map(p => partBytes(spark, s"$cd/part=$p", probedTextBkts.map(_.toSet)))
      }
      val (textBytes, textBytesProbed) =
        (textSizes.map(_._1).sum, textSizes.map(_._2).sum)

      val priorCounters = cfg.countersDir.map { cd =>
        versionsOf(spark, cd).filter(_ < id).sorted.lastOption
          .map(v => spark.read.parquet(s"$cd/v=$v")
            .select("stratum", "split", "n_assigned"))
          .getOrElse {
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              StructType(Seq(StructField("stratum", StringType),
                StructField("split", StringType),
                StructField("n_assigned", LongType))))
          }
      }
      val assignments = priorCounters match {
        case Some(prior) => Selection.splitAssignContinuing(
          kept2, "lang", "doc_id", cfg.splits, prior, seed = s"${cfg.seed}:$id")
        case None => Selection.splitAssign(
          kept2, "lang", "doc_id", cfg.splits, seed = s"${cfg.seed}:$id")
      }
      assignments
        .select(col("id").as("doc_id"), col("stratum"), col("split"),
          col("rank_in_stratum"))
        .write.mode("overwrite").parquet(s"${cfg.outDir}/batch=$id")

      // the DROP LEDGER: every rejected doc with its stage and reason —
      // stages are sequential, so each doc appears at most once, and
      // (survivors ∪ rejects) partition the batch exactly (spec-asserted).
      // Written with the same overwrite-replay contract as the assignments.
      rejBlocklist
        .unionByName(rejNearDup)
        .unionByName(rejInBatch)
        .unionByName(rejNovelty)
        .write.mode("overwrite").parquet(s"${cfg.outDir}/rejects/batch=$id")

      // counters fold from the WRITTEN assignments (the persisted truth),
      // versioned and retired exactly like the drift state
      (cfg.countersDir, priorCounters) match {
        case (Some(cd), Some(prior)) =>
          Selection.splitCounters(
              spark.read.parquet(s"${cfg.outDir}/batch=$id"), prior)
            .write.mode("overwrite").parquet(s"$cd/v=$id")
          retireVersions(spark, cfg, cd, id)
        case _ => ()
      }

      // optional drift monitoring: the batch's surviving docs vs the
      // accumulated reference counts of every PRIOR batch's survivors
      cfg.driftDir.foreach(dd => driftStage(spark, cfg, dd, kept1p, id))

      // accumulate the corpus the near-dup gate probes: this batch's
      // near-dup SURVIVORS — text part (verify joins) AND signature part
      // (the probe's stored index) — each appended as its own part
      // (replay overwrites both)
      if (cfg.nearDupThreshold.isDefined) cfg.corpusDir.foreach { cd =>
        if (bucketed)
          writeBucketed(kept1p.select("doc_id", "text")
              .withColumn("bkt", Dedup.docBucket(col("doc_id"), cfg.stateBuckets)),
            s"$cd/part=$id")
        else kept1p.select("doc_id", "text")
          .write.mode("overwrite").parquet(s"$cd/part=$id")
        val sigs = Dedup.minhashSigFrame(kept1p.select("doc_id", "text"),
          "doc_id", "text", cfg.numHashes)
        if (bucketed)
          writeBucketed(
            Dedup.bandIndexFrame(sigs, cfg.numHashes, cfg.bands, cfg.stateBuckets),
            s"$cd/bands=$id")
        else
          sigs.write.mode("overwrite").parquet(s"$cd/sigs=$id")
      }

      // append the batch's surviving grams as a DELTA part (q88 semantics:
      // ownership within the surviving corpus — post-blocklist and, when
      // the gate is on, post-near-dup) — written AFTER the assignments so
      // a crash between the two replays cleanly; batch-vocabulary-scale,
      // never the merged index
      val delta = Novelty.gramIndex(kept1p.select("doc_id", "text"),
        "doc_id", "text", cfg.n)
      if (bucketed)
        writeBucketed(Novelty.withGramBucket(delta, cfg.stateBuckets),
          s"${cfg.indexDir}/delta=$id")
      else delta.write.mode("overwrite").parquet(s"${cfg.indexDir}/delta=$id")

      // compaction: once enough deltas pend STRICTLY BELOW this batch,
      // fold (base, pending deltas) into base=<newest pending part> and
      // retire the inputs. The horizon stays below id, so a replay of
      // THIS batch reads identical content whether or not the compaction
      // landed; a crash mid-compaction leaves overlapping parts that the
      // min-merge renders harmless and the next compaction sweeps.
      if (deltaVs.size >= cfg.compactEvery) {
        val h = deltaVs.max
        val compacted = Novelty.compactGramIndex(
          readIndexParts().select("gram", "owner"))
        if (bucketed)
          writeBucketed(Novelty.withGramBucket(compacted, cfg.stateBuckets),
            s"${cfg.indexDir}/base=$h")
        else compacted.write.mode("overwrite").parquet(s"${cfg.indexDir}/base=$h")
        if (!cfg.keepAllIndexVersions) {
          deltaVs.foreach(v => delete(spark, s"${cfg.indexDir}/delta=$v"))
          versionsOf(spark, cfg.indexDir, prefix = "base=").filter(_ < h)
            .foreach(v => delete(spark, s"${cfg.indexDir}/base=$v"))
        }
      }

      // per-batch telemetry (LAST — it describes what the batch just did):
      // stage counts from the WRITTEN outputs (the persisted truth, read
      // back at parquet-footer cost) and state sizes from directory
      // listings. `*_buckets_probed` is -1 when the probe was unpruned
      // (flat layout, or no parts yet).
      val stageCounts = spark.read
        .parquet(s"${cfg.outDir}/rejects/batch=$id")
        .groupBy("stage").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
        .withDefaultValue(0L)
      val survivors =
        spark.read.parquet(s"${cfg.outDir}/batch=$id").count()
      Seq((id, b.count(), stageCounts("blocklist"), stageCounts("near_dup"),
          stageCounts("in_batch_near_dup"), stageCounts("novelty"), survivors,
          partPaths.size.toLong, idxBytes, idxBytesProbed,
          probedGramBkts.fold(-1L)(_.size.toLong),
          sigParts.toLong, sigBytes, sigBytesProbed,
          probedSigBkts.fold(-1L)(_.size.toLong),
          textBytes, textBytesProbed,
          probedTextBkts.fold(-1L)(_.size.toLong),
          cfg.stateBuckets.toLong))
        .toDF("batch_id", "batch_docs", "rej_blocklist", "rej_near_dup",
          "rej_in_batch", "rej_novelty", "survivors",
          "index_parts", "index_bytes", "index_bytes_probed",
          "index_buckets_probed",
          "sig_parts", "sig_bytes", "sig_bytes_probed", "sig_buckets_probed",
          "text_bytes", "text_bytes_probed", "text_buckets_probed",
          "state_buckets")
        .write.mode("overwrite").parquet(s"${cfg.outDir}/metrics/batch=$id")
    } finally cleanups.reverse.foreach(f => scala.util.Try(f()))
  }

  /** The drift monitoring stage: compare this batch's surviving docs
    * against the accumulated reference counts, then fold the batch into
    * the state. Statistics: word-count distribution (integer-ECDF KS —
    * the bounded-integer-statistic contract) and language mix
    * (categorical TV). State is DOMAIN-scale (distinct values × 1 row),
    * folded once per batch; the compare runs entirely on counts. */
  private def driftStage(spark: SparkSession, cfg: Config, dd: String,
                         kept: DataFrame, id: Long): Unit = {
    // null-text docs never reach the corpus (the novelty gate's null ratio
    // fails any threshold), so the monitor measures the same stream the
    // pipeline can actually ingest instead of refusing the whole batch
    val wcBatch = kept.filter(col("text").isNotNull)
      .select(size(split(lower(col("text")), " ")).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    val langBatch = kept.select(col("lang").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    def prior(sub: String): Option[DataFrame] =
      versionsOf(spark, s"$dd/$sub").filter(_ < id).sorted.lastOption
        .map(v => spark.read.parquet(s"$dd/$sub/v=$v").select("v", "c"))
    val (wcPrior, langPrior) = (prior("wc"), prior("lang"))

    (wcPrior, langPrior) match {
      case (Some(wp), Some(lp)) =>
        def sides(ref: DataFrame, bat: DataFrame) = ref
          .select(lit("ref").as("g"), col("v"), col("c"))
          .unionByName(bat.select(lit("batch").as("g"), col("v"), col("c")))
        val ks = Drift.ecdfDriftFromCounts(sides(wp, wcBatch), "g", "v", "c")
          .select(lit("wordcount_ks").as("stat"), col("grp_a"), col("grp_b"),
            col("n_a"), col("n_b"), col("d_micros"))
        val tv = Drift.categoricalDriftFromCounts(sides(lp, langBatch), "g", "v", "c")
          .select(lit("lang_tv").as("stat"), col("grp_a"), col("grp_b"),
            col("n_a"), col("n_b"), col("tv_micros").as("d_micros"))
        ks.unionByName(tv)
          .write.mode("overwrite").parquet(s"${cfg.outDir}/drift/batch=$id")
      case _ => () // first batch: no reference yet, state only
    }

    // fold the batch into the reference state (sum counts), versioned and
    // retired on the same strictly-below protocol as the counters
    def fold(sub: String, priorDf: Option[DataFrame], bat: DataFrame): Unit = {
      priorDf.fold(bat)(p => p.unionByName(bat)
          .groupBy("v").agg(sum(col("c")).as("c")))
        .write.mode("overwrite").parquet(s"$dd/$sub/v=$id")
      retireVersions(spark, cfg, s"$dd/$sub", id)
    }
    fold("wc", wcPrior, wcBatch)
    fold("lang", langPrior, langBatch)
  }

  /** Retire `v=` versions below the replay horizon: a restart replays at
    * most batch id+1, which reads v≤id — every version below the PREVIOUS
    * one is dead. */
  private def retireVersions(spark: SparkSession, cfg: Config, dir: String,
                             id: Long): Unit =
    if (!cfg.keepAllIndexVersions) {
      val pv = versionsOf(spark, dir).filter(_ < id).sorted
      pv.dropRight(1).foreach(v => delete(spark, s"$dir/v=$v"))
    }

  /** Start the standing intake: JSON-lines document stream → per-batch
    * blocklist/near-dup/novelty/drift/split with the replay-deterministic
    * state protocol above. `AvailableNow` by default (drain-what-exists,
    * then stop) — use a processing-time trigger for a long-lived tail. */
  def start(spark: SparkSession, cfg: Config): StreamingQuery = {
    var reader = spark.readStream.schema(docSchema)
    cfg.maxFilesPerTrigger.foreach(k =>
      reader = reader.option("maxFilesPerTrigger", k))
    reader.json(cfg.inputDir)
      .writeStream
      .trigger(cfg.trigger)
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (df: DataFrame, id: Long) =>
        processBatch(spark, cfg, df, id)
      }
      .start()
  }
}
