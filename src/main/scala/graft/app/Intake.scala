package graft.app

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.llm.{Dedup, Novelty, Selection, UrlFilter}

/** Standing corpus-intake pipeline — the q88 capstone (domain blocklist →
  * n-gram novelty → exact stratified split) driven CONTINUOUSLY from a
  * document stream, instead of as a batch job over a finished corpus, with
  * an optional PAIRWISE near-dup gate (the q59 incremental-MinHash probe
  * against the accumulated corpus) between the blocklist and novelty
  * stages — blocklist kills bad sources, near-dup kills single-document
  * copies, novelty kills diffuse redundancy, split routes what survives.
  * This closes the loop between the repo's two halves: the llm curation
  * operators and the streaming engine tier.
  *
  * Spark-first shape: the novelty stage is stateful ACROSS batches (each
  * batch scores against everything already ingested), but its state is a
  * vocabulary-scale gram-owner TABLE, not per-key stream state — so the
  * pipeline runs as `foreachBatch` over a versioned parquet index
  * ([[Novelty.gramIndex]] / [[Novelty.mergeGramIndex]] /
  * [[Novelty.ngramNoveltyAgainst]]), the same pattern the incremental
  * MinHash tier uses (q59), not as a `flatMapGroupsWithState` (gram state
  * is not keyed by a stream key, and the index must be joinable at
  * corpus-scale — a parquet side input is exactly that).
  *
  * Restart determinism (spec-verified across a kill/resume): batch `i`
  * always scores against the index version written by batch `i-1` (the
  * LATEST version STRICTLY BELOW `i`), writes its outputs with per-batch
  * overwrite, and only then writes index version `i` — so a replayed batch
  * reads the same index, recomputes byte-identical assignments, and
  * re-overwrites the same paths. The novelty probe itself is also
  * replay-idempotent even if version `i` already landed (a doc's own id in
  * the owner min changes nothing — see [[Novelty.ngramNoveltyAgainst]]).
  *
  * Exactness contract, inherited from the novelty operator: when doc ids
  * arrive in non-decreasing order across batches (ids are ingest sequence
  * numbers — the append-only intake shape), the novelty scores equal the
  * batch statistic over the concatenated corpus exactly. Split quotas are
  * exact PER BATCH (each batch is apportioned by largest remainder within
  * its strata); a null stratum refuses loudly ([[Selection.splitAssign]]).
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
      /** Versioned gram-owner index root: batch i writes `v=i`. */
      indexDir: String,
      /** Assignment output root: batch i overwrites `batch=i`. */
      outDir: String,
      blocklist: Seq[String],
      /** Optional PAIRWISE near-dup gate between the blocklist and the
        * novelty stages (the q59 incremental-MinHash probe): batch docs
        * whose shingle Jaccard against any ACCUMULATED corpus doc reaches
        * the threshold are dropped before novelty scoring. Requires
        * `corpusDir`. Cross-side only — within-batch near-dups are the
        * novelty stage's job (exact dups score 0) or a separate in-batch
        * pass; the accumulated corpus grows by each batch's near-dup
        * SURVIVORS (`corpusDir/part=<batch>`, append-only, replay
        * overwrites its own part). */
      nearDupThreshold: Option[Double] = None,
      corpusDir: Option[String] = None,
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
      n: Int = 8,
      seed: String = "intake",
      /** Index versions older than the replay horizon (the previous
        * version) are deleted after each batch unless this is set. */
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

  /** One micro-batch of the intake pipeline: blocklist → incremental
    * novelty against the pre-batch index → per-batch exact split →
    * overwrite `outDir/batch=<id>` and `indexDir/v=<id>`. Deterministic
    * function of (batch contents, id, on-disk index versions < id) — the
    * replay contract above. Package-visible so the spec can drive a
    * replayed batch directly. */
  private[app] def processBatch(spark: SparkSession, cfg: Config,
                                batch: DataFrame, id: Long): Unit = {
    import spark.implicits._
    require(cfg.nearDupThreshold.isEmpty || cfg.corpusDir.nonEmpty,
      "Intake: nearDupThreshold requires corpusDir (the accumulated corpus " +
        "the near-dup probe compares against)")
    val cleanups = scala.collection.mutable.ArrayBuffer[() => Unit]()
    val b = batch.persist()
    cleanups += (() => { b.unpersist(); () })
    try {
      val bl = cfg.blocklist.toDF("entry")
      val blocklisted = UrlFilter
        .domainBlocklist(b, "host", Seq("doc_id"), bl)
        .filter(!col("blocked"))
        .select("doc_id", "lang", "text")

      // optional q59-shape near-dup gate: probe against corpus parts < id
      // (part=id excluded — a crashed run may have written it; replay must
      // not compare the batch against itself)
      val kept1 = (cfg.nearDupThreshold, cfg.corpusDir) match {
        case (Some(t), Some(cd)) =>
          val parts = versionsOf(spark, cd, prefix = "part=").filter(_ < id).sorted
          if (parts.isEmpty) blocklisted
          else {
            val corpus = spark.read
              .parquet(parts.map(p => s"$cd/part=$p"): _*)
              .select(col("doc_id"), col("text"))
            val (dups, release) = Dedup.incrementalNearDupManaged(
              corpus, blocklisted.select("doc_id", "text"), "doc_id", "text",
              cfg.numHashes, cfg.bands, t)
            cleanups += release
            blocklisted.join(
              dups.select(col("batch_id").as("doc_id")).distinct(),
              Seq("doc_id"), "left_anti")
          }
        case _ => blocklisted
      }
      val kept1p = kept1.persist()
      cleanups += (() => { kept1p.unpersist(); () })

      // the index this batch scores against: latest version STRICTLY
      // below id (a crashed run may already have written v=id — replay
      // must not read its own output)
      val prevVersion = versionsOf(spark, cfg.indexDir).filter(_ < id)
        .sorted.lastOption
      val prevIndex = prevVersion.map(v =>
        spark.read.parquet(s"${cfg.indexDir}/v=$v").select("gram", "owner"))

      val scored = prevIndex match {
        case Some(idx) =>
          Novelty.ngramNoveltyAgainst(idx, kept1p.select("doc_id", "text"),
            "doc_id", "text", cfg.n)
        case None =>
          Novelty.ngramNovelty(kept1p.select("doc_id", "text"),
            "doc_id", "text", cfg.n)
      }
      val kept2 = kept1p
        .join(scored.filter(col("novelty_micros") >= cfg.noveltyMinMicros)
          .select("doc_id"), "doc_id")
        .select("doc_id", "lang")

      val priorCounters = cfg.countersDir.map { cd =>
        versionsOf(spark, cd).filter(_ < id).sorted.lastOption
          .map(v => spark.read.parquet(s"$cd/v=$v")
            .select("stratum", "split", "n_assigned"))
          .getOrElse {
            import org.apache.spark.sql.types._
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

      // counters fold from the WRITTEN assignments (the persisted truth),
      // versioned and retired exactly like the gram index
      (cfg.countersDir, priorCounters) match {
        case (Some(cd), Some(prior)) =>
          Selection.splitCounters(
              spark.read.parquet(s"${cfg.outDir}/batch=$id"), prior)
            .write.mode("overwrite").parquet(s"$cd/v=$id")
          if (!cfg.keepAllIndexVersions) {
            val pv = versionsOf(spark, cd).filter(_ < id).sorted
            val p = new Path(cd)
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            pv.dropRight(1).foreach(v => fs.delete(new Path(s"$cd/v=$v"), true))
          }
        case _ => ()
      }

      // accumulate the corpus the near-dup gate probes: this batch's
      // near-dup SURVIVORS, appended as their own part (replay overwrites)
      if (cfg.nearDupThreshold.isDefined) cfg.corpusDir.foreach { cd =>
        kept1p.select("doc_id", "text")
          .write.mode("overwrite").parquet(s"$cd/part=$id")
      }

      // fold the batch's surviving grams into the index (q88 semantics:
      // ownership within the surviving corpus — post-blocklist and, when
      // the gate is on, post-near-dup) — written AFTER the assignments so
      // a crash between the two replays cleanly
      val deltaIdx = Novelty.gramIndex(kept1p.select("doc_id", "text"),
        "doc_id", "text", cfg.n)
      val nextIdx = prevIndex.fold(deltaIdx)(Novelty.mergeGramIndex(_, deltaIdx))
      nextIdx.write.mode("overwrite").parquet(s"${cfg.indexDir}/v=$id")

      if (!cfg.keepAllIndexVersions) {
        // replay horizon: a restart replays at most batch id+1, which
        // reads v=id — every version below the PREVIOUS one is dead
        val p = new Path(cfg.indexDir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        versionsOf(spark, cfg.indexDir)
          .filter(v => v < id && prevVersion.forall(v < _))
          .foreach(v => fs.delete(new Path(s"${cfg.indexDir}/v=$v"), true))
      }
    } finally cleanups.reverse.foreach(f => scala.util.Try(f()))
  }

  /** Start the standing intake: JSON-lines document stream → per-batch
    * blocklist/novelty/split with the replay-deterministic index protocol
    * above. `AvailableNow` by default (drain-what-exists, then stop) — use
    * a processing-time trigger for a long-lived tail. */
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
