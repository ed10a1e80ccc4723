package graft.app

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.llm.{Novelty, Selection, UrlFilter}

/** Standing corpus-intake pipeline — the q88 capstone (domain blocklist →
  * n-gram novelty → exact stratified split) driven CONTINUOUSLY from a
  * document stream, instead of as a batch job over a finished corpus. This
  * closes the loop between the repo's two halves: the llm curation
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
      noveltyMinMicros: Long = 200000L,
      splits: Seq[(String, Long)] = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L),
      n: Int = 8,
      seed: String = "intake",
      /** Index versions older than the replay horizon (the previous
        * version) are deleted after each batch unless this is set. */
      keepAllIndexVersions: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None)

  private def versionsOf(spark: SparkSession, indexDir: String): Seq[Long] = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).collect { case s if s.startsWith("v=") =>
        s.stripPrefix("v=").toLong }
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
    val b = batch.persist()
    try {
      val bl = cfg.blocklist.toDF("entry")
      val kept1 = UrlFilter
        .domainBlocklist(b, "host", Seq("doc_id"), bl)
        .filter(!col("blocked"))
        .select("doc_id", "lang", "text")
        .persist()
      try {
        // the index this batch scores against: latest version STRICTLY
        // below id (a crashed run may already have written v=id — replay
        // must not read its own output)
        val prevVersion = versionsOf(spark, cfg.indexDir).filter(_ < id)
          .sorted.lastOption
        val prevIndex = prevVersion.map(v =>
          spark.read.parquet(s"${cfg.indexDir}/v=$v").select("gram", "owner"))

        val scored = prevIndex match {
          case Some(idx) =>
            Novelty.ngramNoveltyAgainst(idx, kept1.select("doc_id", "text"),
              "doc_id", "text", cfg.n)
          case None =>
            Novelty.ngramNovelty(kept1.select("doc_id", "text"),
              "doc_id", "text", cfg.n)
        }
        val kept2 = kept1
          .join(scored.filter(col("novelty_micros") >= cfg.noveltyMinMicros)
            .select("doc_id"), "doc_id")
          .select("doc_id", "lang")

        Selection.splitAssign(kept2, "lang", "doc_id", cfg.splits,
            seed = s"${cfg.seed}:$id")
          .select(col("id").as("doc_id"), col("stratum"), col("split"),
            col("rank_in_stratum"))
          .write.mode("overwrite").parquet(s"${cfg.outDir}/batch=$id")

        // fold the batch's SURVIVING-the-blocklist grams into the index
        // (q88 semantics: ownership within the surviving corpus) — written
        // AFTER the assignments so a crash between the two replays cleanly
        val deltaIdx = Novelty.gramIndex(kept1.select("doc_id", "text"),
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
      } finally kept1.unpersist()
    } finally b.unpersist()
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
