// Standing-intake scale probe (VERDICT r14 #2/#3/#7): drive the REAL
// graft.app.Intake streaming surface over K sequential batches of the
// derived 10× documents set (graft.tools.Scale10Gen output) with every
// stage on — blocklist, stored-signature near-dup gate, log-structured
// incremental novelty, drift monitoring, CONTINUING split — and record:
//
//  - per-batch wall-clock (the StreamingQueryProgress triggerExecution
//    time): the log-structured index + persisted signature protocol's
//    claim is that this stays ~FLAT while the accumulated corpus grows
//    K× over the run (the old full-rewrite/text-recompute protocol grew
//    per-batch cost linearly in everything ingested);
//  - the cumulative per-split deviation |assigned − cumulative Hamilton
//    quota| after every batch (the continuing-split boundedness claim at
//    10× volume).
//
// Usage: sbt "runMain graft.tools.IntakeScale /tmp/graft_sf1.0 /tmp/graft_intake_scale 10"
// (first generate the 10× set: sbt "runMain graft.tools.Scale10Gen")
// Optional args 4-6: stateBuckets (64), tailBatches (1), tailDocs (200) —
// tailBatches=50 turns the run into the STEADY-STATE shape (bulk corpus
// ingested first, then many narrow micro-batches): the regime where
// per-batch part growth would bite first, and the acceptance series for
// the state-family compaction (part counts must stay O(compactEvery) and
// the tail per-batch seconds flat).
package graft.tools

import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.GraftSession
import graft.app.Intake

object IntakeScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_sf1.0")
    val work = args.lift(1).getOrElse("/tmp/graft_intake_scale")
    val batches = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.get()
    import spark.implicits._

    val fs = new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(work), true)
    Files.createDirectories(Paths.get(s"$work/in"))

    // arg 8: rebucketTo (0 = off) — when set, the run becomes the
    // MID-HORIZON MIGRATION series: bulk batches ingest at `stateBuckets`,
    // the stream stops, `Intake.rebucket` migrates every bucketed family
    // to `rebucketTo`, and the tail batches resume (same checkpoint)
    // under the migrated layout — per-batch cost before/after shows the
    // pruning math tracking the bucket count live.
    // arg 9: semantic (boolean) — attach each doc's embedding (vec_id =
    // doc_id; the derived sets carry matching offset replicas for the
    // first 2000 base ids, the rest ride null) and turn the semantic gate
    // on, so its probe/state cost is measured at scale. The derived
    // replicas' vectors are mutually sub-tau by construction, so the gate
    // rejects nothing — the series measures the gate's COST posture
    // without perturbing the corpus the other probes accumulate.
    val rebucketTo = args.lift(8).map(_.toInt).getOrElse(0)
    val semantic = args.lift(9).exists(_.toBoolean)

    // K id-ordered slices (the intake's append-only contract), one JSON
    // file per batch written SEQUENTIALLY so the file stream's
    // timestamp-ordered listing replays them in id order
    val docs0 = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"),
        concat(col("source"), lit(".example.org")).as("host"))
    val docs = (if (!semantic) docs0
      else docs0.join(
        spark.read.parquet(s"$src/embeddings.parquet")
          .select(col("vec_id"), col("embedding").as("emb")),
        col("doc_id") === col("vec_id"), "left").drop("vec_id"))
      .persist()
    val total = docs.count()
    // `batches` bulk slices plus `tailBatches` NARROW tail micro-batches
    // (the steady-state streaming shape): the tail's probe fractions show
    // how hard the bucket layout prunes when the batch's key coverage is
    // small, and a long tail (tailBatches=50) certifies per-batch flatness
    // against part growth across many compaction cycles
    val tailBatches = args.lift(4).map(_.toInt).getOrElse(1)
    val tailDocs = args.lift(5).map(_.toLong).getOrElse(200L)
    val bulk = math.max(1L, total - tailBatches * tailDocs)
    // exactly batches-1 interior cut positions at i·bulk/batches plus the
    // bulk end — every bulk slice is within one doc of bulk/batches (a
    // modulus-derived mark list truncated to batches-1 folds the rounding
    // surplus into the last slice and skews the flatness series)
    val targets = (((1 until batches).map(i => i.toLong * bulk / batches)
      :+ bulk) ++ (1 to tailBatches).map(j => bulk + j * tailDocs))
      .filter(_ <= total).distinct.toSet
    val bounds = docs.select(col("doc_id")).orderBy("doc_id")
      .rdd.zipWithIndex()
      .filter { case (_, i) => targets(i + 1) }
      .map(_._1.getLong(0)).collect().toSeq.sorted
    val cuts = (Seq(Long.MinValue) ++ bounds :+ Long.MaxValue).sliding(2).toSeq
    val jsonCols = Seq(col("doc_id"), col("lang"), col("text"), col("host")) ++
      (if (semantic) Seq(col("emb")) else Nil)
    def writeSlices(slices: Seq[(Seq[Long], Int)]): Unit = {
      slices.foreach { case (Seq(lo, hi), i) =>
        docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
          .select(to_json(struct(jsonCols: _*)))
          .coalesce(1).write.mode("overwrite").text(s"$work/stage/b$i")
        // one flat file per batch, strictly increasing mtimes
        val part = fs.globStatus(new Path(s"$work/stage/b$i/part-*")).head.getPath
        fs.rename(part, new Path(f"$work/in/b$i%03d.json"))
        Thread.sleep(5)
      }
      fs.delete(new Path(s"$work/stage"), true)
    }
    val allSlices = cuts.zipWithIndex
    // with a mid-horizon rebucket, only the BULK files exist when phase 1
    // starts (AvailableNow drains what it sees); the tail files land after
    // the migration and phase 2 resumes from the same checkpoint
    if (rebucketTo > 0) writeSlices(allSlices.take(batches))
    else writeSlices(allSlices)

    val cfg = Intake.Config(
      inputDir = s"$work/in", checkpointDir = s"$work/cp",
      indexDir = s"$work/idx", outDir = s"$work/out",
      blocklist = Seq("blocked.invalid"),
      nearDupThreshold = Some(0.5), corpusDir = Some(s"$work/corpus"),
      // keep every doc (noveltyMinMicros=0) so the accumulated corpus —
      // what the near-dup/novelty probes run against — grows linearly
      // with batch count: the stress the flatness claim is about
      noveltyMinMicros = 0L,
      countersDir = Some(s"$work/ctr"),
      driftDir = Some(s"$work/drift"),
      // args 6/7: compactEvery (default 4) and twoTierCorpus (default off) —
      // the long-horizon acceptance shape for the two-tier text fold is
      // many tail batches at a small compactEvery (>= 3 base folds)
      compactEvery = args.lift(6).map(_.toInt).getOrElse(4),
      twoTierCorpus = args.lift(7).exists(_.toBoolean),
      // bucket-partitioned state: probes read only the buckets the batch
      // touches; the metrics tail below prints probed vs total bytes
      stateBuckets = args.lift(3).map(_.toInt).getOrElse(64),
      semanticThreshold = if (semantic) Some(0.9) else None,
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = Some(1))

    val durations = ArrayBuffer[(Long, Double)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val d = e.progress.durationMs.getOrDefault("triggerExecution", -1L)
        if (e.progress.numInputRows > 0)
          durations.synchronized { durations += ((e.progress.batchId, d / 1000.0)) }
      }
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    val q = Intake.start(spark, cfg)
    q.awaitTermination()
    var rebucketSec = 0.0
    if (rebucketTo > 0) {
      // the mid-horizon migration: offline while the stream is stopped,
      // then the tail resumes from the SAME checkpoint under the migrated
      // layout — exactly the operational sequence a growing corpus runs
      val r0 = System.nanoTime()
      Intake.rebucket(spark, cfg, rebucketTo, foldPending = true)
      rebucketSec = (System.nanoTime() - r0) / 1e9
      writeSlices(allSlices.drop(batches))
      val q2 = Intake.start(spark, cfg.copy(stateBuckets = rebucketTo))
      q2.awaitTermination()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // listener events are async; let the bus drain
    spark.streams.removeListener(listener)

    val perBatch = durations.synchronized { durations.sortBy(_._1).toSeq }
    // continuing-split deviation: final counters vs the cumulative
    // Hamilton quota of the observed totals — (strata × splits) rows
    val lastV = fs.listStatus(new Path(s"$work/ctr")).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).max
    val ctr = spark.read.parquet(s"$work/ctr/v=$lastV")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val splits = cfg.splits
    val w = splits.map(_._2).sum
    // Hamilton apportionment re-implemented DRIVER-SIDE on purpose: this
    // is the deviation ORACLE for the operator under test, so it must not
    // call Selection.splitAssign — do not "deduplicate" it into the
    // library (the same independence rule every spec oracle follows).
    val devs = ctr.keys.map(_._1).toSeq.distinct.flatMap { s =>
      val n = splits.map { case (nm, _) => ctr.getOrElse((s, nm), 0L) }.sum
      val base = splits.map { case (nm, wt) => nm -> (n * wt / w) }
      var left = n - base.map(_._2).sum
      val order = splits.zipWithIndex
        .sortBy { case ((_, wt), i) => (-(n * wt % w), i) }.map(_._1._1)
      val bonus = order.takeWhile { _ => left -= 1; left >= 0 }.toSet
      base.map { case (nm, q0) =>
        math.abs(ctr.getOrElse((s, nm), 0L) - (q0 + (if (bonus(nm)) 1L else 0L))) }
    }
    // probe-I/O telemetry from the per-batch metrics rows: with the
    // bucketed layout, probed bytes should grow with the BATCH's key
    // coverage, not with the standing index — sub-linear in index size
    val metricRows = fs.listStatus(new Path(s"$work/out/metrics"))
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).sorted
      .map(bId => spark.read.parquet(s"$work/out/metrics/batch=$bId")
        .collect().head)
    def probeLine(totalCol: String, probedCol: String): String =
      metricRows.map { r =>
        val t = r.getLong(r.fieldIndex(totalCol))
        val p = r.getLong(r.fieldIndex(probedCol))
        if (t == 0) "1.00" else f"${p.toDouble / t}%.2f"
      }.mkString(",")
    val idxTotals = metricRows
      .map(r => r.getLong(r.fieldIndex("index_bytes"))).mkString(",")
    // state-part counts per batch: with every family compacting, these
    // must stay bounded at base + <= compactEvery pending deltas instead
    // of growing one per batch — the O(batches) listing/planning term the
    // log-structured fold removes, made visible in the evidence line
    def partSeries(colName: String): String =
      metricRows.map(r => r.getLong(r.fieldIndex(colName))).mkString(",")
    val firstHalf = perBatch.take(perBatch.size / 2).map(_._2)
    val lastHalf = perBatch.drop(perBatch.size / 2).map(_._2)
    val line =
      s"""{"metric":"intake_scale","total_docs":$total,"batches":${perBatch.size},""" +
        s""""per_batch_sec":[${perBatch.map(p => f"${p._2}%.2f").mkString(",")}],""" +
        f""""first_half_mean":${firstHalf.sum / math.max(1, firstHalf.size)}%.2f,""" +
        f""""last_half_mean":${lastHalf.sum / math.max(1, lastHalf.size)}%.2f,""" +
        f""""last_over_first":${(lastHalf.sum / math.max(1, lastHalf.size)) /
          math.max(0.001, firstHalf.sum / math.max(1, firstHalf.size))}%.2f,""" +
        s""""max_split_dev":${if (devs.isEmpty) 0L else devs.max},""" +
        s""""state_buckets":${cfg.stateBuckets},""" +
        s""""tail_docs":$tailDocs,""" +
        s""""index_bytes_per_batch":[$idxTotals],""" +
        s""""index_parts_per_batch":[${partSeries("index_parts")}],""" +
        s""""sig_parts_per_batch":[${partSeries("sig_parts")}],""" +
        s""""text_parts_per_batch":[${partSeries("text_parts")}],""" +
        s""""index_probe_frac":[${probeLine("index_bytes", "index_bytes_probed")}],""" +
        s""""sig_probe_frac":[${probeLine("sig_bytes", "sig_bytes_probed")}],""" +
        s""""text_probe_frac":[${probeLine("text_bytes", "text_bytes_probed")}],""" +
        (if (semantic)
          s""""esig_probe_frac":[${probeLine("esig_bytes", "esig_bytes_probed")}],""" +
            s""""esig_parts_per_batch":[${partSeries("esig_parts")}],"""
         else "") +
        (if (rebucketTo > 0)
          s""""rebucket_to":$rebucketTo,""" + f""""rebucket_sec":$rebucketSec%.1f,"""
         else "") +
        f""""wall_sec":$wall%.1f}"""
    println(line)
    spark.stop()
  }
}
