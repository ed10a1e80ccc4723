// Per-job profile of one standing-intake micro-batch: build state with a
// few bulk batches, then process one narrow tail batch under a
// SparkListener that records every job's wall time and call site — the
// breakdown of the FIXED per-batch cost that bounds steady-state intake
// latency (IntakeScale measures the total; this names the parts).
//
// Usage: sbt "runMain graft.tools.BatchProfile [src] [buckets] [twoTier] [aqe]"
//
// The 4th arg (default true) toggles spark.sql.adaptive.enabled for the
// PROFILED tail batch only (state build always runs with the session
// default): the r18 profile attributed ~80% of the fixed per-batch floor
// to AQE stage-materialization sub-jobs (~65 ms of scheduling each), so
// the off-reading bounds how much of the floor is AQE scheduling rather
// than work.
package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.app.Intake

object BatchProfile {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_sf1.0")
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val twoTier = args.lift(2).exists(_.toBoolean)
    val aqe = args.lift(3).forall(_.toBoolean)
    val spark = GraftSession.get()

    val root = java.nio.file.Files.createTempDirectory("graft_profile_")
    val cfg = Intake.Config(
      inputDir = s"$root/in", checkpointDir = s"$root/cp",
      indexDir = s"$root/idx", outDir = s"$root/out",
      blocklist = Seq("blocked.invalid"),
      nearDupThreshold = Some(0.5), corpusDir = Some(s"$root/corpus"),
      noveltyMinMicros = 0L, countersDir = Some(s"$root/ctr"),
      driftDir = Some(s"$root/drift"), compactEvery = 4,
      stateBuckets = buckets, twoTierCorpus = twoTier)

    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"),
        concat(col("source"), lit(".example.org")).as("host"))
      .persist()
    def slice(lo: Long, hi: Long) =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)

    // bulk state: 5 batches of ~2000 docs, then two 200-doc tail batches
    // untimed (warm the state shape past the first compaction fold)
    val ids = docs.agg(max("doc_id")).head().getLong(0)
    val step = math.max(1L, (ids - 400) / 5)
    (0 until 5).foreach { i =>
      Intake.replay(spark, cfg,
        Seq((i + 1).toLong -> slice(i * step, (i + 1) * step)))
    }
    Intake.replay(spark, cfg, Seq(6L -> slice(5 * step, 5 * step + 200)))

    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.synchronized {
          val site = e.stageInfos.lastOption.map(_.name)
            .getOrElse("?").takeWhile(_ != '\n').take(90)
          starts(e.jobId) = (e.time, site)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(e.jobId).foreach { case (t0, site) =>
            rows += (((e.time - t0) / 1000.0, site))
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    val t0 = System.nanoTime()
    Intake.replay(spark, cfg, Seq(7L -> slice(5 * step + 200, 5 * step + 400)))
    val wall = (System.nanoTime() - t0) / 1e9
    spark.conf.set("spark.sql.adaptive.enabled", true)
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(1000)

    val jobs = rows.toSeq
    println(f"[profile] aqe=$aqe tail batch wall=$wall%.2f s, jobs=${jobs.size}, " +
      f"job-sum=${jobs.map(_._1).sum}%.2f s (gap=driver-only time)")
    jobs.sortBy(-_._1).take(25).foreach { case (s, site) =>
      println(f"[profile]  $s%6.3f s  $site")
    }
    val bySite = jobs.groupBy(_._2).map { case (k, v) =>
      (v.map(_._1).sum, v.size, k) }.toSeq.sortBy(-_._1)
    println("[profile] by call site:")
    bySite.take(20).foreach { case (s, n, site) =>
      println(f"[profile]  $s%6.3f s  x$n%-3d $site")
    }
    spark.stop()
  }
}
