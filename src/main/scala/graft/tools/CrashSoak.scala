// Randomized whole-surface crash soak for the standing intake: drive N
// id-ordered micro-batches through the REAL per-batch pipeline, killing
// each batch at a SEEDED-RANDOM state-mutation seam (via
// graft.app.CrashHooks — the boundary right after each write/fold/retire
// action, exactly where a real kill between driver actions lands), then
// replaying it the way foreachBatch would; diff every batch's final
// assignments + reject ledger against an uncrashed control run. The
// per-seam crash contracts (gram retire vs family fold, mid vs base fold,
// marker writes) are each spec-pinned at their chosen boundary; this soak
// turns those per-seam proofs into a whole-surface one.
//
// Usage: sbt "runMain graft.tools.CrashSoak [batches] [seed] [twoTier]"
//   defaults: 50 batches, seed 19, twoTier=false. Exit 0 + "SOAK PASS"
//   on a clean diff; throws on the first divergent batch.
//
// The config exercises every stage: blocklist, cross-batch near-dup gate
// (bucketed band index), in-batch CC, novelty, continuing splits, drift
// monitoring, compactEvery=2 (folds land throughout the run; with twoTier
// both tiers fold). Every ~5th batch plants an exact copy of an earlier
// doc so cross-batch matches keep firing through folded state.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession
import graft.app.{CrashHooks, Intake}

object CrashSoak {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(50)
    val seed = args.lift(1).map(_.toLong).getOrElse(19L)
    val twoTier = args.lift(2).exists(_.toBoolean)
    val spark = GraftSession.get()
    val (crashed, seams) = run(spark, nBatches, seed, twoTier)
    println(s"SOAK PASS: $nBatches batches, $crashed crashed+replayed " +
      s"(seams hit: ${seams.groupBy(identity).view.mapValues(_.size).toMap}), " +
      s"outputs identical to the uncrashed control")
    spark.stop()
  }

  /** Shared with the spec variant. Returns (crashed batch count, seam
    * names hit). Throws on any output divergence. */
  def run(spark: SparkSession, nBatches: Int, seed: Long,
          twoTier: Boolean): (Int, Seq[String]) = {
    import spark.implicits._
    def mkCfg(): Intake.Config = {
      def tmp() = java.nio.file.Files.createTempDirectory("graft_soak").toString
      Intake.Config(
        inputDir = tmp(), checkpointDir = tmp(),
        indexDir = tmp(), outDir = tmp(),
        blocklist = Seq("bad.com"),
        nearDupThreshold = Some(0.5), corpusDir = Some(tmp()),
        inBatchNearDup = true, countersDir = Some(tmp()),
        driftDir = Some(tmp()), noveltyMinMicros = 100000L,
        n = 3, seed = "soak", compactEvery = 2, stateBuckets = 8,
        twoTierCorpus = twoTier)
    }
    // disjoint per-doc vocabulary so only planted copies near-match; every
    // 5th batch plants a copy of a doc from ~4 batches earlier (probing
    // whatever fold state that batch's horizon left), plus one in-batch
    // pair; ids ≡ 0 (mod 7) land on the blocklist
    def text(i: Long) = (0 to 9).map(j => s"s${i}w$j").mkString(" ")
    def batch(b: Long): DataFrame = {
      val ids = (1L to 4L).map(k => (b - 1) * 4 + k)
      val src: Long => Long = i =>
        if (b % 5 == 0 && i == ids.head && b > 4) (b - 4) * 4 - 2
        else if (b % 5 == 0 && i == ids.last) ids.head
        else i
      ids.map(i => (i, if (i % 2 == 0) "en" else "de", text(src(i)),
          if (i % 7 == 0) s"x$i.bad.com" else s"x$i.ok.org"))
        .toDF("doc_id", "lang", "text", "host")
    }
    def outcome(cfg: Intake.Config, b: Long): Seq[(Long, String, String)] = {
      def rd(dir: String, cols: Int) = {
        val p = java.nio.file.Paths.get(dir)
        if (!java.nio.file.Files.exists(p)) Seq.empty
        else spark.read.parquet(dir).collect().toSeq
          .map(r => (r.getLong(0), r.getString(1),
            (2 until cols).map(r.get(_).toString).mkString(":")))
      }
      (rd(s"${cfg.outDir}/batch=$b", 4) ++
        rd(s"${cfg.outDir}/rejects/batch=$b", 3)).sortBy(_._1)
    }

    val control = mkCfg()
    (1L to nBatches.toLong).foreach(b =>
      Intake.processBatch(spark, control, batch(b), b))

    val soak = mkCfg()
    val rnd = new scala.util.Random(seed)
    var crashed = 0
    val seams = scala.collection.mutable.ArrayBuffer[String]()
    (1L to nBatches.toLong).foreach { b =>
      // a k beyond the batch's seam count means the batch runs clean —
      // then the second processBatch is a replay-after-success, the
      // at-least-once redelivery shape foreachBatch permits
      CrashHooks.arm(rnd.nextInt(18))
      val hit =
        try { Intake.processBatch(spark, soak, batch(b), b); None }
        catch { case c: CrashHooks.InjectedCrash => Some(c.seamName) }
      CrashHooks.disarm()
      hit.foreach { s => crashed += 1; seams += s }
      Intake.processBatch(spark, soak, batch(b), b)
      val (want, got) = (outcome(control, b), outcome(soak, b))
      require(want == got,
        s"batch $b diverged after crash at ${hit.getOrElse("<none>")}:\n" +
          s"  control: $want\n  soak:    $got")
    }
    require(crashed > 0, "soak never crashed — seed/arm range too narrow")
    (crashed, seams.toSeq)
  }
}
