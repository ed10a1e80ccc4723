// Randomized whole-surface crash soak for the standing intake: drive N
// id-ordered micro-batches through the REAL per-batch pipeline, killing
// each batch at a SEEDED-RANDOM state-mutation seam (via
// graft.app.CrashHooks — the boundary right after each write/fold/retire
// action, exactly where a real kill between driver actions lands), then
// replaying it the way foreachBatch would; diff every batch's final
// assignments + reject ledger + drift report + drift/counter state heads
// against an uncrashed control run. The per-seam crash contracts (gram
// retire vs family fold, mid vs base fold, marker writes) are each
// spec-pinned at their chosen boundary; this soak turns those per-seam
// proofs into a whole-surface one.
//
// The arm bound is MEASURED, not hard-coded: the control run counts the
// seams each batch actually crosses (CrashHooks counting mode), and the
// soak arms within max+2 — a seam added later widens the measured bound
// automatically instead of silently skewing the clean-run probability.
//
// Usage: sbt "runMain graft.tools.CrashSoak [batches] [seed] [twoTier]"
//   defaults: 50 batches, seed 19, twoTier=false. Exit 0 + "SOAK PASS"
//   on a clean diff; throws on the first divergent batch.
//   sbt "runMain graft.tools.CrashSoak rebucket [seed]" runs the
//   MIGRATION soak instead: batches at 8 buckets, then Intake.rebucket to
//   16 killed at EVERY seam in sequence (arm k = 0, 1, 2, … until a run
//   completes) with a re-run after each kill, then more batches at 16 —
//   outputs diffed batch-for-batch against an unmigrated 8-bucket control.
//
// The config exercises every stage: blocklist, cross-batch near-dup gate
// (bucketed band index), semantic (embedding) gate, in-batch CC, novelty,
// continuing splits, drift monitoring, compactEvery=2 (folds land
// throughout the run; with twoTier both tiers fold). Every ~5th batch
// plants an exact copy of an earlier doc so cross-batch lexical matches
// keep firing through folded state; every ~7th batch plants an earlier
// doc's EMBEDDING under fresh text so the semantic gate fires too.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftSession
import graft.app.{CrashHooks, Intake}

object CrashSoak {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    if (args.headOption.contains("rebucket")) {
      val seed = args.lift(1).map(_.toLong).getOrElse(19L)
      val kills = rebucketSoak(spark, seed)
      println(s"REBUCKET SOAK PASS: migration killed at $kills seams " +
        "(every boundary walked), post-migration batches identical to the " +
        "unmigrated control")
    } else {
      val nBatches = args.headOption.map(_.toInt).getOrElse(50)
      val seed = args.lift(1).map(_.toLong).getOrElse(19L)
      val twoTier = args.lift(2).exists(_.toBoolean)
      val (crashed, seams) = run(spark, nBatches, seed, twoTier)
      println(s"SOAK PASS: $nBatches batches, $crashed crashed+replayed " +
        s"(seams hit: ${seams.groupBy(identity).view.mapValues(_.size).toMap}), " +
        s"outputs identical to the uncrashed control")
    }
    spark.stop()
  }

  private def mkCfg(twoTier: Boolean, buckets: Int = 8): Intake.Config = {
    def tmp() = java.nio.file.Files.createTempDirectory("graft_soak").toString
    Intake.Config(
      inputDir = tmp(), checkpointDir = tmp(),
      indexDir = tmp(), outDir = tmp(),
      blocklist = Seq("bad.com"),
      nearDupThreshold = Some(0.5), corpusDir = Some(tmp()),
      inBatchNearDup = true, countersDir = Some(tmp()),
      driftDir = Some(tmp()), noveltyMinMicros = 100000L,
      semanticThreshold = Some(0.9),
      n = 3, seed = "soak", compactEvery = 2, stateBuckets = buckets,
      twoTierCorpus = twoTier)
  }

  // disjoint per-doc vocabulary so only planted copies near-match; every
  // 5th batch plants a copy of a doc from ~4 batches earlier (probing
  // whatever fold state that batch's horizon left), plus one in-batch
  // pair; every 7th batch plants an earlier doc's EMBEDDING under fresh
  // text (the semantic gate's cross-batch hit); ids ≡ 0 (mod 7) land on
  // the blocklist. Embeddings are a deterministic function of the SOURCE
  // id, so a planted copy carries its original's vector exactly.
  private def batchOf(spark: SparkSession, b: Long): DataFrame = {
    import spark.implicits._
    def text(i: Long) = (0 to 9).map(j => s"s${i}w$j").mkString(" ")
    // ±1 hypercube corners (32 dims, murmur3-fmix bits): distinct docs sit
    // near cosine 0 (measured worst |cos| 0.75 over ids 1..299), so at
    // tau=0.9 ONLY planted exact-copy vectors match — accidental hits
    // would mask the later stages' soak coverage
    def emb(i: Long): Seq[Float] = (0 until 32).map { j =>
      var v = i * 2654435761L + j * 40503L
      v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
      v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
      v ^= v >>> 33
      if ((v & 1L) == 0L) 1f else -1f
    }
    val ids = (1L to 4L).map(k => (b - 1) * 4 + k)
    val src: Long => Long = i =>
      if (b % 5 == 0 && i == ids.head && b > 4) (b - 4) * 4 - 2
      else if (b % 5 == 0 && i == ids.last) ids.head
      else i
    // the semantic plant: fresh text (no lexical match) over the embedding
    // of a doc ~3 batches back — only the embedding gate can catch it
    val embSrc: Long => Long = i =>
      if (b % 7 == 0 && i == ids(1) && b > 3) (b - 3) * 4 - 1 else src(i)
    ids.map(i => (i, if (i % 2 == 0) "en" else "de", text(src(i)),
        if (i % 7 == 0) s"x$i.bad.com" else s"x$i.ok.org", emb(embSrc(i))))
      .toDF("doc_id", "lang", "text", "host", "emb")
  }

  /** Every durable per-batch output the pipeline writes, flattened to
    * sorted tagged lines: assignments, reject ledger, drift report, and
    * the drift-count/counter state HEAD versions — so a crash+replay that
    * corrupts any state family the batch mutated diverges here, not only
    * via later batches' probe results. */
  private def outcome(spark: SparkSession, cfg: Intake.Config,
                      b: Long): Seq[String] = {
    def rows(tag: String, dir: String): Seq[String] = {
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(p)) Seq.empty
      else spark.read.parquet(dir).collect().toSeq
        .map(r => tag + ":" + r.toSeq.map(String.valueOf).mkString(":"))
        .sorted
    }
    rows("a", s"${cfg.outDir}/batch=$b") ++
      rows("r", s"${cfg.outDir}/rejects/batch=$b") ++
      rows("d", s"${cfg.outDir}/drift/batch=$b") ++
      cfg.driftDir.toSeq.flatMap(dd =>
        rows("dw", s"$dd/wc/v=$b") ++ rows("dl", s"$dd/lang/v=$b")) ++
      cfg.countersDir.toSeq.flatMap(cd => rows("c", s"$cd/v=$b"))
  }

  /** The telemetry cross-check the observed-metrics refactor traded away
    * (batch_docs is now DERIVED as survivors + stage counts): assert the
    * derived value against the INPUT batch size the soak constructed, so
    * a broken (survivors ∪ rejects)-partition invariant surfaces here
    * instead of self-consistently masking a dropped document. */
  private def checkTelemetry(spark: SparkSession, cfg: Intake.Config,
                             b: Long, inputDocs: Long): Unit = {
    val m = spark.read.parquet(s"${cfg.outDir}/metrics/batch=$b").head()
    val got = m.getLong(m.fieldIndex("batch_docs"))
    require(got == inputDocs,
      s"batch $b telemetry batch_docs=$got but the input batch held " +
        s"$inputDocs docs — the (survivors ∪ rejects) partition broke")
  }

  /** Shared with the spec variant. Returns (crashed batch count, seam
    * names hit). Throws on any output divergence. Control and soak run in
    * LOCKSTEP, one batch each, so the diff can cover the TRANSIENT state
    * heads too (drift counts `v=b`, counters `v=b` — retired by later
    * batches, so a finished control run would have already lost them);
    * the control batch also MEASURES its seam count, which becomes the
    * soak batch's exact arm bound. */
  def run(spark: SparkSession, nBatches: Int, seed: Long,
          twoTier: Boolean): (Int, Seq[String]) = {
    val control = mkCfg(twoTier)
    val soak = mkCfg(twoTier)
    val rnd = new scala.util.Random(seed)
    var crashed = 0
    val seams = scala.collection.mutable.ArrayBuffer[String]()
    (1L to nBatches.toLong).foreach { b =>
      CrashHooks.startCounting()
      Intake.processBatch(spark, control, batchOf(spark, b), b)
      val nSeams = CrashHooks.stopCounting()
      require(nSeams > 0, s"control batch $b crossed no seams")
      checkTelemetry(spark, control, b, inputDocs = 4L)
      // every 4th batch arms beyond the MEASURED seam count — the batch
      // runs clean, and the second processBatch becomes a
      // replay-after-success, the at-least-once redelivery shape
      // foreachBatch permits; every other batch crashes at a
      // seeded-random seam WITHIN the measured count (deterministic
      // crash coverage — the old fixed-bound arm let the clean-run
      // probability drift as seams were added)
      CrashHooks.arm(if (b % 4 == 0) nSeams + 1 else rnd.nextInt(nSeams))
      val hit =
        try { Intake.processBatch(spark, soak, batchOf(spark, b), b); None }
        catch { case c: CrashHooks.InjectedCrash => Some(c.seamName) }
      CrashHooks.disarm()
      hit.foreach { s => crashed += 1; seams += s }
      Intake.processBatch(spark, soak, batchOf(spark, b), b)
      checkTelemetry(spark, soak, b, inputDocs = 4L)
      val (want, got) = (outcome(spark, control, b), outcome(spark, soak, b))
      require(want == got,
        s"batch $b diverged after crash at ${hit.getOrElse("<none>")}:\n" +
          s"  control: $want\n  soak:    $got")
    }
    require(crashed > 0, "soak never crashed — seed/arm range too narrow")
    (crashed, seams.toSeq)
  }

  /** The MIGRATION soak (the re-bucket path crosses none of the per-batch
    * seams, so [[run]] cannot reach it): ingest at 8 buckets, then walk
    * `Intake.rebucket(…, 16)` through EVERY seam — arm k = 0, 1, 2, … and
    * re-run after each injected kill until a run completes uncrashed (the
    * deterministic full sweep; no bound to hard-code) — asserting along
    * the way that ingest REFUSES mid-migration, then resume ingest at 16
    * and diff every batch's outputs against an 8-bucket control that
    * never migrated. Returns the number of seams the walk killed at.
    * Shared with the spec variant (smaller horizon there). */
  def rebucketSoak(spark: SparkSession, seed: Long, preBatches: Int = 6,
                   postBatches: Int = 6): Int = {
    val total = preBatches + postBatches
    val control = mkCfg(twoTier = false, buckets = 8)
    (1L to total.toLong).foreach(b =>
      Intake.processBatch(spark, control, batchOf(spark, b), b))

    val soak = mkCfg(twoTier = false, buckets = 8)
    (1L to preBatches.toLong).foreach(b =>
      Intake.processBatch(spark, soak, batchOf(spark, b), b))

    var kills = 0
    var k = 0
    var done = false
    var refusalChecked = false
    while (!done) {
      CrashHooks.arm(k)
      try {
        Intake.rebucket(spark, soak, newBuckets = 16, foldPending = true)
        done = true
      } catch {
        case _: CrashHooks.InjectedCrash =>
          kills += 1
          if (!refusalChecked) {
            // a mid-flight migration must refuse ingest loudly
            CrashHooks.disarm()
            val refused =
              try {
                Intake.processBatch(spark, soak,
                  batchOf(spark, preBatches + 1L), preBatches + 1L)
                false
              } catch { case _: IllegalArgumentException => true }
            require(refused,
              "ingest did not refuse while _rebucket_in_progress was present")
            refusalChecked = true
          }
      } finally CrashHooks.disarm()
      k += 1
    }
    require(kills > 0, "rebucket soak never crashed — no seams crossed")
    require(refusalChecked, "rebucket soak never verified the ingest refusal")

    val migrated = soak.copy(stateBuckets = 16)
    ((preBatches + 1).toLong to total.toLong).foreach(b =>
      Intake.processBatch(spark, migrated, batchOf(spark, b), b))
    (1L to total.toLong).foreach { b =>
      val cfgAt = if (b <= preBatches) soak else migrated
      val (want, got) = (outcome(spark, control, b), outcome(spark, cfgAt, b))
      require(want == got,
        s"batch $b diverged across the 8→16 migration:\n" +
          s"  control: $want\n  soak:    $got")
    }
    kills
  }
}
