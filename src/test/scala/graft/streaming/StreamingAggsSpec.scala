package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, explode, split, sum}
import org.apache.spark.sql.streaming.OutputMode

/** Event-time streaming semantics: watermarked window counts (late data past
  * the watermark dropped), flatMapGroupsWithState sessionization closing on
  * event-time timeout. */
class StreamingAggsSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = new Timestamp(3600L * 1000 + min * 60000L)

  test("watermarked tumbling window counts; too-late rows are dropped") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamingAggs.windowedCounts(
        in.toDF().toDF("ts", "k"), "ts", "k", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wincounts").outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(1), "a"), (ts(2), "a"), (ts(11), "b"))
      q.processAllAvailable()
      // advance the watermark far: windows [60,70) and [70,80) close
      in.addData((ts(40), "c"))
      q.processAllAvailable()
      // this row is far behind the watermark -> dropped, not re-opened
      in.addData((ts(1), "a"))
      in.addData((ts(60), "c"))
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .selectExpr("cast(win_start as long) - 3600 as m", "k", "n")
        .collect().map(r => (r.getLong(0) / 60, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((0L, "a", 2L)), s"window[60,70) a=2 in $rows")
      assert(rows.contains((10L, "b", 1L)))
      assert(!rows.contains((0L, "a", 3L)), "late row must not inflate the closed window")
    } finally q.stop()
  }

  test("streaming exact dedup with bounded state: dropDuplicatesWithinWatermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    // Dedup on content hash with a watermark bound: state for keys older than
    // the watermark is dropped — the streaming form of q21's hash-groupBy, with
    // bounded memory at 100 TB (duplicate docs arrive close in time).
    val q = in.toDF().toDF("ts", "content")
      .selectExpr("ts", "content", "md5(content) AS key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("key")
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), "doc A"), (ts(1), "doc A"), (ts(2), "doc B"))
      q.processAllAvailable()
      in.addData((ts(3), "doc A"), (ts(4), "doc C"))
      q.processAllAvailable()
      val docs = spark.table("dedup").select("content").as[String].collect().sorted.toSeq
      assert(docs === Seq("doc A", "doc B", "doc C"), s"duplicates within watermark removed: $docs")
    } finally q.stop()
  }

  test("streaming near-dup dedup: first arrival per fingerprint survives") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // tB differs from tA only in case: NOT byte-identical (exact md5 dedup
    // would keep both) but fingerprint-identical by construction (the
    // fingerprint normalizes case). tC is distinct.
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "Alpha Beta GAMMA delta epsilon zeta eta theta"
    val tC = "one two three four five six seven"
    val fps = Seq(tA, tB, tC).toDF("t")
      .select(graft.llm.TextAnalysis.fingerprintCol(org.apache.spark.sql.functions.col("t")))
      .as[Long].collect()
    assert(fps(0) == fps(1), "case-only edit must not change the fingerprint")
    assert(fps(0) != fps(2))
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamingAggs.fingerprintDedup(in.toDF().toDF("ts", "text"), "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("fpdedup").outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), tA), (ts(1), tB), (ts(2), tC))
      q.processAllAvailable()
      in.addData((ts(3), tA))
      q.processAllAvailable()
      val docs = spark.table("fpdedup").select("text").as[String].collect().sorted.toSeq
      assert(docs === Seq(tA, tC).sorted, s"near-dup tB and replay tA must be dropped: $docs")
    } finally q.stop()
  }

  test("streaming incremental dedup: row-local signatures probe the static band " +
    "index, exact pair parity with the batch operator") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight again"),
      (101L, "pack my box with five dozen liquor jugs right now today"),
      (102L, "entirely different corpus content sits here for the test run")
    ).toDF("doc_id", "text")
    val batchDocs = Seq(
      // near-dup of 100 (one word appended -> shingle jaccard ~0.9)
      (1L, "the quick brown fox jumps over the lazy dog tonight again please"),
      (2L, "no relation to anything stored in the standing corpus index"),
      (3L, "too short")) // <3 words: no signature, must pass through silently

    val in = MemoryStream[(Timestamp, Long, String)]
    val q = graft.llm.Dedup.incrementalNearDupStream(
        in.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
        corpus, "doc_id", "text", watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("incdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(batchDocs.map { case (id, t) => (ts(0), id, t) }: _*)
      q.processAllAvailable()
      // two clean flush batches advance + apply the watermark (see decontam)
      in.addData((ts(120), 999L, "zz1 zz2 zz3 zz4"))
      q.processAllAvailable()
      in.addData((ts(121), 998L, "zz5 zz6 zz7 zz8"))
      q.processAllAvailable()

      val streamed = spark.table("incdedup")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter(_._1 < 900).toSet
      val batch = graft.llm.Dedup.incrementalNearDup(
          corpus, batchDocs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch.map(t => (t._1, t._2)) === Set((1L, 100L)),
        s"batch fixture sanity (planted pair recovered, nothing else): $batch")
      assert(streamed === batch,
        s"stream/batch parity broken:\nstream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("streaming decontamination: stream-static n-gram probe, parity with the batch report") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // benchmark: two held-out eval docs; n=3 word grams for compact fixtures
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    // corpus docs: d1 shares a 3-gram run with bench 100, d2 with bench 101,
    // d3 is clean, d4 shares a gram with 100 amid clean text
    val docs = Seq(
      (1L, "here the quick brown fox appears again somewhere"),
      (2L, "she said pack my box with care today"),
      (3L, "completely unrelated clean words only here now"),
      (4L, "noise noise jumps over the noise noise tail"))

    val in = MemoryStream[(Timestamp, Long, String)]
    val q = graft.llm.Decontam.contaminationStream(
        in.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
        benchmark, "doc_id", "text", n = 3, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("decontam").outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), docs(0)._1, docs(0)._2), (ts(1), docs(1)._1, docs(1)._2))
      q.processAllAvailable()
      in.addData((ts(2), docs(2)._1, docs(2)._2), (ts(3), docs(3)._1, docs(3)._2))
      q.processAllAvailable()
      // two clean flush batches: the first advances max event time, the
      // second applies the advanced watermark so all doc groups emit
      in.addData((ts(120), 999L, "zz1 zz2 zz3"))
      q.processAllAvailable()
      in.addData((ts(121), 998L, "zz4 zz5 zz6"))
      q.processAllAvailable()

      val streamed = spark.table("decontam")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // column parity with the batch operator over the same corpus
      val batch = graft.llm.Decontam.contaminationReport(
          docs.toDF("doc_id", "text"), benchmark, "doc_id", "text", n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(batch.map(_._1) === Set(1L, 2L, 4L), s"batch fixture sanity: $batch")
      assert(streamed === batch,
        s"stream/batch parity broken:\nstream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("streaming span scrub: stream-static span masking, parity with the batch " +
    "contaminationSpans → removeSpans composition") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // Same fixture family as the decontamination test: d1/d2/d4 share 3-gram
    // runs with the benchmark, d3 is clean, d5 is shorter than n (no grams —
    // must still pass through), and d4's hits sit mid-document so the scrub
    // must cut an INTERIOR span and keep both flanks.
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "here the quick brown fox appears again somewhere"),
      (2L, "she said pack my box with care today"),
      (3L, "completely unrelated clean words only here now"),
      (4L, "noise noise jumps over the noise noise tail"),
      (5L, "too short"))

    val in = MemoryStream[(Timestamp, Long, String)]
    val q = graft.llm.Decontam.spanScrubStream(
        in.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text",
        benchmark, "doc_id", "text", n = 3, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("spanscrub")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), docs(0)._1, docs(0)._2), (ts(1), docs(1)._1, docs(1)._2))
      q.processAllAvailable()
      in.addData((ts(2), docs(2)._1, docs(2)._2), (ts(3), docs(3)._1, docs(3)._2),
        (ts(4), docs(4)._1, docs(4)._2))
      q.processAllAvailable()
      // two clean flush batches: advance max event time, then apply it
      in.addData((ts(120), 999L, "zz1 zz2 zz3"))
      q.processAllAvailable()
      in.addData((ts(121), 998L, "zz4 zz5 zz6"))
      q.processAllAvailable()

      val streamed = spark.table("spanscrub")
        .filter($"doc_id" < 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      val corpus = docs.toDF("doc_id", "text")
      val batch = graft.llm.Dedup.removeSpans(corpus,
          graft.llm.Decontam.contaminationSpans(corpus, benchmark, "doc_id", "text", n = 3),
          "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      // fixture sanity: an interior cut keeps both flanks, the clean and
      // sub-n docs pass through whole
      assert(batch.exists(r => r._1 == 4L && r._3 > 0 &&
        r._4.startsWith("noise") && r._4.endsWith("tail")), s"batch: $batch")
      assert(batch.exists(r => r._1 == 3L && r._3 === 0L))
      assert(batch.exists(r => r._1 == 5L && r._3 === 0L && r._4 == "too short"))
      assert(streamed === batch,
        s"stream/batch span-scrub parity broken:\nstream=$streamed\nbatch=$batch")
    } finally q.stop()
  }

  test("stream-static enrichment join: envelope stream x dimension table") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dim = Seq(("shop.orders", "commerce"), ("test.city", "geo")).toDF("topic", "domain")
    val in = MemoryStream[String]
    // Stream-static joins need no watermark; the static side is broadcast —
    // the standard CDC enrichment shape (envelope topic -> reference data).
    val q = in.toDF().toDF("topic")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("topic"), "left")
      .writeStream.format("memory").queryName("enriched").outputMode(OutputMode.Append()).start()
    try {
      in.addData("shop.orders", "test.city", "unknown.t")
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(rows === Set(
        ("shop.orders", Some("commerce")), ("test.city", Some("geo")), ("unknown.t", None)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on event-time gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[StreamingAggs.SessionIn]
    val q = StreamingAggs.sessionize(in.toDS(), gapSec = 600)
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 2 min apart -> one session; then silence
      in.addData(StreamingAggs.SessionIn(1L, ts(0)), StreamingAggs.SessionIn(1L, ts(2)))
      q.processAllAvailable()
      // push the watermark way past the gap so user 1's session times out
      in.addData(StreamingAggs.SessionIn(2L, ts(60)))
      q.processAllAvailable()
      in.addData(StreamingAggs.SessionIn(2L, ts(120)))
      q.processAllAvailable()
      val out = spark.table("sessions").as[StreamingAggs.SessionOut].collect()
      val u1 = out.filter(_.user_id == 1L)
      assert(u1.length === 1, s"user 1 should have one closed session: ${out.toSeq}")
      assert(u1.head.n_events === 2 && u1.head.dur_s === 120)
    } finally q.stop()
  }

  test("sessionize tolerates LATE events: no backward session end, no timeout crash") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[StreamingAggs.SessionIn]
    val q = StreamingAggs.sessionize(in.toDS(), gapSec = 600)
      .writeStream.format("memory").queryName("late_sessions").outputMode(OutputMode.Append()).start()
    try {
      // user 1 opens a session; another user advances the watermark
      in.addData(StreamingAggs.SessionIn(1L, ts(10)), StreamingAggs.SessionIn(1L, ts(12)))
      q.processAllAvailable()
      in.addData(StreamingAggs.SessionIn(2L, ts(14)))
      q.processAllAvailable()
      // LATE event for user 1 (behind max event time): flatMapGroupsWithState
      // does NOT drop it — it must merge without moving lastMs backwards or
      // setting a timeout below the watermark (which would throw)
      in.addData(StreamingAggs.SessionIn(1L, ts(9)))
      q.processAllAvailable()
      // close user 1's session by pushing the watermark past the gap
      in.addData(StreamingAggs.SessionIn(2L, ts(60)))
      q.processAllAvailable()
      in.addData(StreamingAggs.SessionIn(2L, ts(120)))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"late event poisoned the query: ${q.exception}")
      val u1 = spark.table("late_sessions").as[StreamingAggs.SessionOut]
        .collect().filter(_.user_id == 1L)
      assert(u1.length === 1, s"one merged session: ${u1.toSeq}")
      assert(u1.head.n_events === 3 && u1.head.dur_s === 180,
        s"late event extends the session BACKWARD (9..12 min = 180s), never negative: ${u1.head}")
    } finally q.stop()
  }

  test("stream-stream interval join: matches inside the window, bounded state") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    // Clicks attribute to an impression of the same ad within [0, +10 min].
    val joined = StreamingAggs.intervalJoin(
      imps.toDF().toDF("imp_ad", "imp_ts"), "imp_ad", "imp_ts",
      clicks.toDF().toDF("clk_ad", "clk_ts"), "clk_ad", "clk_ts",
      watermarkDelay = "5 minutes", beforeSec = 0, afterSec = 600)
    val q = joined.select("imp_ad", "imp_ts", "clk_ts")
      .writeStream.format("memory").queryName("attrib").outputMode(OutputMode.Append()).start()
    try {
      imps.addData((1L, ts(0)), (2L, ts(1)))
      clicks.addData((1L, ts(4)))          // inside [0, +10] of imp 1
      q.processAllAvailable()
      clicks.addData((2L, ts(30)))         // 29 min after imp 2 -> outside
      clicks.addData((3L, ts(31)))         // no matching impression
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2))).toSeq
      assert(rows === Seq((1L, ts(4))),
        s"only the in-window click joins: $rows")
      // State boundedness is a PLAN property: both sides watermarked and the
      // join condition bounds clk_ts against imp_ts, so the streaming planner
      // accepts the join (it REJECTS an unbounded-state stream-stream join)
      // and runs it as a symmetric hash join with per-side state eviction.
      assert(q.lastProgress.stateOperators.nonEmpty,
        "the join must run as a stateful symmetric hash join")
    } finally q.stop()
  }

  test("continuous Count-Min maintenance: per-micro-batch sketches union-sum " +
    "into a running sketch that equals the whole-corpus build") {
    // The sketch-merge law (SkewSketchSpec) applied where it matters at
    // 100 TB: a stream maintains token frequencies by folding each
    // micro-batch's bounded d*w sketch into the running one — state is the
    // sketch frame, never per-key counts. foreachBatch is the right harness:
    // the fold is a deterministic batch aggregate, not row-wise state.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.functions.Sketch
    val cd = 3; val cw = 128
    val batches = Seq(
      Seq("alpha beta alpha", "gamma beta"),
      Seq("alpha gamma gamma delta"),
      Seq("beta beta epsilon"))
    var running: org.apache.spark.sql.DataFrame = null
    val in = MemoryStream[String]
    val q = in.toDF().toDF("text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val words = batch.select(explode(split(col("text"), " ")).as("w"))
        val s = Sketch.cmsBuild(words, col("w"), cd, cw)
        running = if (running == null) s
          else running.union(s).groupBy("r", "pos").agg(sum("cnt").as("cnt"))
        running = running.localCheckpoint(true) // fold result, lineage cut
        ()
      }.start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val allWords = batches.flatten.flatMap(_.split(" "))
    val whole = Sketch.cmsBuild(allWords.toDF("w"), col("w"), cd, cw)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("r", "pos").collect().map(_.toSeq.map(_.toString)).toSeq
    assert(rows(running) === rows(whole),
      "folded per-batch sketches must equal the one-shot corpus sketch")
    // and the folded sketch answers point queries with the true counts here
    val est = Sketch.cmsEstimate(running, Seq("beta").toDF("w"), "w", cd, cw)
      .collect().head.getLong(1)
    assert(est === allWords.count(_ == "beta").toLong)
  }
}
