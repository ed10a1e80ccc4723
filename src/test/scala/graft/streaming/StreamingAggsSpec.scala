package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
