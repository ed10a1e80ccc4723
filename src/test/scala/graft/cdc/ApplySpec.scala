package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** CDC apply — replica materialization from the change stream (SCD1/SCD2). */
class ApplySpec extends SparkSpec {

  // (pk, seq, status, qty): key 1 insert→update, key 2 insert→delete,
  // key 3 delete→re-insert, key 4 single insert
  private def changes = {
    import spark.implicits._
    Seq(
      (1L, 10L, false, "a", 5L), (1L, 20L, false, "b", 6L),
      (2L, 11L, false, "a", 7L), (2L, 21L, true, null.asInstanceOf[String], 0L),
      (3L, 12L, true, null.asInstanceOf[String], 0L), (3L, 22L, false, "c", 8L),
      (4L, 13L, false, "d", 9L)
    ).toDF("pk", "seq", "del", "status", "qty")
  }

  test("latestState: last writer wins, deletes tombstone, re-insert revives") {
    val out = Apply.latestState(changes.drop("del"), Seq("pk"), "seq",
        pmod(col("seq"), lit(2)) === 1) // odd seq = delete in this fixture
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    // fixture above uses explicit del flags; rebuild with the flag column instead
    val byFlag = Apply.latestState(changes, Seq("pk"), "seq", col("del"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getString(3), r.getLong(4))).toSet
    assert(byFlag === Set(
      (1L, 20L, false, "b", 6L),   // update won
      (3L, 22L, false, "c", 8L),   // re-insert after delete revives the key
      (4L, 13L, false, "d", 9L))); // single insert
    // key 2 tombstoned; `out` (odd-seq-as-delete variant) sanity: key 2's
    // seq-21 delete wins there too
    assert(!out.exists(_._1 == 2L))
  }

  test("latestState plan: partial max_by before the exchange, no window/sort") {
    val plan = Apply.latestState(changes, Seq("pk"), "seq", col("del"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("max_by"), plan)
    assert(!plan.toLowerCase.contains("window"), "SCD1 must not plan a window")
    assert(plan.contains("partial_max_by"), s"expected map-side combined max_by in:\n$plan")
  }

  test("history: validity intervals, deletes close but emit no row") {
    val out = Apply.history(changes, Seq("pk"), "seq", col("del"))
      .select("pk", "valid_from", "valid_to", "is_current", "status")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3), r.getString(4))).toSet
    assert(out === Set(
      (1L, 10L, 20L, false, "a"),  // superseded by the update
      (1L, 20L, -1L, true, "b"),   // open interval = current
      (2L, 11L, 21L, false, "a"),  // closed by the delete; delete emits nothing
      (3L, 22L, -1L, true, "c"),
      (4L, 13L, -1L, true, "d")))
  }

  test("latestStateStream: cross-batch upsert/delete transitions, replay-safe") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, Boolean, String, Long)]
    val q = Apply.latestStateStream(
        in.toDF().toDF("pk", "seq", "del", "status", "qty"), Seq("pk"), "seq", "del")
      .writeStream.format("memory").queryName("cdc_apply").outputMode(OutputMode.Update()).start()
    try {
      in.addData((1L, 10L, false, "a", 5L), (1L, 20L, false, "b", 6L), (2L, 11L, false, "a", 7L))
      q.processAllAvailable()
      // batch 1: key 1 conflates to its seq-20 state, key 2 inserts
      val b1 = spark.table("cdc_apply").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(4))).toSet
      assert(b1 === Set((1L, 20L, "b", false), (2L, 11L, "a", false)))

      // batch 2: delete key 2, replay key 1's old change (must be ignored)
      in.addData((2L, 21L, true, null.asInstanceOf[String], 0L), (1L, 10L, false, "a", 5L))
      q.processAllAvailable()
      val b2 = spark.table("cdc_apply").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2), r.getBoolean(4))).toSet
      assert(b2.contains((2L, 21L, null, true)), s"delete tombstone emitted: $b2")
      assert(!b2.contains((1L, 10L, "a", false)), "stale replayed change must not regress key 1")
    } finally q.stop()
  }

  test("batch/oracle parity shape: q64/q65 run green on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val q64 = graft.SparkEntry.queries("q64_cdc_apply")(spark, d)
    val rows = q64.collect()
    assert(rows.nonEmpty)
    // winner-per-key: pk unique, no deleted winners (seq%10==7)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.forall(r => r.getLong(1) % 10 != 7))
    val q65 = graft.SparkEntry.queries("q65_cdc_history")(spark, d)
    val h = q65.collect()
    assert(h.nonEmpty)
    // exactly one open (current) interval per surviving key, none for others
    val open = h.filter(_.getBoolean(3)).map(_.getLong(0))
    assert(open.distinct.length === open.length)
  }
}
