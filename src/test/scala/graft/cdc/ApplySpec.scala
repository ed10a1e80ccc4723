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

  test("deltaAggregate: signed before/after contributions, group-moving update") {
    import spark.implicits._
    // (before(status,qty), after(status,qty)): insert A+5, update A6→B8 (moves
    // group), update B3→B4 (stays), delete A9
    val changes = Seq(
      (None, Some(("A", 5L))),
      (Some(("A", 6L)), Some(("B", 8L))),
      (Some(("B", 3L)), Some(("B", 4L))),
      (Some(("A", 9L)), None)
    ).toDF("before", "after")
      .selectExpr("named_struct('status', before._1, 'qty', before._2) AS b0",
        "named_struct('status', after._1, 'qty', after._2) AS a0")
      .selectExpr("if(b0.status IS NULL, NULL, b0) AS before",
        "if(a0.status IS NULL, NULL, a0) AS after")
    val out = Apply.deltaAggregate(changes, Seq("status"), "qty")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("A" -> (-1L, -10L), "B" -> (1L, 9L)))
    // A: +insert(1,+5) −update-before(1,6) −delete(1,9) = (−1, −10)
    // B: +update-after(1,+8) −before(1,3) +after(1,4) = (+1, +9)
  }

  test("deltaAggregate ≡ post-state minus pre-state (IVM consistency)") {
    import spark.implicits._
    // pre-state rows and a change batch applied to them
    val pre = Seq(("A", 10L), ("A", 20L), ("B", 30L)).toDF("status", "qty")
    // delete (A,10); update (B,30)→(A,31); insert (B,7)
    val changes = Seq(
      (Some(("A", 10L)), Option.empty[(String, Long)]),
      (Some(("B", 30L)), Some(("A", 31L))),
      (None, Some(("B", 7L))))
      .toDF("before", "after")
      .selectExpr("named_struct('status', before._1, 'qty', before._2) AS b0",
        "named_struct('status', after._1, 'qty', after._2) AS a0")
      .selectExpr("if(b0.status IS NULL, NULL, b0) AS before",
        "if(a0.status IS NULL, NULL, a0) AS after")
    val post = Seq(("A", 20L), ("A", 31L), ("B", 7L)).toDF("status", "qty")
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("status")
      .agg(count(lit(1)).as("n"), sum("qty").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (preA, postA) = (agg(pre), agg(post))
    val delta = Apply.deltaAggregate(changes, Seq("status"), "qty")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (g <- preA.keySet ++ postA.keySet) {
      val (n0, s0) = preA.getOrElse(g, (0L, 0L))
      val (n1, s1) = postA.getOrElse(g, (0L, 0L))
      val (dn, ds) = delta.getOrElse(g, (0L, 0L))
      assert((n1 - n0, s1 - s0) === (dn, ds), s"group $g")
    }
  }

  test("deltaAggregate streaming: running net aggregate across batches (Update mode)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Option[(String, Long)], Option[(String, Long)])]
    val df = in.toDF().toDF("before", "after")
      .selectExpr("named_struct('status', before._1, 'qty', before._2) AS b0",
        "named_struct('status', after._1, 'qty', after._2) AS a0")
      .selectExpr("if(b0.status IS NULL, NULL, b0) AS before",
        "if(a0.status IS NULL, NULL, a0) AS after")
    val q = Apply.deltaAggregate(df, Seq("status"), "qty")
      .writeStream.format("memory").queryName("cdc_delta").outputMode(OutputMode.Update()).start()
    try {
      in.addData((None, Some(("A", 5L))), (Some(("A", 6L)), Some(("B", 8L))))
      q.processAllAvailable()
      in.addData((Some(("B", 8L)), None), (None, Some(("A", 2L))))
      q.processAllAvailable()
      // memory sink in Update mode: the LAST emission per group is its running value
      val last = spark.table("cdc_delta").collect()
        .zipWithIndex.groupBy(_._1.getString(0))
        .map { case (g, rs) => val r = rs.maxBy(_._2)._1; g -> (r.getLong(1), r.getLong(2)) }
      assert(last("A") === (1L, 1L), s"A: insert5 − before6 + insert2: $last") // rows: +1−1+1
      assert(last("B") === (0L, 0L), s"B: +8 then −8: $last")
    } finally q.stop()
  }

  test("latestStateStream runs on the RocksDB state store (100 TB state posture)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, Long, Boolean, String, Long)]
    val q = Apply.latestStateStream(
        in.toDF().toDF("pk", "seq", "del", "status", "qty"), Seq("pk"), "seq", "del")
      .writeStream.format("memory").queryName("cdc_apply_rocks").outputMode(OutputMode.Update()).start()
    try {
      in.addData((1L, 10L, false, "a", 5L), (2L, 11L, false, "b", 6L))
      q.processAllAvailable()
      in.addData((1L, 20L, false, "c", 7L), (1L, 15L, false, "z", 0L)) // 15 conflated away
      q.processAllAvailable()
      val rows = spark.table("cdc_apply_rocks").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(rows === Set((1L, 10L, "a"), (2L, 11L, "b"), (1L, 20L, "c")))
    } finally {
      q.stop()
      prior.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    }
  }

  test("q64/q66 column pruning reaches the orders scan") {
    // the apply tier touches only (o_orderkey, o_orderstatus); a scan reading
    // all orders columns would be a 100 TB read-amplification bug
    for (name <- Seq("q64_cdc_apply", "q66_cdc_delta_agg")) {
      val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(read.contains("o_orderkey") && read.contains("o_orderstatus"), s"$name: $read")
      assert(!read.contains("o_totalprice") && !read.contains("o_orderdate"),
        s"$name reads unused columns: $read")
    }
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
