package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage (SURVEY.md §2.2): scans, joins (broadcast/semi/anti/range),
  * aggregation (hash, distinct, rollup/cube), window functions (rank/frames/lag),
  * sorts/top-k, set ops, sessionization, time-bucketed aggregation.
  *
  * The reference implements none of these itself (it is a CDC router); they come
  * "for free" from Spark and are verified here against the DuckDB oracle. Every
  * plan is shuffle-minimal: dimension joins are broadcast, aggregates are partial
  * (map-side combine), windows partition by high-cardinality keys.
  */
object RelationalQueries {
  import Num._

  private def q1(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl(sum(dec2(col("l_quantity")))).as("sum_qty"),
        dbl(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(revTerm(col("l_extendedprice"), col("l_discount")))).as("sum_disc_price"),
        dbl(sum(revTerm(col("l_extendedprice"), col("l_discount")) * (lit(1) + dec2(col("l_tax")))))
          .as("sum_charge"),
        (dbl(sum(dec2(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private def q2(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p  = Tables.part(s, d)
    // No broadcast hint: `part` scales with SF, so at the 100 TB target it must
    // not be pinned to a broadcast; AQE picks the join strategy from runtime stats.
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        dbl(sum(revTerm(col("l_extendedprice"), col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  private val q2Sql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  private def q3(s: SparkSession, d: String): DataFrame = {
    val c  = Tables.customer(s, d)
    val o  = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")) // customer scales with SF: no broadcast hint, AQE decides
      .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
      .agg(dbl(sum(revTerm(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_orderkey, od
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  private def q4(s: SparkSession, d: String): DataFrame = {
    val o  = Tables.orders(s, d)
    val li = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private def q5(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  private val q5Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  private def q6(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice").as("price"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  private val q6Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice AS price, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  private def q7(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("c_acctbal")))).as("bal"))
      .select(
        coalesce(col("n_name"), lit("(all)")).as("nation"),
        coalesce(col("c_mktsegment"), lit("(all)")).as("seg"),
        col("n"), col("bal"))
      .orderBy("nation", "seg")
  }

  private val q7Sql =
    """SELECT COALESCE(n_name, '(all)') AS nation, COALESCE(c_mktsegment, '(all)') AS seg,
      |  COUNT(*) AS n, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY nation, seg""".stripMargin

  private def q8(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  private val q8Sql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private def q9(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    c.select(col("c_custkey").as("k"))
      .except(o.select(col("o_custkey").as("k")))
      .orderBy("k")
  }

  private val q9Sql =
    """SELECT c_custkey AS k FROM customer
      |EXCEPT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000 ORDER BY k""".stripMargin

  private def q10(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").as("k"))
    val n = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
    val both = c.intersect(n).withColumn("op", lit("both"))
    val only = c.except(n).withColumn("op", lit("cust_only"))
    both.unionAll(only).select(col("op"), col("k")).orderBy("op", "k")
  }

  private val q10Sql =
    """SELECT 'both' AS op, k FROM (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) t1
      |UNION ALL
      |SELECT 'cust_only' AS op, k FROM (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) t2
      |ORDER BY op, k""".stripMargin

  /** As-of join, single-pass streaming-friendly form: for each purchase event,
    * the most recent signup timestamp of the same user at-or-before it. One
    * shuffle on user_id, then a running `last(ignoreNulls)` — no self-join,
    * scales linearly (vs the oracle's correlated subquery). */
  private def q11(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("sig_us", when(col("event_type") === "signup", col("ts_us")))
      .withColumn("asof_us", last(col("sig_us"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("asof_us"))
      .orderBy("event_id")
  }

  // Tie rule matches the Spark window exactly: a signup counts iff
  // (µs, event_id) <= (purchase µs, purchase event_id) lexicographically,
  // both sides compared at microsecond precision.
  private val q11Sql =
    """SELECT e.event_id, e.user_id,
      |  (SELECT max(epoch_us(s.ts)) FROM events s
      |   WHERE s.user_id = e.user_id AND s.event_type = 'signup'
      |     AND (epoch_us(s.ts) < epoch_us(e.ts)
      |          OR (epoch_us(s.ts) = epoch_us(e.ts) AND s.event_id <= e.event_id))) AS asof_us
      |FROM events e WHERE e.event_type = 'purchase' ORDER BY e.event_id""".stripMargin

  private def q12(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val bands = s.createDataFrame(
      Seq(("b0", 0, 20000), ("b1", 20000, 40000), ("b2", 40000, 60000),
          ("b3", 60000, 80000), ("b4", 80000, 100000), ("b5", 100000, 120000)))
      .toDF("band", "lo", "hi")
    li.join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("l_extendedprice")))).as("total"))
      .orderBy("band")
  }

  private val q12Sql =
    """SELECT band, COUNT(*) AS n, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM lineitem JOIN (VALUES ('b0',0,20000),('b1',20000,40000),('b2',40000,60000),
      |  ('b3',60000,80000),('b4',80000,100000),('b5',100000,120000)) b(band,lo,hi)
      |ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  private def q13(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("o_totalprice")))).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("prio"),
        col("n"), col("total"))
      .orderBy("status", "prio")
  }

  private val q13Sql =
    """SELECT COALESCE(o_orderstatus, '(all)') AS status, COALESCE(o_orderpriority, '(all)') AS prio,
      |  COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, prio""".stripMargin

  private def q14(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    e.select(
        col("event_id"), col("user_id"),
        dbl(sum(dec2(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("run_sum"),
        lag(col("value"), 1).over(w).as("prev_val"),
        lead(col("value"), 1).over(w).as("next_val"))
      .orderBy("event_id")
  }

  private val q14Sql =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_sum,
      |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_val,
      |  lead(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_val
      |FROM events ORDER BY event_id""".stripMargin

  /** Sessionization (30-min inactivity gap), the batch mirror of the streaming
    * session-window operator: lag → new-session flag → running sum = session id. */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    e.withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("sess",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"), expr("(max(ts_us) - min(ts_us)) div 1000000").as("dur_s"))
      .orderBy("user_id", "sess")
  }

  private val q15Sql =
    """WITH g AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
      |f AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
      |      FROM g WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s2 AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess FROM f)
      |SELECT user_id, sess, COUNT(*) AS n_events, (max(us) - min(us)) // 1000000 AS dur_s
      |FROM s2 GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin

  private def q16(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    e.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hr"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("value")))).as("sum_value"))
      .orderBy("hr", "event_type")
  }

  private val q16Sql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hr, event_type,
      |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY hr, event_type ORDER BY hr, event_type""".stripMargin

  // ---------------------------------------------------------------- q36 KMV sketch

  /** Deterministic KMV distinct-count sketch ([[graft.functions.Sketch]]):
    * per-partition bounded k-minimum sets → O(k·P) merge → (k−1)/h_k
    * estimate. Portable md5-60-bit hashing, so the DuckDB oracle reproduces
    * the ESTIMATE bit-for-bit — impossible with HLL-family sketches. */
  private def q36(s: SparkSession, d: String): DataFrame =
    graft.functions.Sketch.kmvDistinct(Tables.lineitem(s, d), col("l_partkey"), k = 256)

  private val q36Sql =
    """WITH h AS (
      |  SELECT DISTINCT ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
      |  FROM lineitem WHERE l_partkey IS NOT NULL),
      |km AS (SELECT h FROM h ORDER BY h LIMIT 256)
      |SELECT count(*)::BIGINT AS k_used, max(h) AS h_k,
      |  CASE WHEN count(*) < 256 THEN count(*)::DOUBLE
      |       ELSE (count(*)-1)::DOUBLE / (max(h) / 1152921504606846976.0) END AS est_ndv
      |FROM km""".stripMargin

  // ---------------------------------------------------------------- q37 salted skew join

  /** Salted equi-join ([[graft.functions.Skew.saltedJoin]]): the probe side
    * scatters each key over 8 sub-keys, the build side replicates 8×, and the
    * result is IDENTICAL to the plain join — which is exactly what the oracle
    * checks (it runs the unsalted join). Aggregated afterward so the output
    * is stable and small. */
  private def q37(s: SparkSession, d: String): DataFrame =
    graft.functions.Skew.saltedJoin(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")),
        Tables.supplier(s, d).select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
        key = "l_suppkey", probeUniquifier = "l_orderkey", salt = 8)
      .groupBy(col("s_nationkey"))
      .agg(sum(col("l_quantity")).cast("double").as("qty"), count(lit(1)).as("n"))
      .orderBy(col("s_nationkey"))

  private val q37Sql =
    """SELECT s_nationkey, sum(l_quantity)::DOUBLE AS qty, count(*) AS n
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q1_agg", q1, Some(q1Sql)),
    QueryDef("q2_join_bcast", q2, Some(q2Sql)),
    QueryDef("q3_topk", q3, Some(q3Sql)),
    QueryDef("q4_semijoin", q4, Some(q4Sql)),
    QueryDef("q5_antijoin", q5, Some(q5Sql)),
    QueryDef("q6_rank", q6, Some(q6Sql)),
    QueryDef("q7_rollup", q7, Some(q7Sql)),
    QueryDef("q8_distinct", q8, Some(q8Sql)),
    QueryDef("q9_except", q9, Some(q9Sql)),
    QueryDef("q10_setops", q10, Some(q10Sql)),
    QueryDef("q11_asof", q11, Some(q11Sql)),
    QueryDef("q12_rangejoin", q12, Some(q12Sql)),
    QueryDef("q13_cube", q13, Some(q13Sql)),
    // q14 emits the whole events table under a global sort — a verification query,
    // not a headline bench number (full-table output pattern; see VERDICT r1 §perf).
    QueryDef("q14_running", q14, Some(q14Sql), bench = false),
    QueryDef("q15_session", q15, Some(q15Sql)),
    QueryDef("q16_hourly", q16, Some(q16Sql)),
    QueryDef("q36_kmv_ndv", q36, Some(q36Sql)),
    QueryDef("q37_salted_join", q37, Some(q37Sql)),
  )
}
