package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the write-time shuffle is paid once, then a
  * BIG⋈BIG join on the bucket key runs with NO Exchange on either side —
  * the plan property that makes repeated fact-to-fact joins viable at
  * 100 TB. Asserted on the physical plan, not just the result. */
class BucketingSpec extends SparkSpec {

  private def exchangesBelowJoin(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    "(?m)^\\s*[+:*-]*\\s*Exchange ".r.findAllIn(plan).size
  }

  test("same-bucketed tables join with zero Exchange; results match shuffle join") {
    val d = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    try {
      val joined = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
      // Force planning; count exchanges in the executed plan. The ONLY
      // exchange allowed is the groupBy's (different key) — the join itself
      // must co-locate off the bucket layout.
      val n = joined.count()
      assert(n > 0)
      val joinOnly = Bucketing.coLocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      joinOnly.write.format("noop").mode("overwrite").save()
      assert(exchangesBelowJoin(joinOnly) === 0,
        s"bucketed join must not shuffle either side:\n${joinOnly.queryExecution.executedPlan}")
      // correctness: identical to the plain shuffle join
      val expect = orders.join(lineitem, "o_orderkey")
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val got = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got === expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("mismatched bucket counts degrade to a correct shuffled join") {
    val d = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.orders(spark, d).select("o_orderkey", "o_custkey"),
      "b_o8", "o_orderkey", 8)
    Bucketing.writeBucketed(Tables.lineitem(spark, d).select(col("l_orderkey").as("o_orderkey")),
      "b_l4", "o_orderkey", 4)
    try {
      val j = Bucketing.coLocatedJoin(spark, "b_o8", "b_l4", "o_orderkey")
      assert(j.count() === Tables.lineitem(spark, d).count(), "every lineitem matches its order")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_o8")
      spark.sql("DROP TABLE IF EXISTS b_l4")
    }
  }
}
