package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct tests of the two distributed numbering primitives: dense zipWithIndex
  * and exclusive prefix sum — both assigned in total-key order across many
  * partitions, never through a single-partition window. */
class EventIndexerSpec extends SparkSpec {

  test("dense: 1..N in key order regardless of input partitioning/order") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i * 7 % 501).toLong).toDF("k").repartition(13)
    val out = EventIndexer.dense(df, Seq(col("k")), "idx", start = 10L)
      .orderBy("k").select("k", "idx")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._2).toSeq === (11L to 510L))
    assert(out.map(_._1).toSeq === out.map(_._1).sorted.toSeq)
  }

  test("prefixSum: exclusive running sum of weights in key order") {
    import spark.implicits._
    val df = (1L to 200L).map(k => (k, k % 5)).toDF("k", "w").repartition(7)
    val out = EventIndexer.prefixSum(df, Seq(col("k")), "w", "base", start = 100L)
      .orderBy("k").select("k", "w", "base")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var expect = 100L
    out.foreach { case (k, w, base) =>
      assert(base === expect, s"k=$k")
      expect += w
    }
  }
}
