package graft.functions

import graft.SparkSpec
import graft.queries.CdcQueries
import org.apache.spark.sql.functions._

/** Typed Aggregator surface: dense-index audit over the real envelope
  * pipeline's output, via both the typed and the `udaf`-registered forms. */
class AggregatorsSpec extends SparkSpec {

  test("IndexRangeAgg certifies the envelope pipeline's numbering is dense") {
    import spark.implicits._
    val env = graft.cdc.EnvelopeBuilder.withEventIndex(
      CdcQueries.rawFromOrders(spark, "/root/testdata/sf0.001"))
    val r = env.select(col("event_index")).as[Long]
      .select(Aggregators.indexRange.toColumn).collect()(0)
    assert(Aggregators.isDense(r), s"global index not dense: $r")
    assert(r.min === 1L)

    // untyped/SQL form via udaf registration, grouped by topic: per-topic
    // ranges are NOT dense (interleaved topics) but their counts must sum up
    spark.udf.register("idx_range", udaf(Aggregators.indexRange))
    env.createOrReplaceTempView("envelopes")
    val perTopic = spark.sql(
      "SELECT topic, idx_range(event_index) AS r FROM envelopes GROUP BY topic")
      .selectExpr("r.n").collect().map(_.getLong(0))
    assert(perTopic.sum === r.n)
  }
}
