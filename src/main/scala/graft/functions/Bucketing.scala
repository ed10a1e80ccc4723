package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the zero-shuffle path for BIG⋈BIG joins that
  * repeat on the same key (the 100 TB pattern the one-shot bench queries
  * can't show: there, AQE picks the join; here, the JOIN's shuffle is paid
  * ONCE at write time and amortized over every subsequent join/aggregation
  * on that key).
  *
  * `bucketBy(n, key)` hash-partitions files at write time and records the
  * bucket spec in the catalog; two tables bucketed (n, key) join with NO
  * Exchange on either side — each task reads matching bucket files from
  * both tables. At cluster scale that removes the dominant cost of a fact-
  * to-fact join entirely. Sorted buckets (`sortBy`) additionally let the
  * join skip the in-task sort (sort-merge directly off disk order).
  */
object Bucketing {

  /** Write `df` as a bucketed (and per-bucket sorted) catalog table. The
    * bucket count is a layout decision: pick so each bucket ≈ one HDFS/S3
    * block at target scale; it must MATCH between co-located join sides. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    format: String = "parquet"): Unit =
    df.write.format(format)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Join two same-bucketed tables on their bucket key. The plan this
    * produces has no Exchange on either scan (asserted by `BucketingSpec`);
    * misconfigured bucket counts degrade gracefully to a normal shuffle. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
