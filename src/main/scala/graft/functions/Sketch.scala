package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — deterministic, mergeable,
  * engine-portable (unlike HyperLogLog implementations, whose estimates are
  * library-specific and can never hash-match an oracle).
  *
  * Theory (Bar-Yossef et al.): hash values uniformly into [0, 1); if the k-th
  * smallest DISTINCT hash is h_k, the distinct count is ≈ (k−1)/h_k. The
  * hash here is the md5-60-bit value both engines compute identically
  * ([[hash60]]), normalized by 2⁶⁰.
  *
  * Scale shape: each partition keeps its ≤k smallest distinct hashes in a
  * bounded sorted set (classic KMV partial — `mapPartitions` is the honest
  * form of per-partition bounded-state stream logic), so the shuffle carries
  * at most k·numPartitions longs no matter how large the corpus or its
  * ndv — O(k·P), not O(ndv). The merge of partials is itself a KMV sketch
  * union (take the k smallest of the union), which is why the sketch is
  * mergeable across files, days, or clusters.
  */
object Sketch {

  /** First 60 bits of md5 as a non-negative long — portable: DuckDB computes
    * the identical value via `('0x' || substr(md5(x), 1, 15))::BIGINT`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  private val Two60 = math.pow(2.0, 60)

  /** The k smallest distinct `hash60` values of `valueCol`, as a k-row frame
    * (column `h`). Lossless vs the naive `SELECT DISTINCT h ORDER BY h
    * LIMIT k`: a hash in the global k-minimum set is in its partition's
    * k-minimum set. */
  def kMinHashes(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Encoders
    val hashed = df.select(hash60(valueCol).as("h")).where(col("h").isNotNull)
      .as[Long](Encoders.scalaLong)
    val partials = hashed.rdd.mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { h =>
        // contains-check first: TreeSet.add of a duplicate is a no-op, and
        // pairing it with pollLast would silently shrink the set.
        if (!set.contains(h)) {
          if (set.size < k) { set.add(h); () }
          else if (h < set.last()) { set.add(h); set.pollLast(); () }
        }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(set.iterator()).asScala
        .map(_.longValue())
    }
    spark.createDataset(partials)(Encoders.scalaLong).toDF("h")
      .distinct().orderBy("h").limit(k)
  }

  /** One-row sketch summary: (k_used, h_k, est_ndv). `k_used` < k when the
    * column has fewer than k distinct hashes — then h_k is the max and the
    * "estimate" degenerates to the exact count (KMV's standard small-range
    * behavior). */
  def kmvDistinct(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    kMinHashes(df, valueCol, k)
      .agg(count(lit(1)).as("k_used"), max(col("h")).as("h_k"))
      .select(col("k_used"), col("h_k"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise((col("k_used") - 1).cast("double") / (col("h_k") / lit(Two60)))
          .as("est_ndv"))
  }
}
