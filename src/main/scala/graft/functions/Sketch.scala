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

  // -------------------------------------------------- Count–Min frequency sketch

  /** Count–Min sketch (Cormode & Muthukrishnan 2005): approximate per-key
    * frequencies in `d · w` counters regardless of key cardinality. The
    * companion to KMV's "how many distinct?": CM answers "how often does THIS
    * key occur?" without per-key state — the tool for token/domain/n-gram
    * frequency at corpus scale, where an exact per-key count is itself a
    * 10^10-row frame. One-sided error: `est ≥ true` always (collisions only
    * ADD), and `est ≤ true + (e/w)·N` with probability `1 − e^−d`.
    *
    * Same portability stance as [[Bloom]] vs Spark's `count_min_sketch`
    * built-in: row `r`'s counter index is `(h1 + r·h2) mod w` over the
    * md5-derived pair both engines compute identically, so every estimate —
    * including every collision — is reproducible by the SQL oracle.
    *
    * The sketch is a FRAME (r, pos, cnt), ≤ d·w rows: map-side partial
    * aggregation caps each partition's shuffle contribution at d·w counter
    * rows no matter how many input rows it holds, and merging two sketches
    * (days, shards, clusters) is `UNION ALL → sum` on the same bounded key
    * space. */
  private def checkCms(d: Int, w: Int): Unit = {
    require(d > 0 && d <= 16, s"cms depth d must be in [1, 16], got $d")
    require(w > 0 && w <= (1 << 30), s"cms width w must be in [1, 2^30], got $w")
  }

  private def cmsPosArray(c: Column, d: Int, w: Int): Column = {
    val h1 = hash60(c)
    val h2 = Bloom.hash60b(c)
    array((0 until d).map(r => (h1 % w + lit(r.toLong) * (h2 % w)) % w): _*)
  }

  /** Build the (r, pos, cnt) sketch frame over `valueCol` occurrences.
    * NULL keys are EXCLUDED (mirroring [[Bloom.build]]'s null filter): a
    * null's md5 is null, so its position array is null — without the filter
    * those occurrences polluted the frame as never-matchable rows and
    * silently vanished from every estimate. Callers who need a null count
    * take it directly (`count(col.isNull)`); a sketch is for the non-null
    * key space. */
  def cmsBuild(df: DataFrame, valueCol: Column, d: Int, w: Int): DataFrame = {
    checkCms(d, w)
    df.where(valueCol.isNotNull)
      .select(posexplode(cmsPosArray(valueCol, d, w)).as(Seq("r", "pos")))
      .groupBy("r", "pos").agg(count(lit(1)).as("cnt"))
  }

  /** Point-query estimates for a (small, bounded-by-construction) probe set:
    * min over the d rows of the probed counters, 0 when a counter was never
    * touched. The sketch side is ≤ d·w rows, so AQE broadcasts it — probing
    * never shuffles the probe frame. Output: (valueColName, est). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, valueColName: String,
                  d: Int, w: Int): DataFrame = {
    checkCms(d, w)
    probes
      .where(col(valueColName).isNotNull)
      .select(col(valueColName).as("__v"),
        posexplode(cmsPosArray(col(valueColName), d, w)).as(Seq("r", "pos")))
      .join(sketch, Seq("r", "pos"), "left")
      .groupBy(col("__v"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .withColumnRenamed("__v", valueColName)
  }
}
