package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[KMeans]] against a driver-side reference implementation of the same
  * integer-micro Lloyd algorithm — every centroid component and assignment
  * must match exactly (the operator's whole point is bit-reproducibility),
  * plus edge cases (starved clusters, determinism). */
class KMeansSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  /** Reference: the identical algorithm, single-threaded on driver arrays. */
  private def refKmeans(vecs: Seq[(Long, Seq[Float])], stride: Long,
                        iters: Int): Map[Long, Long] = {
    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray
    val q = vecs.map { case (id, v) => (id, quant(v)) }.sortBy(_._1)
    var cents: Seq[(Long, Array[Long])] =
      q.filter(_._1 % stride == 0).map { case (id, v) => (id, v.clone()) }
    def nearest(v: Array[Long]): Long =
      cents.map { case (cell, c) =>
        val d2 = c.zip(v).map { case (ci, vi) => (vi - ci) * (vi - ci) }.sum
        (d2, cell)
      }.min._2
    for (_ <- 1 to iters) {
      val byCell = q.groupBy { case (_, v) => nearest(v) }
      cents = cents.map { case (cell, old) =>
        byCell.get(cell) match {
          case Some(members) =>
            val n = members.size.toLong
            val comp = (0 until old.length).map { i =>
              Math.floorDiv(members.map(_._2(i)).sum, n)
            }.toArray
            (cell, comp)
          case None => (cell, old)
        }
      }
    }
    q.map { case (id, v) => id -> nearest(v) }.toMap
  }

  test("kmeans matches the driver-side reference exactly on sf0.001 (2 rounds)") {
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val got = KMeans.assignClusters(vecs, centroidStride = 40, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val want = refKmeans(raw.toSeq, 40, 2)
    assert(got === want)
  }

  test("cluster sizes are consistent with the assignment") {
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val rows = KMeans.assignClusters(vecs, 40, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.forall(_._3 == members.length),
        s"cluster $c reports size ${members.head._3}, has ${members.length}")
    }
  }

  test("identical seed vectors: round 1 ties everything to the smaller cell, " +
    "the starved cell keeps its seed centroid, and the reference agrees") {
    import spark.implicits._
    // ids 0 and 3 carry the SAME vector: in round 1 every point ties to cell
    // 0 (smaller id) and cell 3 starves — its centroid must STAND, which lets
    // it win back the points at (1,1) after cell 0's centroid moves to the
    // mean. The distributed run must walk the identical trajectory.
    val data = Seq(
      (0L, Seq(1.0f, 1.0f)), (1L, Seq(1.1f, 0.9f)), (2L, Seq(0.9f, 1.1f)),
      (3L, Seq(1.0f, 1.0f)), (4L, Seq(1.2f, 1.0f)))
    val out = KMeans.assignClusters(data.toDF("id", "vec"), centroidStride = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === refKmeans(data, 3, 2))
    assert(out.values.toSet.size == 2,
      s"the starved cell should win back the exact-seed points: $out")
  }

  test("cluster-balanced sample (q62) keeps exactly ceil(size/5) per cluster") {
    val q62 = graft.SparkEntry.queries("q62_cluster_sample")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    q62.groupBy(_._2).foreach { case (cluster, kept) =>
      val size = kept.head._3
      val want = (size + 4) / 5
      assert(kept.length == want,
        s"cluster $cluster (size $size) kept ${kept.length}, want $want")
      assert(kept.map(_._4).sorted.toSeq == (1L to want),
        s"cluster $cluster ranks must be 1..$want")
    }
  }

  test("deterministic: two runs produce identical assignments") {
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    def run() = KMeans.assignClusters(vecs, 40, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(run() === run())
  }

  test("assignClustersByCount: the count contract derives the stride from " +
    "the max id (Similarity's IVF-header convention) and equals the " +
    "stride form; out-of-range counts refuse loudly") {
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val maxId = vecs.agg(max(col("id"))).head().getLong(0)
    val k = 12L
    val stride = math.max(1L, (maxId + 1) / k)
    val viaCount = KMeans.assignClustersByCount(vecs, k, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val viaStride = KMeans.assignClusters(vecs, stride, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(viaCount === viaStride)
    val exLo = intercept[IllegalArgumentException] {
      KMeans.assignClustersByCount(vecs, 0L, iters = 1)
    }
    assert(exLo.getMessage.contains("centroidCount"), s"$exLo")
    val exHi = intercept[IllegalArgumentException] {
      KMeans.assignClustersByCount(vecs, (4L << 20) + 1, iters = 1)
    }
    assert(exHi.getMessage.contains("centroidCount"), s"$exHi")
    // degenerate id domains refuse with the repo's curated-message
    // convention, not a raw NPE from a null max(id)
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Double])].toDF("id", "vec")
    val exEmpty = intercept[IllegalArgumentException] {
      KMeans.assignClustersByCount(empty, 4L, iters = 1)
    }
    assert(exEmpty.getMessage.contains("empty vectors"), s"$exEmpty")
    val negative = Seq((-7L, Array(0.1, 0.2)), (-3L, Array(0.3, 0.4)))
      .toDF("id", "vec")
    val exNeg = intercept[IllegalArgumentException] {
      KMeans.assignClustersByCount(negative, 2L, iters = 1)
    }
    assert(exNeg.getMessage.contains("non-negative id domain"), s"$exNeg")
  }
}
