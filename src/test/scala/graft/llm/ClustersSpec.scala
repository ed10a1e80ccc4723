package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Connected-components correctness: large-star/small-star must reach the
  * exact component minima of a BFS oracle on seeded random graphs, converge
  * on adversarial shapes (long chains — the worst case for star rounds), and
  * assign component sizes correctly over a full id universe. */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find oracle (test-only; the operator never does this). */
  private def oracle(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v)); if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def run(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ids = spark.range(n).toDF("doc_id")
    val pairs = edges.toDF("doc_a", "doc_b")
    val got = Clusters.assign(ids, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n, "one row per input id")
    got
  }

  test("seeded random graphs match a union-find oracle exactly") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 60L + trial * 10
      val edges = Seq.fill(30 + rnd.nextInt(40))(
        (rnd.nextLong(n).abs % n, rnd.nextLong(n).abs % n)).filter(e => e._1 != e._2)
      val exp = oracle(n, edges)
      assert(run(n, edges) === exp, s"trial $trial: labels must equal component minima")
    }
  }

  test("long chain converges in O(log n) star rounds") {
    val n = 300L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val got = run(n, chain)
    assert(got.values.forall(_ == 0L), "a single chain is one component rooted at 0")
  }

  test("isolated nodes, self-loops, duplicate and reversed edges are handled") {
    val got = run(10, Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 1L), (7L, 8L)))
    assert(got(1L) == 1L && got(2L) == 1L && got(7L) == 7L && got(8L) == 7L)
    assert(got(0L) == 0L && got(5L) == 5L, "untouched ids label themselves")
  }

  test("cluster sizes count every member including the root") {
    val ids = spark.range(6).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("a", "b")
    val rows = Clusters.assign(ids, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.toSeq === Seq((0L, 0L, 3L), (1L, 0L, 3L), (2L, 0L, 3L),
      (3L, 3L, 1L), (4L, 4L, 2L), (5L, 4L, 2L)))
  }

  test("cross-partition components: the partition-local seed must not stop " +
    "early on partial stars (one component spread over many partitions)") {
    // one long chain repartitioned so every partition holds a scattered
    // slice of the SAME component — the seeded state is many local stars
    // that the certificate must reject until the global rounds merge them
    val n = 200L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val ids = spark.range(n).toDF("doc_id")
    val pairs = chain.toDF("doc_a", "doc_b").repartition(16)
    val got = Clusters.assign(ids, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L), "one component rooted at its minimum")
  }

  test("non-integral (string) ids take the unseeded round loop and still " +
    "reach component minima") {
    val ids = Seq("a", "b", "c", "d", "e").toDF("doc_id")
    val pairs = Seq(("b", "a"), ("c", "b"), ("e", "d")).toDF("x", "y")
    val got = Clusters.assign(ids, pairs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("a", "a", 3L), ("b", "a", 3L), ("c", "a", 3L),
      ("d", "d", 2L), ("e", "d", 2L)))
  }

  test("managed handle unpersists the final edge frame") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val before = spark.sparkContext.getPersistentRDDs.size
    val (stars, cleanup) = Clusters.connectedComponentsManaged(edges)
    assert(stars.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((2L, 1L), (3L, 1L)))
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "the fixed-point frame is persisted while the result is live")
    cleanup()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "cleanup must release every persist the operator took")
  }
}
