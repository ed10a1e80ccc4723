package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected-components clustering over a similarity-pair graph — the step
  * that turns pairwise near-duplicate hits ([[Dedup.nearDupPairs]],
  * [[Dedup.jaccardJoin]], [[Similarity.cosinePairs]]) into dedup DECISIONS:
  * every document gets a cluster id (the minimum doc id of its component) and
  * the cluster's size, so "keep one canonical doc per near-dup cluster" is a
  * single filter (`doc_id = cluster_id`).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the published
  * shuffle-native CC formulation. Each round is two keyed groupBy/join
  * passes over the edge set; convergence is O(log n) rounds and the edge set
  * only shrinks toward the final star forest. Nothing is ever collected to
  * the driver except a per-round (count, checksum) pair for the fixed-point
  * test, so the operator holds at any corpus size: the shuffles are keyed on
  * node ids and the per-key fan-in is bounded by component degree, which
  * large-star itself keeps collapsing toward the component minimum.
  */
object Clusters {

  /** Connected components of the undirected graph given by `edges` (two
    * numeric/orderable columns; orientation, self-loops and duplicates are
    * normalized away). Returns (node, root) STAR EDGES: one row per non-root
    * node, `root` = the minimum node of its component. Roots and isolated
    * nodes do not appear — callers coalesce to self (see [[assign]]). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame =
    connectedComponentsManaged(edges, maxIter)._1

  /** [[connectedComponents]] plus a cleanup handle for the final persisted
    * edge frame (same contract as [[Dedup.nearDupPairsManaged]]): long-lived
    * sessions must invoke it after consuming the result; one-shot paths may
    * leave it to clearCache / process exit. */
  def connectedComponentsManaged(edges: DataFrame, maxIter: Int = 25): (DataFrame, () => Unit) = {
    // First two columns are the edge; extra columns (e.g. a pair frame's
    // `jac` score) are ignored — `toDF` alone would throw on the 3-column
    // frames ([[Dedup.nearDupPairs]], [[Dedup.jaccardJoin]]) this scaladoc
    // names as the intended inputs.
    require(edges.columns.length >= 2,
      s"connectedComponents needs two edge columns, got ${edges.columns.toSeq}")
    val in = edges.select(edges.columns.take(2).map(col): _*).toDF("u", "v")
    // Normalize: simple undirected edge set, canonically oriented u > v so
    // the fixed-point checksum is orientation-stable.
    var cur = in.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var state = checksum(cur)
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      // Lineage barrier: largeStar/smallStar reference their input 2× each,
      // so composing rounds grows the LOGICAL plan ~4× per iteration —
      // persist truncates execution but not analysis, and Catalyst goes
      // exponential by round ~8 (measured: minutes of driver CPU on a
      // 300-node chain). Re-wrapping the round's RDD in a flat LogicalRDD
      // keeps per-round plan size constant; execution cost is unchanged
      // (the persisted RDD backs both), which is the DataFrame analogue of
      // GraphX's periodic checkpoint in iterative algorithms.
      val round = smallStar(largeStar(cur))
      val next = edges.sparkSession.createDataFrame(round.rdd, round.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nextState = checksum(next)
      done = nextState == state
      cur.unpersist()
      cur = next
      state = nextState
      it += 1
    }
    if (!done) {
      cur.unpersist() // don't leak the round frame on the failure path
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"(graph needs O(log n) — raise maxIter for adversarially deep graphs)")
    }
    // At the fixed point every edge is (node, componentMin).
    (cur.select(col("u").as("node"), col("v").as("root")), () => { cur.unpersist(); () })
  }

  /** Per-round fixed-point certificate: edge count + order-insensitive hash
    * XOR (overflow-free under ANSI mode; the edge set is distinct, so XOR
    * cancellation needs a 64-bit collision). Two longs to the driver per
    * round — never the edges themselves. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Large-star: every node u connects its LARGER neighbors to the minimum of
    * its neighborhood (incl. itself) — long chains collapse exponentially. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.filter(col("v") > col("u"))
      .join(m, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: every node u connects its SMALLER-or-equal neighbors (and
    * itself) to the minimum of that set. Input/output are (u > v)-oriented. */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    val m = or.groupBy("u").agg(min(col("v")).as("m"))
    val rewired = or.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    rewired.union(m.select(col("u"), col("m").as("v"))).distinct()
  }

  /** Cluster assignment for a full id universe: label every id in `ids` with
    * its component minimum (itself when untouched by any pair) and the
    * component size. Output: (doc_id, cluster_id, cluster_size), one row per
    * input id. `pairs` is any two-column pair frame (e.g. doc_a/doc_b). */
  def assign(ids: DataFrame, pairs: DataFrame): DataFrame =
    assignManaged(ids, pairs)._1

  /** [[assign]] plus the cleanup handle for the CC iteration's final persisted
    * frame (the same managed contract as every other persist-backed operator
    * here): per-batch callers MUST invoke it after consuming the result, or
    * each batch pins one more frame in the block manager forever. */
  def assignManaged(ids: DataFrame, pairs: DataFrame): (DataFrame, () => Unit) = {
    val idCol = ids.columns.head
    val (stars, cleanup) = connectedComponentsManaged(pairs)
    val lab = ids.select(col(idCol).as("doc_id"))
      .join(stars.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
    // Sizes via groupBy+join (map-side combinable; AQE broadcasts the count
    // side when small) — not a window, which would sort the full frame.
    val sizes = lab.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    val out = lab.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    (out, cleanup)
  }
}
