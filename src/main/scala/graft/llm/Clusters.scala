package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
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
  * the driver except per-round metadata-scale certificate values — never the
  * edges themselves — so the operator holds at any corpus size: the shuffles
  * are keyed on node ids and the per-key fan-in is bounded by component
  * degree, which large-star itself keeps collapsing toward the minimum.
  *
  * Two structural accelerators (r15 — the global-round count, not the
  * per-round plan, was the measured cost: each round is ~6 exchanges of
  * fixed job overhead that dominates wall-clock long after the edge data
  * stops mattering):
  *
  *  - SEED: a partition-local union–find pass (`mapPartitions`, a
  *    documented dense-kernel carve-out) replaces each partition's edge set
  *    with its local min-rooted star forest BEFORE any global round. This
  *    preserves components exactly (a spanning star forest of each
  *    partition-local subgraph) while collapsing every within-partition
  *    chain to depth 1 — real near-dup graphs (many small clusters) often
  *    arrive fully solved, and adversarially deep graphs still converge in
  *    the usual O(log n) rounds over far fewer edges. Applied only when
  *    both edge columns share an integral type (the union–find keys on
  *    primitive longs); other orderable types skip the seed and take the
  *    unmodified round loop.
  *  - CERTIFICATE: convergence is detected by a STRUCTURAL star-forest
  *    test on the current edge set — every child has exactly one root
  *    (count == distinct children) and no root is also a child (empty
  *    semi-join) — instead of comparing round-over-round checksums. A star
  *    forest is provably a fixed point of largeStar∘smallStar (and the
  *    orientation invariant u > v forces every star's root to be its
  *    component minimum), so the certificate is exact — no hash-collision
  *    caveat — and it saves the entire final confirm round the checksum
  *    protocol needed, plus the whole loop when the seed already solved
  *    the graph.
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
    val (stars, cleanup, _) = connectedComponentsManagedProbed(edges, None, maxIter)
    (stars, cleanup)
  }

  /** [[connectedComponentsManaged]] with an optional caller-supplied SIDE
    * AGGREGATE riding the FIRST convergence certificate: `firstSide` must be
    * a one-row aggregate frame (enforce with a final `.agg(...)`); it is
    * cross-joined (1-row × 1-row) into the first certificate's plan so the
    * caller's probe shares that action's whole scheduling envelope instead
    * of paying its own (guide §1.2 — at micro-batch scale the envelope IS
    * the cost; graft.app.Intake rides its novelty bucket-stats here).
    * Returns the first certificate Row as well: columns 0..2 are the
    * certificate's (n, d, bad) — `n` is the COUNT OF SEEDED EDGES, so n == 0
    * iff the input had no effective edges — and columns 3+ are `firstSide`'s
    * columns in order. Side evaluation is EXACTLY-ONCE and unconditional;
    * it must be pure. */
  def connectedComponentsManagedProbed(edges: DataFrame,
                                       firstSide: Option[DataFrame],
                                       maxIter: Int = 25)
      : (DataFrame, () => Unit, org.apache.spark.sql.Row) = {
    // First two columns are the edge; extra columns (e.g. a pair frame's
    // `jac` score) are ignored — `toDF` alone would throw on the 3-column
    // frames ([[Dedup.nearDupPairs]], [[Dedup.jaccardJoin]]) this scaladoc
    // names as the intended inputs.
    require(edges.columns.length >= 2,
      s"connectedComponents needs two edge columns, got ${edges.columns.toSeq}")
    val in = edges.select(edges.columns.take(2).map(col): _*).toDF("u", "v")
    val loopless = in.filter(col("u") =!= col("v"))
    // Normalize to a distinct, canonically (u > v)-oriented simple edge set.
    // With an integral id type the union–find seed runs FIRST (it tolerates
    // duplicates/orientation and emits min-rooted local stars, already
    // oriented), so only one distinct shuffle runs either way.
    val seeded = localStarSeed(loopless)
      .getOrElse(loopless.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ENTRY barrier (graft.plans.Barrier contract): the caller's edge frame
    // is often a DEEP composition (jaccardJoin / nearDupPairs /
    // semanticPairs pipelines), and every driver action here — the
    // certificate's two, plus the first round's — would re-run Catalyst
    // ANALYSIS of that whole plan even with the persist hot. `backed`
    // tracks the frame that actually holds the cache (cur is its flat view
    // until the first round replaces both).
    var backed = seeded
    var cur = graft.plans.Barrier.flatten(seeded)
    var it = 0
    val firstRow = starProbe(cur, firstSide)
    var star = isStar(firstRow)
    while (!star && it < maxIter) {
      // Round barrier (graft.plans.Barrier): largeStar/smallStar reference
      // their input 2× each, so composing rounds grows the LOGICAL plan ~4×
      // per iteration and Catalyst goes exponential by round ~8 (measured:
      // minutes of driver CPU on a 300-node chain). Flattening each round
      // keeps per-round plan size constant.
      val round = smallStar(largeStar(cur))
      val next = graft.plans.Barrier.flatten(round)
        .persist(StorageLevel.MEMORY_AND_DISK)
      star = isStar(starProbe(next, None))
      backed.unpersist()
      backed = next
      cur = next
      it += 1
    }
    if (!star) {
      backed.unpersist() // don't leak the round frame on the failure path
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"(graph needs O(log n) — raise maxIter for adversarially deep graphs)")
    }
    // At the star-forest fixed point every edge is (node, componentMin).
    (cur.select(col("u").as("node"), col("v").as("root")),
      () => { backed.unpersist(); () }, firstRow)
  }

  /** Structural convergence certificate: the edge set is a min-rooted star
    * forest iff every child appears exactly once (count == distinct u) and
    * no root is also a child (the v→u semi-join is empty). A star forest is
    * a fixed point of the round (largeStar and smallStar both map a star to
    * itself), and the maintained u > v orientation forces each star's root
    * below all its children, i.e. the component minimum — so accepting here
    * IS accepting the correct final state, with no hash-collision caveat.
    * The probe is ONE action that also materializes the persist. */
  private def starProbe(e: DataFrame, side: Option[DataFrame]): org.apache.spark.sql.Row = {
    // ONE action for both tests (each driver action costs a full analysis +
    // scheduling envelope — at micro-graph scale that envelope IS the cost):
    // the child-uniqueness counts and the root-is-also-a-child probe ride a
    // single plan via a 1-row × 1-row cross join. The emptiness side keeps
    // its limit-1 short circuit. A caller's one-row side aggregate rides
    // the same plan the same way (columns 3+ of the returned Row).
    val cert = e.agg(count(lit(1)).as("n"), count_distinct(col("u")).as("d"))
      .crossJoin(
        e.select("v").join(e.select(col("u").as("v")), Seq("v"), "left_semi")
          .limit(1).agg(count(lit(1)).as("bad")))
    side.fold(cert)(cert.crossJoin(_)).head()
  }

  private def isStar(r: org.apache.spark.sql.Row): Boolean =
    r.getLong(0) == r.getLong(1) && r.getLong(2) == 0L

  /** Partition-local union–find seed: replace each partition's edge multiset
    * with the min-rooted star forest of its local subgraph — exact component
    * preservation (a spanning star forest per partition; the global union
    * over partitions therefore has the same components as the input), in one
    * narrow pass. Only for integral id types (keys on primitive longs; the
    * per-partition map is partition-sized, the standard local-aggregation
    * memory bound). Output is (u > v)-oriented by construction (roots are
    * local minima) but MAY repeat an edge across partitions — callers
    * distinct() it. Returns None when the id type isn't integral. */
  private def localStarSeed(e: DataFrame): Option[DataFrame] = {
    val Seq(tu, tv) = e.schema.fields.take(2).map(_.dataType).toSeq
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    if (tu != tv || !integral(tu)) None
    else {
      val spark = e.sparkSession
      import spark.implicits._
      val seeded = e
        .select(col("u").cast("long"), col("v").cast("long")).as[(Long, Long)]
        .mapPartitions { it =>
          val parent = new java.util.HashMap[Long, Long]()
          def rootOf(x: Long): Long = {
            var r = x
            while (parent.getOrDefault(r, r) != r) r = parent.get(r)
            var c = x // path compression: point the walked chain at the root
            while (parent.getOrDefault(c, c) != r) {
              val nxt = parent.get(c); parent.put(c, r); c = nxt
            }
            r
          }
          it.foreach { case (a, b) =>
            val ra = rootOf(a); val rb = rootOf(b)
            if (ra < rb) parent.put(rb, ra)
            else if (rb < ra) parent.put(ra, rb)
          }
          val ks = parent.keySet().iterator()
          new Iterator[(Long, Long)] {
            def hasNext: Boolean = ks.hasNext
            def next(): (Long, Long) = { val k = ks.next(); (k, rootOf(k)) }
          }
        }
        .toDF("u", "v")
      // cast back so downstream joins/outputs keep the caller's id type
      Some(seeded.select(col("u").cast(tu).as("u"), col("v").cast(tv).as("v")))
    }
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
    val (out, cleanup, _) = assignManagedProbed(ids, pairs, None)
    (out, cleanup)
  }

  /** [[assignManaged]] through [[connectedComponentsManagedProbed]]: the
    * caller's one-row `firstSide` aggregate rides the first convergence
    * certificate's action, and the certificate Row comes back (its column 0
    * is the seeded edge count — 0 iff `pairs` was effectively empty, letting
    * a caller take an output-identical no-pairs shortcut without a separate
    * emptiness action). */
  def assignManagedProbed(ids: DataFrame, pairs: DataFrame,
                          firstSide: Option[DataFrame])
      : (DataFrame, () => Unit, org.apache.spark.sql.Row) = {
    val idCol = ids.columns.head
    val (stars, cleanup, firstRow) =
      connectedComponentsManagedProbed(pairs, firstSide)
    val lab = ids.select(col(idCol).as("doc_id"))
      .join(stars.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
    // Sizes via groupBy+join (map-side combinable; AQE broadcasts the count
    // side when small) — not a window, which would sort the full frame.
    val sizes = lab.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    val out = lab.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    (out, cleanup, firstRow)
  }
}
