package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics for corpus curation. Web-corpus recipes weight a
  * page's quality by its link-graph standing (Common Crawl publishes
  * harmonic-centrality/PageRank rankings for exactly this use); here the
  * classic damped PageRank is expressed Spark-first with the repo's
  * determinism contract: EXACT integer micro-units, so a rank is the same
  * bits at any partitioning, on any engine — float PageRank diverges
  * across reduction orders, which is why a rank-threshold filter over a
  * float implementation is not reproducible.
  *
  * Per iteration: rank'(v) = (10^6 − d) + (d · Σ_{u→v} (rank(u) div
  * out(u))) div 10^6, all in BIGINT (`div` truncation — identical to
  * DuckDB's `//` floor for these non-negative values). Dangling nodes
  * (out-degree 0) leak their mass by default — the simplest deterministic
  * convention; the oracle mirrors it — or, with `redistributeDangling`,
  * are redistributed mass-conservingly (integer share per node).
  *
  * Overflow bound (hub-dominated worst case, i.e. real web graphs): the
  * total rank mass is ≤ N·10^6 micro-units, and a mega-hub can receive
  * almost all of it in one node's incoming sum `s`, so the `d·s` multiply
  * wraps signed 64-bit when s > 2^63/d ≈ 1.08·10^13 (d = 0.85·10^6) —
  * reached around N ≈ 10^7 nodes on a star graph. NOT 10^12: that earlier
  * claim divided the bound by the damping factor once too often. The
  * multiply is therefore guarded per-row with a loud `raise_error` —
  * codegen-cheap (one comparison per node per iteration), no extra driver
  * action, and it fails at the exact overflowing node instead of producing
  * silently wrapped ranks. (The SUM itself would need ~10^13 hub in-edges
  * to wrap, five orders beyond the guarded multiply, so the guard fires
  * first on any reachable input.)
  *
  * Scale shape: one out-degree aggregate up front; each iteration is ONE
  * rank-keyed equi-join (edges ⋈ ranks on src) + ONE dst-keyed sum with
  * map-side partial aggregation — the join/agg pair every Pregel-style
  * system runs. A FIXED iteration count keeps the whole computation a
  * single lazy DAG (no per-round action), and the edge+degree frame is
  * persisted because every round rescans it — at 100 TB that persist is
  * the difference between 1 and `iterations` parquet passes. The logical
  * plan stays linear in rounds (each round references the previous once),
  * so no [[Clusters]]-style flat-RDD rewrap is needed. */
object Graph {

  /** PageRank over a directed (src, dst) edge list; extra columns ignored.
    * Returns (id, rank_micro) for every node appearing as a src or dst.
    * Call the returned `release` when the result has been consumed.
    *
    * `redistributeDangling = true` switches the dangling convention from
    * mass LEAK (the default, mirrored by the q74 oracle) to the classic
    * mass-conserving redistribution: each round, the summed rank of
    * out-degree-0 nodes is divided (integer `div`, truncating) by the node
    * count and the share added to EVERY node's incoming sum before damping.
    * "Mass-conserving" holds up to integer truncation: the per-node share is
    * `dangling_mass div N`, so each round drops the division remainder —
    * at most N−1 micro-units per round (< 1 millionth of one node's unit
    * rank), deterministic, and bounded by iterations·(N−1) total; asserted
    * in GraphSpec. Still exact-integer and partition-independent; the
    * redistribution adds one anti-join + two 1-row aggregates per round
    * (lazy — broadcast into the rank update, never a driver action). */
  def pageRankManaged(edges: DataFrame, iterations: Int,
                      dampingMicro: Long = 850000L,
                      redistributeDangling: Boolean = false): (DataFrame, () => Unit) = {
    val (last, _, release) =
      pageRankFrames(edges, iterations, dampingMicro, redistributeDangling)
    (last, release)
  }

  /** The shared iteration loop: returns the final ranks, the PREVIOUS
    * round's ranks (same lazy lineage — retaining the frame costs nothing),
    * and the cache release. */
  private def pageRankFrames(edges: DataFrame, iterations: Int,
                             dampingMicro: Long,
                             redistributeDangling: Boolean)
      : (DataFrame, DataFrame, () => Unit) = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1,100], got $iterations")
    require(dampingMicro >= 0L && dampingMicro <= 1000000L,
      s"dampingMicro must be in [0, 10^6], got $dampingMicro")
    require(edges.columns.length >= 2,
      s"pageRank needs (src, dst) columns, got ${edges.columns.toSeq}")
    val e = edges.select(edges.columns.take(2).map(col): _*).toDF("src", "dst")
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val withDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val srcs = withDeg.select(col("src").as("id")).distinct()
    val nodeCount = nodes.agg(count(lit(1)).as("__n"))
    val teleport = 1000000L - dampingMicro
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    var prevRanks = ranks
    for (_ <- 1 to iterations) {
      prevRanks = ranks
      val sums = withDeg.join(ranks, col("src") === col("id"))
        .select(col("dst").as("id"), expr("rank_micro div deg").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      // per-node share of this round's dangling mass (1-row frame, broadcast)
      val base = nodes.join(sums, Seq("id"), "left")
      val withShare =
        if (!redistributeDangling) base.withColumn("__share", lit(0L))
        else base.crossJoin(broadcast(
          ranks.join(srcs, Seq("id"), "left_anti")
            .agg(coalesce(sum("rank_micro"), lit(0L)).as("__dmass"))
            .crossJoin(nodeCount)
            .select(expr("__dmass div __n").as("__share"))))
      // loud overflow guard: s beyond 2^63/d would wrap the multiply
      val sLimit = if (dampingMicro == 0L) Long.MaxValue else Long.MaxValue / dampingMicro
      val sIn = coalesce(col("s"), lit(0L)) + col("__share")
      val sSafe = when(sIn <= sLimit, sIn)
        .otherwise(raise_error(format_string(
          s"pageRank 64-bit overflow: node %s incoming sum %s exceeds 2^63/dampingMicro=$sLimit " +
            "micro-units — rescale ranks or reduce graph mass (hub-dominated graph past ~10^7 nodes)",
          // format sIn — the value actually compared against sLimit — not the
          // pre-share nullable col("s"), which would print a misleading value
          // (e.g. "null") when the overflow came from s + __share
          col("id").cast("string"), sIn.cast("string"))).cast("long"))
      ranks = withShare
        .withColumn("_s_safe", sSafe)
        .select(col("id"),
          (lit(teleport) +
            expr(s"($dampingMicro * _s_safe) div 1000000")).as("rank_micro"))
    }
    (ranks, prevRanks, () => { withDeg.unpersist(); nodes.unpersist(); () })
  }

  /** [[pageRankManaged]] for one-shot use (caches released on session GC). */
  def pageRank(edges: DataFrame, iterations: Int,
               dampingMicro: Long = 850000L,
               redistributeDangling: Boolean = false): DataFrame =
    pageRankManaged(edges, iterations, dampingMicro, redistributeDangling)._1

  /** Exact bounded-depth HARMONIC CENTRALITY — the other link-graph quality
    * signal web-corpus recipes actually use (Common Crawl publishes harmonic
    * centrality as its primary host ranking): H_R(v) = Σ_{u, 0 < dist(u→v) ≤ R}
    * 1/dist(u→v), over shortest directed distances. Exact and integer-only:
    * the unit is 1/60 (60 = lcm(1..6)), so a node at distance d contributes
    * `60/d` exactly — no floats, bit-identical at any partitioning and in
    * the DuckDB oracle. Self-distances are excluded (dist(v,v)=0 by
    * definition).
    *
    * Shape: BFS frontier labeling — level d's frontier is the DISTINCT
    * (u, v) pairs first reachable in exactly d hops (an equi-join of the
    * previous frontier with the edge list, anti-joined against everything
    * seen). Each level is one join + distinct + anti-join, all hash
    * shuffles on the pair key; frontiers/seen-set are persisted because
    * each level rescans them.
    *
    * Scale contract (be honest about what "exact" costs): the seen-set
    * materializes every within-R ball, O(Σ_v |ball_R(v)|) pairs — fine for
    * bounded R on sparse corpus graphs (out-degree ~links-per-doc), and the
    * right price when the result must be reproducible/oracle-checkable. On
    * a dense web graph at R ≥ 4 the balls approach N² and the exact form is
    * the wrong tool — that regime belongs to register-sketch neighborhood
    * estimation (HyperBall, Boldi & Vigna 2013), which trades the oracle
    * contract for O(N·2^p) state. */
  def harmonicCentralityManaged(edges: DataFrame, maxDepth: Int)
      : (DataFrame, () => Unit) = {
    require(maxDepth >= 1 && maxDepth <= 6,
      s"maxDepth must be in [1,6] (unit is 1/60 = 1/lcm(1..6)), got $maxDepth")
    require(edges.columns.length >= 2,
      s"harmonicCentrality needs (src, dst) columns, got ${edges.columns.toSeq}")
    val scale = 60L
    // reachability ignores edge multiplicity: dedupe up front
    val e = edges.select(edges.columns.take(2).map(col): _*).toDF("src", "dst")
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame](e, nodes)
    var frontier = e.filter(col("src") =!= col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    persisted += frontier
    var seen = frontier
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame](
      frontier.groupBy("v").agg((count(lit(1)) * lit(scale)).as("w")))
    for (d <- 2 to maxDepth) {
      // frontier derives from e — alias both sides so the self-join lineage
      // resolves unambiguously
      val expanded = frontier.as("f").join(e.as("g"), col("f.v") === col("g.src"))
        .select(col("f.u").as("u"), col("g.dst").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val next = expanded.join(seen, Seq("u", "v"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      persisted += next
      levels += next.groupBy("v").agg((count(lit(1)) * lit(scale / d)).as("w"))
      seen = seen.union(next).persist(StorageLevel.MEMORY_AND_DISK)
      persisted += seen
      frontier = next
    }
    val har = levels.reduce(_ union _).groupBy("v").agg(sum("w").as("harmonic_x60"))
    val out = nodes.join(har, nodes("id") === har("v"), "left")
      .select(col("id"), coalesce(col("harmonic_x60"), lit(0L)).as("harmonic_x60"))
    (out, () => { persisted.foreach(_.unpersist()); () })
  }

  /** [[harmonicCentralityManaged]] for one-shot use. */
  def harmonicCentrality(edges: DataFrame, maxDepth: Int): DataFrame =
    harmonicCentralityManaged(edges, maxDepth)._1

  // ------------------------------------------------------------- HyperBall

  /** Build-a-rank chain: leading-position rank of `w` within `bits` bits —
    * 1 if the top bit is set, …, `bits + 1` if w = 0 (the HLL register
    * value). Pure integer comparisons (a when-chain the codegen flattens);
    * no float log, so ranks are exact on any engine. */
  private def clzRank(w: Column, bits: Int): Column =
    (1 to bits).foldRight(lit(bits + 1): Column) { (r, tail) =>
      // rank r ⇔ w's highest set bit is bit (bits − r)
      when(w >= (1L << (bits - r)), lit(r)).otherwise(tail)
    }

  /** Register-wise max — the HLL/HyperBall union. Commutative/associative,
    * so partial aggregation applies and results are partition-independent. */
  private val regMax: org.apache.spark.sql.expressions.Aggregator[Seq[Int], Array[Int], Seq[Int]] =
    new org.apache.spark.sql.expressions.Aggregator[Seq[Int], Array[Int], Seq[Int]] {
      def zero: Array[Int] = Array.emptyIntArray
      private def mergeInto(b: Array[Int], a: Seq[Int]): Array[Int] =
        if (b.isEmpty) a.toArray
        else { var i = 0; while (i < b.length) { if (a(i) > b(i)) b(i) = a(i); i += 1 }; b }
      def reduce(b: Array[Int], a: Seq[Int]): Array[Int] = mergeInto(b, a)
      def merge(x: Array[Int], y: Array[Int]): Array[Int] =
        if (x.isEmpty) y else mergeInto(x, y)
      def finish(b: Array[Int]): Seq[Int] = b.toSeq
      def bufferEncoder: org.apache.spark.sql.Encoder[Array[Int]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
      def outputEncoder: org.apache.spark.sql.Encoder[Seq[Int]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
    }

  /** HyperBall (Boldi & Vigna 2013): APPROXIMATE harmonic centrality for the
    * dense/deep regime where [[harmonicCentralityManaged]]'s exact pair
    * materialization is the wrong tool. Per node, a 2^p-register HLL sketch
    * of its in-ball; per round, every edge (u → v) merges u's ball into v's
    * — ONE equi-join + ONE register-wise-max aggregate over O(N·2^p) state,
    * independent of ball sizes. H(v) ≈ Σ_d (|B_d| − |B_{d−1}|)/d from the
    * per-round HLL estimates (linear-counting small-range correction, the
    * relevant regime at bounded depth).
    *
    * Determinism: registers derive from [[graft.functions.Sketch.hash60]]
    * (md5) via exact integer rank extraction — the REGISTERS are
    * bit-identical at any partitioning (the max-merge is commutative); the
    * float estimator is a pure function of them, so estimates are
    * reproducible too (just not oracle-hash-checkable — this operator's
    * contract is error-bounded approximation, spec-verified against the
    * exact form; keep q76 for exactness).
    *
    * Returns (id, harmonic_est DOUBLE, ball_est DOUBLE = |B_maxDepth|). */
  def hyperBallHarmonicManaged(edges: DataFrame, maxDepth: Int, p: Int = 10)
      : (DataFrame, () => Unit) = {
    val (balls, release) = ballLoop(edges, maxDepth, p)
    val m = 1 << p

    // HLL estimate from a register array — native expressions only. Raw
    // harmonic-mean estimate with the linear-counting small-range branch.
    def estimate(regs: Column): Column = {
      val alpha = if (m == 16) 0.673 else if (m == 32) 0.697
        else if (m == 64) 0.709 else 0.7213 / (1 + 1.079 / m)
      val raw = lit(alpha * m * m) /
        aggregate(regs, lit(0.0d), (acc, r) => acc + pow(lit(2.0d), -r.cast("double")))
      val zeros = size(filter(regs, r => r === 0)).cast("double")
      when(raw <= 2.5 * m && zeros > 0, lit(m.toDouble) * log(lit(m.toDouble) / zeros))
        .otherwise(raw)
    }

    val estFrames = balls.zipWithIndex.map { case (b, d) =>
      b.select(col("id"), estimate(col("regs")).as(s"e$d"))
    }
    val joined = estFrames.reduce((a, b) => a.join(b, Seq("id")))
    val harmonic = (1 to maxDepth).map(d =>
        greatest(col(s"e$d") - col(s"e${d - 1}"), lit(0.0d)) / lit(d.toDouble))
      .reduce(_ + _)
    val out = joined.select(col("id"), harmonic.as("harmonic_est"),
      col(s"e$maxDepth").as("ball_est"))
    (out, release)
  }

  /** The EXACT-INTEGER face of HyperBall, built for oracle gating: the final
    * depth-`maxDepth` register state per node, reduced to two BIGINTs — the
    * register SUM and the zero-register count (the linear-counting
    * numerator). The registers are pure integer functions of the in-ball
    * membership set (md5-derived index/rank, commutative max-merge), so both
    * columns are bit-identical at any partitioning AND reproducible by an
    * independent engine from the same reachability sets — unlike the float
    * estimate, which stays spec-only. Same plan shape and cost as the
    * estimator: one equi-join + one register-max aggregate per depth over
    * O(N·2^p) state. */
  def hyperBallRegistersManaged(edges: DataFrame, maxDepth: Int, p: Int = 10)
      : (DataFrame, () => Unit) = {
    val (balls, release) = ballLoop(edges, maxDepth, p)
    val out = balls.last.select(col("id"),
      aggregate(col("regs"), lit(0L), (acc, r) => acc + r.cast("long")).as("reg_sum"),
      size(filter(col("regs"), r => r === 0)).cast("long").as("zero_regs"))
    (out, release)
  }

  /** The shared HyperBall iteration: per-depth ball register frames
    * B_0 … B_maxDepth (each persisted — every depth is rescanned by the
    * next and consumed by the caller) and the cache release. */
  private def ballLoop(edges: DataFrame, maxDepth: Int, p: Int)
      : (Seq[DataFrame], () => Unit) = {
    require(maxDepth >= 1 && maxDepth <= 16,
      s"maxDepth must be in [1,16], got $maxDepth")
    require(p >= 4 && p <= 14, s"register exponent p must be in [4,14], got $p")
    val m = 1 << p
    val rankBits = 60 - p
    val e = edges.select(edges.columns.take(2).map(col): _*).toDF("src", "dst")
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame](e)
    val regMaxUdaf = udaf(regMax)

    // B_0(v) = {v}: one register set per node from its own hash
    val h = graft.functions.Sketch.hash60(col("id"))
    val idx = pmod(h, lit(m.toLong)).cast("int")
    val rank = clzRank(call_function("shiftrightunsigned", h, lit(p)), rankBits)
    var balls = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct()
      .select(col("id"),
        transform(sequence(lit(0), lit(m - 1)),
          j => when(j === idx, rank).otherwise(lit(0))).as("regs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    persisted += balls
    val perDepth = scala.collection.mutable.ArrayBuffer[DataFrame](balls)
    for (_ <- 1 to maxDepth) {
      val contrib = e.join(balls, e("src") === balls("id"))
        .select(e("dst").as("id"), balls("regs").as("regs"))
      val merged = contrib.union(balls.select(col("id"), col("regs")))
        .groupBy("id").agg(regMaxUdaf(col("regs")).as("regs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      persisted += merged
      balls = merged
      perDepth += balls
    }
    (perDepth.toSeq, () => { persisted.foreach(_.unpersist()); () })
  }

  /** [[hyperBallHarmonicManaged]] for one-shot use. */
  def hyperBallHarmonic(edges: DataFrame, maxDepth: Int, p: Int = 10): DataFrame =
    hyperBallHarmonicManaged(edges, maxDepth, p)._1

  /** [[hyperBallRegistersManaged]] for one-shot use. */
  def hyperBallRegisters(edges: DataFrame, maxDepth: Int, p: Int = 10): DataFrame =
    hyperBallRegistersManaged(edges, maxDepth, p)._1

  /** [[pageRankManaged]] plus a CONVERGENCE CERTIFICATE: a 1-row frame
    * `(max_abs_delta_micro)` — the largest per-node |rank − previous-round
    * rank| — so a caller can assert "converged to within ε" as data instead
    * of trusting an iteration count. Cost: consuming the certificate
    * evaluates the (N−1)-round lineage alongside the N-round one (both over
    * the SAME persisted edge/degree frame — no extra parquet passes);
    * callers who consume ranks AND certificate should persist `ranks`
    * first or accept the recompute. */
  def pageRankCertified(edges: DataFrame, iterations: Int,
                        dampingMicro: Long = 850000L,
                        redistributeDangling: Boolean = false)
      : (DataFrame, DataFrame, () => Unit) = {
    val (last, prev, release) =
      pageRankFrames(edges, iterations, dampingMicro, redistributeDangling)
    val cert = last.join(prev.withColumnRenamed("rank_micro", "__prev"), Seq("id"))
      .agg(max(abs(col("rank_micro") - col("__prev"))).as("max_abs_delta_micro"))
    (last, cert, release)
  }
}
