package graft.llm

import org.apache.spark.sql.DataFrame
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
  * (out-degree 0) leak their mass — the simplest deterministic convention;
  * the oracle mirrors it.
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
    * Call the returned `release` when the result has been consumed. */
  def pageRankManaged(edges: DataFrame, iterations: Int,
                      dampingMicro: Long = 850000L): (DataFrame, () => Unit) = {
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
    val teleport = 1000000L - dampingMicro
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    for (_ <- 1 to iterations) {
      val sums = withDeg.join(ranks, col("src") === col("id"))
        .select(col("dst").as("id"), expr("rank_micro div deg").as("c"))
        .groupBy("id").agg(sum("c").as("s"))
      // loud overflow guard: s beyond 2^63/d would wrap the multiply
      val sLimit = if (dampingMicro == 0L) Long.MaxValue else Long.MaxValue / dampingMicro
      val sSafe = when(coalesce(col("s"), lit(0L)) <= sLimit, coalesce(col("s"), lit(0L)))
        .otherwise(raise_error(format_string(
          s"pageRank 64-bit overflow: node %s incoming sum %s exceeds 2^63/dampingMicro=$sLimit " +
            "micro-units — rescale ranks or reduce graph mass (hub-dominated graph past ~10^7 nodes)",
          col("id").cast("string"), col("s").cast("string"))).cast("long"))
      ranks = nodes.join(sums, Seq("id"), "left")
        .withColumn("_s_safe", sSafe)
        .select(col("id"),
          (lit(teleport) +
            expr(s"($dampingMicro * _s_safe) div 1000000")).as("rank_micro"))
    }
    (ranks, () => { withDeg.unpersist(); nodes.unpersist(); () })
  }

  /** [[pageRankManaged]] for one-shot use (caches released on session GC). */
  def pageRank(edges: DataFrame, iterations: Int,
               dampingMicro: Long = 850000L): DataFrame =
    pageRankManaged(edges, iterations, dampingMicro)._1
}
