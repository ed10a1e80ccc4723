package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's algorithm) over an embedding
  * column — the corpus-bucketing primitive behind cluster-balanced data
  * selection (DSIR-style domain buckets, SemDeDup's cell structure learned
  * instead of sampled, topic-stratified mixing).
  *
  * Everything runs in INTEGER MICRO-UNITS (each float component is quantized
  * once to `floor(x·1e6 + 0.5)` — the repo's micros determinism contract, cf.
  * [[Retrieval]]/[[LanguageModel]]): distances are exact 64-bit sums of
  * squares, centroid updates are exact integer sums with floor division, so
  * summation order cannot change any result and the DuckDB oracle reproduces
  * every iteration bit-for-bit. (Float k-means is famously
  * non-reproducible across partitionings — the mean's summation order leaks
  * into the centroids; integer arithmetic removes that whole failure class.)
  *
  * Scale posture (the 100 TB contract):
  *  - Initial centroids are a deterministic stride sample (the IVF contract
  *    of [[Similarity]]: metadata-scale by construction, clamped collect).
  *  - Per iteration: ONE corpus scan. Assignment is pure per-row expression
  *    work against a centroid LITERAL (an argmin fold inside the projection —
  *    never a join, never an N×K expansion through a shuffle). The update
  *    aggregates (cell, dim) partial sums — map-side combinable, shuffle
  *    volume ≤ #partitions · k · d rows, and the driver collect is k·d —
  *    metadata-scale at any corpus size.
  *  - The quantized frame is persisted across iterations (T scans of a
  *    columnar cache instead of T full text/parquet decodes).
  */
object KMeans {

  /** Micro-unit quantization of a float/double vector: ARRAY<BIGINT> of
    * `floor(x·1e6 + 0.5)` — floor(+0.5) instead of round() because floor has
    * identical semantics in every engine (round's half-case varies). */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))

  /** Exact integer dot product of two ARRAY<BIGINT> columns. */
  private def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Let-binding as a materialization barrier WITHOUT an exchange (see
    * [[Similarity]]'s note): binds `value` once per row so the distance
    * array is not re-evaluated by each consumer. */
  private def let(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Nearest centroid id by squared L2 distance, ties to the smallest cell
    * id. `centArr` is a literal ARRAY<STRUCT<_1: cell BIGINT, _2: cvec
    * ARRAY<BIGINT>, _3: |c|² BIGINT>> SORTED BY cell id; `cellIds` the
    * matching ARRAY<BIGINT> of ids. Uses the expansion
    * argmin ‖q−c‖² = argmin (‖c‖² − 2·q·c): ‖q‖² is constant per row and
    * ‖c‖² is precomputed driver-side, so scoring one centroid is a single
    * dot-product fold with no intermediate difference array. Exact integers
    * ⇒ the tie-set is identical to the oracle's plain Σ(q_i−c_i)²; argmin =
    * FIRST index of the array minimum, which under id-sorted centroids is
    * exactly the oracle's (distance ASC, cell ASC) row_number choice. */
  private def nearestCell(centArr: Column, cellIds: Column, qv: Column): Column =
    let(transform(centArr, ct =>
        ct.getField("_3") - lit(2L) * idot(qv, ct.getField("_2"))),
      ds => element_at(cellIds, array_position(ds, array_min(ds)).cast("int")))

  private def asLiteral(cents: Seq[(Long, Seq[Long])]): Column =
    typedlit(cents.map { case (id, cv) =>
      (id, cv, cv.foldLeft(0L)((a, x) => a + x * x))
    })

  private def idsLiteral(cents: Seq[(Long, Seq[Long])]): Column =
    typedlit(cents.map(_._1))

  /** `iters` Lloyd rounds from stride-sampled initial centroids; cluster
    * labels are the SEED vector ids (stable across rounds, like IVF cells).
    * Empty clusters keep their previous centroid. Returns
    * (id, cluster, cluster_size) — the assignment under the FINAL centroids.
    *
    * `vectors`: (id LONG, vec ARRAY<FLOAT|DOUBLE>). `centroidStride`: every
    * stride-th id seeds a cluster (fixed-stride calling convention, oracle-
    * mirrorable; scale callers size it so k stays metadata-scale). */
  def assignClusters(vectors: DataFrame, centroidStride: Long,
                     iters: Int): DataFrame =
    assignClustersManaged(vectors, centroidStride, iters)._1

  /** [[assignClusters]] plus the cleanup handle for the cached quantized
    * frame (same managed-persist contract as [[Dedup.jaccardJoin]]: the
    * final assignment still reads the cache, so unpersist AFTER the
    * consuming action; one-shot paths may ignore it). */
  def assignClustersManaged(vectors: DataFrame, centroidStride: Long,
                            iters: Int): (DataFrame, () => Unit) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val qvecs = vectors
      .select(col("id"), quantize(col("vec")).as("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    locally {
      // seed centroids: the quantized stride sample, sorted by id — the same
      // clamped-collect contract as Similarity's IVF header (metadata-scale)
      val seedRows = qvecs.filter(col("id") % centroidStride === 0)
        .limit(1 << 22).collect()
      require(seedRows.nonEmpty,
        s"kmeans: no id is a multiple of centroidStride=$centroidStride")
      require(seedRows.length < (1 << 22),
        s"kmeans: centroidStride=$centroidStride yields over ${1 << 22} " +
          "centroids — the centroid table must stay metadata-scale")
      var cents: Seq[(Long, Seq[Long])] = seedRows
        .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq

      for (_ <- 1 to iters) {
        // one corpus scan: per-row argmin, then (cell, dim) partial sums —
        // map-side combined to ≤ partitions·k·d rows before the shuffle
        val sums = qvecs
          .select(nearestCell(asLiteral(cents), idsLiteral(cents), col("qv")).as("cell"),
            posexplode(col("qv")).as(Seq("pos", "x")))
          .groupBy("cell", "pos")
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .collect()
        val byCell: Map[Long, Array[Row]] =
          sums.groupBy(_.getLong(0))
        cents = cents.map { case (cell, oldCv) =>
          byCell.get(cell) match {
            case Some(rows) =>
              val comp = rows.sortBy(_.getInt(1)).map(r =>
                Math.floorDiv(r.getLong(2), r.getLong(3)))
              (cell, comp.toSeq)
            case None => (cell, oldCv) // starved cluster: centroid stands
          }
        }
      }

      val assigned = qvecs
        .select(col("id"), nearestCell(asLiteral(cents), idsLiteral(cents), col("qv")).as("cluster"))
      val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
      // k-row size frame: AQE broadcasts it; no hint needed
      val out = assigned.join(sizes, "cluster")
        .select(col("id"), col("cluster"), col("cluster_size"))
      (out, () => { qvecs.unpersist(); () })
    }
  }
}
