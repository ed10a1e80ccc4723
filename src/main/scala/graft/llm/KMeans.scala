package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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
  * every iteration bit-for-bit. (Float k-means is famously non-reproducible
  * across partitionings — the mean's summation order leaks into the
  * centroids; integer arithmetic removes that whole failure class.)
  *
  * Implementation note — why an imperative kernel and not a Column fold:
  * the distance argmin is a DENSE NUMERIC KERNEL (N·k·d fused
  * multiply-adds). Catalyst higher-order functions are CodegenFallback —
  * each lambda step evaluates interpreted with boxed Longs — and the
  * measured cost at sf0.1 (5k vectors × 125 centroids × 64 dims) was
  * ~10 s PER PASS, ~200× the arithmetic's cost. This is exactly the
  * "genuine per-partition imperative logic" carve-out (like [[Multimodal]]'s
  * codec boundary and [[graft.functions.Sketch]]'s KMV partial, and the same
  * shape as Spark MLlib's own KMeans): centroids travel as a BROADCAST,
  * each partition runs a primitive-array loop and emits k pre-combined
  * partial sums, and the driver reduces k·P metadata-scale rows. Exact
  * integer math keeps oracle parity bit-for-bit.
  *
  * Scale posture (the 100 TB contract):
  *  - Initial centroids are a deterministic stride sample (the IVF contract
  *    of [[Similarity]]: metadata-scale by construction, clamped collect).
  *  - Per iteration: ONE pass over the cached quantized frame; shuffle
  *    volume is ZERO (partials come back through the collect, k·d·P longs —
  *    metadata-scale at any corpus size); the only shuffled stage in the
  *    whole operator is the final k-row cluster-size attach.
  *  - The quantized frame is persisted across iterations (T scans of a
  *    columnar cache instead of T full parquet decodes).
  */
object KMeans {

  /** Micro-unit quantization of a float/double vector: ARRAY<BIGINT> of
    * `floor(x·1e6 + 0.5)` — floor(+0.5) instead of round() because floor has
    * identical semantics in every engine (round's half-case varies). */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))

  /** Nearest centroid by exact integer squared L2; ties break to the FIRST
    * entry, so `cents` must be sorted by cell id — the oracle's
    * (distance ASC, cell ASC) row_number choice. Tight primitive-array loop:
    * this runs N·k times per pass. */
  private def bestCell(cents: Array[(Long, Array[Long])], v: Array[Long]): Long = {
    var best = 0L
    var bestD = Long.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)._2
      var d = 0L
      var j = 0
      while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = cents(i)._1 }
      i += 1
    }
    best
  }

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

  /** [[assignClusters]] under the COUNT contract (the scale-proof calling
    * convention, mirroring [[Similarity]]'s IVF header): the caller fixes a
    * centroid COUNT and the stride is derived from the corpus's max id —
    * one metadata-scale aggregate — so the driver-side seed collect stays
    * O(count) at ANY corpus size, where a fixed stride is O(N/stride) and
    * unbounded at 100×. Deterministic: the same corpus always derives the
    * same stride, hence the same cell structure. */
  def assignClustersByCount(vectors: DataFrame, centroidCount: Long,
                            iters: Int): DataFrame = {
    require(centroidCount > 0 && centroidCount <= Similarity.MaxCentroids,
      s"kmeans: centroidCount must be in (0, ${Similarity.MaxCentroids}], " +
        s"got $centroidCount")
    val maxRow = vectors.agg(max(col("id"))).head()
    require(!maxRow.isNullAt(0),
      "kmeans: empty vectors frame — no id domain to derive a stride from")
    val maxId = maxRow.getLong(0)
    require(maxId >= 0,
      s"kmeans: max id is $maxId — the count contract derives the stride " +
        "from a non-negative id domain (id % stride == 0 seeds a cell); " +
        "remap ids or pass an explicit stride via assignClusters")
    assignClustersManaged(vectors,
      math.max(1L, (maxId + 1) / centroidCount), iters)._1
  }

  /** [[assignClusters]] plus the cleanup handle for the two cached frames
    * (same managed-persist contract as [[Dedup.jaccardJoin]]: unpersist
    * AFTER the consuming action; one-shot paths may ignore it). */
  def assignClustersManaged(vectors: DataFrame, centroidStride: Long,
                            iters: Int): (DataFrame, () => Unit) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = vectors.sparkSession
    import spark.implicits._
    val qvecs = vectors
      .select(col("id"), quantize(col("vec")).as("qv"))
      .as[(Long, Array[Long])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // seed centroids: the quantized stride sample, sorted by id — the SAME
    // clamped-collect contract as Similarity's IVF header: LIMIT
    // MaxCentroids+1 makes the clamp, the emptiness check and the data
    // fetch ONE job, so a too-small stride at large N becomes an actionable
    // error (pass a COUNT via assignClustersByCount) instead of an eventual
    // driver OOM; under the cap the limit is a no-op, so the seed set (and
    // hence every cell) is exactly the unclamped one
    val seedRows = qvecs.filter(col("id") % centroidStride === 0)
      .limit((Similarity.MaxCentroids + 1).toInt).collect()
    require(seedRows.nonEmpty,
      s"kmeans: no id is a multiple of centroidStride=$centroidStride")
    require(seedRows.length <= Similarity.MaxCentroids,
      s"kmeans: centroidStride=$centroidStride would collect more than " +
        s"${Similarity.MaxCentroids} centroids — pass a centroid COUNT " +
        "(assignClustersByCount) to derive a scale-proof stride instead")
    var cents: Array[(Long, Array[Long])] = seedRows.sortBy(_._1)

    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // one cache pass: per-partition combiner emits (cell, n, Σqv) — k rows
      // per partition, so the collect moves k·d·P longs, never corpus data
      val partials: Array[(Long, Long, Array[Long])] = qvecs.mapPartitions { it =>
        val cs = bc.value
        val sums = scala.collection.mutable.HashMap.empty[Long, Array[Long]]
        val counts = scala.collection.mutable.HashMap.empty[Long, Long]
        it.foreach { case (_, v) =>
          val cell = bestCell(cs, v)
          val s = sums.getOrElseUpdate(cell, new Array[Long](v.length))
          var j = 0
          while (j < v.length) { s(j) += v(j); j += 1 }
          counts(cell) = counts.getOrElse(cell, 0L) + 1L
        }
        sums.iterator.map { case (cell, s) => (cell, counts(cell), s) }
      }.collect()
      bc.destroy()
      // driver reduce (metadata-scale), then exact floor-division means
      val accS = scala.collection.mutable.HashMap.empty[Long, Array[Long]]
      val accN = scala.collection.mutable.HashMap.empty[Long, Long]
      partials.foreach { case (cell, n, s) =>
        accS.get(cell) match {
          case Some(t) => var j = 0; while (j < t.length) { t(j) += s(j); j += 1 }
          case None    => accS(cell) = s.clone()
        }
        accN(cell) = accN.getOrElse(cell, 0L) + n
      }
      cents = cents.map { case (cell, oldCv) =>
        accS.get(cell) match {
          case Some(s) =>
            val n = accN(cell)
            (cell, s.map(Math.floorDiv(_, n)))
          case None => (cell, oldCv) // starved cluster: centroid stands
        }
      }
    }

    val bcF = spark.sparkContext.broadcast(cents)
    val assigned = qvecs
      .map { case (id, v) => (id, bestCell(bcF.value, v)) }
      .toDF("id", "cluster")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    // k-row size frame: AQE broadcasts it; no hint needed
    val out = assigned.join(sizes, "cluster")
      .select(col("id"), col("cluster"), col("cluster_size"))
    (out, () => { assigned.unpersist(); qvecs.unpersist(); () })
  }
}
