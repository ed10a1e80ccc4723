package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast (it is
  *    small by construction); candidates stream through a map-side cosine and a
  *    per-query top-k window. This is the correctness baseline and is already
  *    the right plan when |queries| is small: cost O(|Q|·N) with no shuffle of
  *    the big side except the final per-query top-k.
  *  - [[lshTopK]]: the 100 TB path — sign-random-projection (Charikar) buckets;
  *    each vector lands in one bucket per table, candidates only meet within a
  *    bucket, so the join is keyed and the quadratic term is gone. Recall < 1
  *    by design; the planes are a deterministic ±1 matrix so any engine can
  *    reproduce the bucketing bit-for-bit.
  *
  * All arithmetic is done in DOUBLE in array order (left fold), which the
  * DuckDB oracle reproduces exactly.
  */
object Similarity {

  /** Left-fold double dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Exact top-k neighbors for each query vector.
    * `queries`/`candidates`: (id LONG, vec ARRAY<FLOAT>). Output:
    * (q_id, rank, neighbor_id, although rank order is (cosine desc, id)). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("id").as("q_id"), col("vec").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val c = candidates.select(col("id").as("c_id"), col("vec").as("cv"))
      .withColumn("cn", l2norm(col("cv")))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"))
  }

  /** Deterministic ±1 projection weight for (global plane g, dimension i) — a
    * fixed pseudo-random pattern both engines compute identically. Modulus
    * 101 (prime, ≫ plane count), NOT a small one: with mod 7 the expression
    * degenerates to 3·(g+i) mod 7 — only SEVEN distinct hyperplane patterns
    * shared across all tables, which silently voids the any-of-N-tables
    * recall math (every table reuses the same patterns) and biases buckets
    * 4:3. With 101, planes g and g' share a pattern only if g ≡ g' (mod
    * 101) — all 18 default planes are genuinely distinct — and parity is a
    * near-even 51/50 split. */
  private def weight(g: Int, i: Column): Column =
    when(((lit(g) * 31 + i * 17) % 101) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-projection bucket id for hash table `table`: bit p is the sign of
    * the projection onto plane `table*planes + p`. */
  def signBucket(vec: Column, planes: Int, table: Int): Column = {
    // One fold per plane (planes are few, vectors short).
    val bits = (0 until planes).map { p =>
      val g = table * planes + p
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => x.cast("double") * weight(g, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Multi-table bucketed ANN (the standard recall fix for sign-LSH: a single
    * 6-bit table finds a 0.9-cosine neighbor only ~40% of the time; any-of-3
    * tables ≈ 77%). Candidates meet a query iff they share ANY table's bucket;
    * exact cosine re-rank over the deduped candidate set.
    * Output (q_id, rank, neighbor_id). */
  /** (id, vec) → one row per (id, vec, table, bucket). */
  private def withBuckets(df: DataFrame, idName: String, vecName: String,
                          planes: Int, tables: Int): DataFrame = {
    val base = df.select(col("id").as(idName), col("vec").as(vecName))
    base.withColumn("buckets", explode(array((0 until tables).map(t =>
      struct(lit(t).as("t"), signBucket(col(vecName), planes, t).as("bkt"))): _*)))
      .select(col(idName), col(vecName), col("buckets.t").as("t"), col("buckets.bkt").as("bkt"))
  }

  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              planes: Int = 6, tables: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = withBuckets(queries, "q_id", "qv", planes, tables)
    val c = withBuckets(candidates, "c_id", "cv", planes, tables)
    val cand = c.join(broadcast(q), Seq("t", "bkt"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("qv"), col("cv"))
      .dropDuplicates("q_id", "c_id")
    val scored = cand.withColumn("cos",
      cosine(col("qv"), col("cv"), l2norm(col("qv")), l2norm(col("cv"))))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"))
  }

  /** Let-binding as a materialization barrier WITHOUT an exchange: binds
    * `value` to a lambda variable (evaluated once per row) and hands it to
    * `body`. A plain `withColumn` alias is NOT safe here — CollapseProject
    * inlines it back into every consumer, re-evaluating a norm fold once per
    * centroid; a lambda variable is a bound VALUE, immune to inlining. */
  private def let(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** IVF (inverted-file) ANN — the second classic scale path next to
    * [[lshTopK]]: vectors are COARSE-QUANTIZED to their nearest centroid's
    * cell (each vector lives in exactly ONE cell, unlike multi-bucket LSH);
    * a query probes only its `nProbe` nearest cells and re-ranks exactly
    * within them.
    *
    * Centroids are a deterministic sample of the corpus (every
    * `centroidStride`-th id) rather than learned k-means: the partition/probe
    * machinery — the part that matters at scale — is identical, and
    * determinism keeps the cell structure oracle-reproducible.
    *
    * Scale shape: centroids are METADATA-scale by the IVF contract (a few
    * thousand rows at 100 TB) — they are collected once and embedded as a
    * literal array, so cell assignment is pure per-row expression work: an
    * argmax fold over the centroid array inside the scan projection. The
    * corpus is never expanded ×C and never shuffled for assignment (the r4
    * plan expanded N×C through a row_number Exchange — at 100 TB × 4k
    * centroids that shuffled 4,000× the corpus). The probe join touches only
    * the probed cells. Recall < 1 by design (a true neighbor may live in an
    * unprobed cell).
    *
    * Output (q_id, rank, neighbor_id), rank order (cosine DESC, id). */
  /** Driver-side collect of CONTROL-PLANE data only (the centroid table),
    * mirroring what any IVF index stores in its header: a deterministic
    * sample (every `stride`-th id) of (id, vec, norm), metadata-scale by the
    * IVF contract. Norms are precomputed with the same left-fold double
    * arithmetic as [[l2norm]]. Shared by [[ivfTopK]] and [[semanticDedup]]. */
  /** Hard ceiling on the driver-side centroid table: beyond this the
    * "metadata-scale" contract is broken no matter what the caller intended
    * — fail with the fix (a centroid COUNT) instead of an eventual driver
    * OOM. 4M centroid structs ≈ low-GB at d=128, the defensible extreme. */
  private[llm] val MaxCentroids: Long = 4L << 20

  /** Derive the centroid stride from a COUNT contract: ONE metadata-scale
    * aggregate (max id over the pruned id column) fixes
    * stride ≈ idSpan / centroidCount, so the driver collect stays O(count)
    * at ANY corpus size — the IVF index-header contract (a fixed stride is
    * O(N/stride): unbounded at 100×). Deterministic: the same corpus always
    * derives the same stride, hence the same cell structure. */
  private def strideFor(candidates: DataFrame, centroidCount: Long,
                        caller: String): Long = {
    require(centroidCount > 0 && centroidCount <= MaxCentroids,
      s"$caller: centroidCount must be in (0, $MaxCentroids], got $centroidCount")
    val maxId = candidates.agg(max(col("id"))).head().getLong(0)
    math.max(1L, (maxId + 1) / centroidCount)
  }

  private def sampledCentroids(candidates: DataFrame, stride: Long,
                               caller: String): Seq[(Long, Seq[Float], Double)] = {
    // clamped collect: LIMIT MaxCentroids+1 makes the clamp, the emptiness
    // check and the data fetch ONE job — a too-small stride at large N
    // becomes an actionable error instead of an eventual driver OOM, and
    // under the cap the limit is a no-op so the set (hence the cells) is
    // exactly the unclamped one. An exact check, not a maxId/stride
    // estimate: sparse id spaces (sharded/offset ranges) would make the
    // estimate fail spuriously.
    val rows = candidates
      .filter(col("id") % stride === 0)
      .select(col("id"), col("vec"))
      .limit((MaxCentroids + 1).toInt)
      .collect()
    require(rows.length <= MaxCentroids,
      s"$caller: centroidStride=$stride would collect more than " +
        s"$MaxCentroids centroids — pass centroidCount to derive a " +
        "scale-proof stride instead")
    val centroids = rows
      .map { r =>
        val v = r.getSeq[Float](1)
        (r.getLong(0), v, math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
      }.sortBy(_._1).toSeq
    require(centroids.nonEmpty,
      s"$caller: no candidate id is a multiple of centroidStride=$stride " +
        "— an empty centroid table would make every cell assignment fail " +
        "(ANSI) or null out silently; pick a stride <= the max candidate id")
    centroids
  }

  /** The `n` nearest cell ids of `vec` against the centroid literal
    * `centArr` (array<struct<_1:id, _2:vec, _3:norm>>) — pure per-row
    * expression work: an argmax fold inside the projection, never a join or
    * Exchange. Cosines are grouped EXACTLY as the oracle's dot/(nrm·centn)
    * so assignment ties break identically; order is (cosine DESC, cell ASC),
    * row_number semantics. */
  private def nearestCellsCol(centArr: Column, vec: Column, n: Int): Column = {
    def cellScores(v: Column, nrm: Column): Column =
      transform(centArr, ct =>
        struct((dot(v, ct.getField("_2")) / (nrm * ct.getField("_3"))).as("cos"),
          ct.getField("_1").as("cell")))
    def byBest(l: Column, r: Column): Column =
      when(l.getField("cos") > r.getField("cos"), -1)
        .when(l.getField("cos") < r.getField("cos"), 1)
        .when(l.getField("cell") < r.getField("cell"), -1)
        .when(l.getField("cell") > r.getField("cell"), 1)
        .otherwise(0)
    let(l2norm(vec), nrm =>
      transform(slice(array_sort(cellScores(vec, nrm), byBest), 1, n),
        s => s.getField("cell")))
  }

  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              centroidStride: Long = 40, nProbe: Int = 3,
              /** When set, IGNORE `centroidStride` and derive it from this
                * target count ([[strideFor]]) — the 100-TB calling
                * convention: the index header stays O(count) at any N. */
              centroidCount: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stride = centroidCount.fold(centroidStride)(strideFor(candidates, _, "ivfTopK"))
    val centArr = typedlit(sampledCentroids(candidates, stride, "ivfTopK"))
    def nearestCells(vec: Column, n: Int): Column = nearestCellsCol(centArr, vec, n)

    // Inverted file: nearest cell per candidate — map-side only, no Exchange.
    val inv = candidates.select(col("id").as("c_id"), col("vec").as("cv"))
      .withColumn("cell", element_at(nearestCells(col("cv"), 1), 1))
      .withColumn("cn", l2norm(col("cv")))
    // Probe list: nProbe nearest cells per query — same expression, exploded.
    val probes = queries.select(col("id").as("q_id"), col("vec").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
      .select(col("q_id"), col("qv"), col("qn"),
        explode(nearestCells(col("qv"), nProbe)).as("cell"))
    // Exact re-rank within probed cells only. No dedup needed: IVF is a
    // partition (one cell per candidate), so a (query, candidate) pair can
    // meet at most once — a structural advantage over multi-table LSH.
    val scored = inv.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): prune semantically
    * near-duplicate documents by their EMBEDDINGS — cluster the corpus
    * coarsely, compare vectors only WITHIN a cluster, and keep one
    * representative per near-duplicate group. The within-cluster restriction
    * is the published algorithm's own scale trick (k-means cells bound the
    * quadratic term), not an approximation bolted on here; pairs that cross
    * cells are out of scope by design.
    *
    * Spark shape, reusing the verified building blocks:
    *  - cells: the IVF deterministic sampled centroids ([[sampledCentroids]],
    *    [[nearestCellsCol]]) — assignment is per-row expression work, no
    *    Exchange (q34's audited posture);
    *  - candidate pairs: self-join keyed on the cell id, `id_a < id_b`,
    *    exact cosine ≥ `tau` — the only place the corpus meets itself, and
    *    it is cell-bounded (avg cell size ≈ centroidStride). A pathological
    *    cell (all vectors identical) degrades to that cell's quadratic —
    *    the documented SemDeDup trade;
    *  - groups: connected components over the pair graph
    *    ([[Clusters]] large-star/small-star, q38's audited machinery);
    *    the representative is the component's minimum id (deterministic).
    *
    * Output: (id, keep_id, kept, cluster_size) — one row per input vector;
    * `kept` marks the representative (every non-duplicate is its own). */
  def semanticDedup(vecs: DataFrame, tau: Double,
                    centroidStride: Long = 40,
                    centroidCount: Option[Long] = None,
                    hotCellCap: Long = DefaultHotCellCap): DataFrame = {
    val (pairs, cleanup) =
      semanticPairsManaged(vecs, tau, centroidStride, centroidCount, hotCellCap)
    // Clusters.assign EXECUTES the CC rounds during the call (per-round
    // actions behind a lineage barrier); the returned frame references the
    // materialized stars, not the pair plan — the cells cache can go.
    val assigned = Clusters.assign(vecs.select("id"), pairs)
    cleanup()
    assigned
      .select(col("doc_id").as("id"), col("cluster_id").as("keep_id"),
        (col("doc_id") === col("cluster_id")).cast("long").as("kept"),
        col("cluster_size"))
  }

  /** [[semanticDedup]]'s candidate stage, exposed on its own: (id_a, id_b)
    * pairs with exact cosine ≥ `tau` among SAME-CELL vectors. Separately
    * visible so its plan can be audited directly — the downstream connected
    * components run through [[Clusters]]' lineage barrier (per-round
    * actions), which hides this stage from the final query's executed
    * plan. */
  def semanticPairs(vecs: DataFrame, tau: Double,
                    centroidStride: Long = 40,
                    centroidCount: Option[Long] = None,
                    hotCellCap: Long = DefaultHotCellCap): DataFrame =
    semanticPairsManaged(vecs, tau, centroidStride, centroidCount, hotCellCap)._1

  /** Per-salt-bucket row ceiling for the within-cell self-join: a cell of
    * size s enumerates s² candidate pairs in ONE task when joined on the
    * bare cell id — fine at the average (≈ stride) but quadratic on a hot
    * cell (the FAISS imbalance problem: near-identical web boilerplate
    * collapses into one cell). Cells above the cap are salted into
    * ceil(s/cap) buckets, bounding per-task work at ~cap·s and spreading
    * the quadratic across buckets; the PAIR SET is provably unchanged
    * (each (a,b) meets exactly once, at a's salt). */
  val DefaultHotCellCap: Long = 4096L

  /** [[semanticPairs]] plus the cleanup handle for the cached cell frame:
    * the per-row centroid argmax is the operator's dominant non-join cost,
    * and BOTH sides of the self-join read it — uncached, Spark would run
    * the full assignment twice (self-join children are independent
    * subtrees). Same managed-persist contract as [[Dedup.jaccardJoin]]. */
  def semanticPairsManaged(vecs: DataFrame, tau: Double,
                           centroidStride: Long = 40,
                           centroidCount: Option[Long] = None,
                           hotCellCap: Long = DefaultHotCellCap)
      : (DataFrame, () => Unit) = {
    require(hotCellCap > 0, s"hotCellCap must be positive, got $hotCellCap")
    val stride =
      centroidCount.fold(centroidStride)(strideFor(vecs, _, "semanticDedup"))
    val centArr = typedlit(sampledCentroids(vecs, stride, "semanticDedup"))
    val cells = vecs.select(col("id"), col("vec"))
      .withColumn("cell", element_at(nearestCellsCol(centArr, col("vec"), 1), 1))
      .withColumn("nrm", l2norm(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Hot-cell handling, engaged only when a cell actually exceeds the cap:
    // per-cell sizes are one cell-keyed aggregate over the cached frame
    // (map-side partials, #cells rows — metadata-scale). The max-size probe
    // is a tiny action on the persisted frame; in the common balanced case
    // the join stays the bare cell-keyed self-join with ZERO salting
    // overhead. When a cell is hot: nsalt = ceil(size/cap), the A side
    // takes one deterministic bucket (id mod nsalt), the B side replicates
    // into all nsalt buckets, and the join key becomes (cell, salt): pair
    // (a,b) meets exactly once — identical output, bounded per-task work.
    val sizes = cells.groupBy("cell").agg(count(lit(1)).as("csz"))
    val maxRow = sizes.agg(max(col("csz"))).head()
    val maxCell = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val pairs = if (maxCell <= hotCellCap) {
      val a = cells.select(col("cell"), col("id").as("id_a"),
        col("vec").as("va"), col("nrm").as("na"))
      val b = cells.select(col("cell"), col("id").as("id_b"),
        col("vec").as("vb"), col("nrm").as("nb"))
      a.join(b, "cell")
        .filter(col("id_a") < col("id_b") &&
          cosine(col("va"), col("vb"), col("na"), col("nb")) >= tau)
        .select("id_a", "id_b")
    } else {
      val nsaltCol = ceil(col("csz").cast("double") / lit(hotCellCap.toDouble))
        .cast("int")
      val sized = cells.join(broadcast(sizes), "cell")
        .withColumn("nsalt", greatest(lit(1), nsaltCol))
      val a = sized.select(col("cell"), col("id").as("id_a"),
        col("vec").as("va"), col("nrm").as("na"),
        pmod(col("id"), col("nsalt")).cast("int").as("salt"))
      val b = sized.select(col("cell"), col("id").as("id_b"),
        col("vec").as("vb"), col("nrm").as("nb"),
        explode(sequence(lit(0), col("nsalt") - 1)).as("salt"))
      a.join(b, Seq("cell", "salt"))
        .filter(col("id_a") < col("id_b") &&
          cosine(col("va"), col("vb"), col("na"), col("nb")) >= tau)
        .select("id_a", "id_b")
    }
    (pairs, () => { cells.unpersist(); () })
  }

  /** Per-vector int8 symmetric quantization scale: max |x_i| (double). */
  def qScale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Int8 codes: floor(x·127/scale + 0.5) ∈ [-127, 127], stored TINYINT —
    * floor(+0.5) instead of round() because floor has identical semantics in
    * every engine (round's half-case varies). Zero vectors code to zeros. */
  def qCodes(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0).cast("byte")))
      .otherwise(transform(vec,
        x => floor(x.cast("double") * 127.0 / scale + 0.5).cast("byte")))

  /** Integer dot product of two code arrays — EXACT (no float-order
    * sensitivity), the property that makes the approx stage portable. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Scalar-quantized ANN — the memory-bandwidth scale path: the corpus scan
    * reads int8 CODES (4× smaller than float32; at 100 TB of embeddings the
    * approx pass touches 25 TB), ranks candidates per query by the integer
    * code dot (rescaled by the candidate's scale/norm — the query's factors
    * are constant within its partition, so the ordering is unchanged), keeps
    * a `shortlistFactor`·k shortlist, and only THEN fetches the original
    * float vectors — shortlist-only, a keyed join on id — for the exact
    * cosine re-rank. Approx scores are double products of an exact integer
    * and two deterministically-derived doubles in fixed operand order, so an
    * oracle engine reproduces the shortlist bit-for-bit.
    * Output (q_id, rank, neighbor_id), rank by exact (cosine DESC, id). */
  def quantizedTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                    shortlistFactor: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qcodes = queries.select(col("id").as("q_id"), col("vec").as("qv"))
      // the `let` barrier, like the candidate side: an inline qScale would be
      // re-evaluated by the qCodes lambda for EVERY element (O(d²) per row)
      .select(col("q_id"), let(qScale(col("qv")), s => qCodes(col("qv"), s)).as("qc"))
    val codes = candidates.select(col("id").as("c_id"), col("vec").as("cv"))
      .select(col("c_id"),
        let(qScale(col("cv")), s => qCodes(col("cv"), s)).as("cc"),
        qScale(col("cv")).as("cs"), l2norm(col("cv")).as("cn"))
    val approx = codes.join(broadcast(qcodes), col("q_id") =!= col("c_id"))
      .withColumn("ascore", intDot(col("qc"), col("cc")).cast("double") * col("cs") / col("cn"))
    val ws = Window.partitionBy("q_id").orderBy(col("ascore").desc, col("c_id"))
    val short = approx.withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= k * shortlistFactor)
      .select("q_id", "c_id")
    // Original vectors fetched for the shortlist only (keyed equi-joins).
    val scored = short
      .join(candidates.select(col("id").as("c_id"), col("vec").as("cv")), "c_id")
      .join(broadcast(queries.select(col("id").as("q_id"), col("vec").as("qv"))), "q_id")
      .withColumn("cos", cosine(col("qv"), col("cv"), l2norm(col("qv")), l2norm(col("cv"))))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"))
  }

  /** Embedding-cosine near-duplicate pairs: every (a, b) with a < b that
    * shares ANY sign-LSH table bucket and has cosine ≥ `threshold` — the
    * embedding-space flavor of near-dup detection, same no-all-pairs
    * discipline (candidates meet only inside buckets). */
  def cosinePairs(vectors: DataFrame, threshold: Double,
                  planes: Int = 6, tables: Int = 3): DataFrame =
    cosinePairsManaged(vectors, threshold, planes, tables)._1

  /** [[cosinePairs]] plus a cleanup handle for the persisted bucketed frame.
    * One norm+projection pipeline feeds BOTH sides of the self-join — two
    * independently-aliased pipelines would compute every vector's `tables ×
    * planes` projection folds twice (differently-aliased subplans never hit
    * ReusedExchange), the same double-pipeline recompute
    * [[Dedup.nearDupPairsManaged]] persists against. */
  def cosinePairsManaged(vectors: DataFrame, threshold: Double,
                         planes: Int = 6, tables: Int = 3): (DataFrame, () => Unit) = {
    // Norms computed once per vector BEFORE the explode and the bucket join —
    // inside the pair predicate they would be re-folded for every candidate
    // pair, and after the explode once per table copy.
    val bucketed = vectors.select(col("id"), col("vec"))
      .withColumn("nrm", l2norm(col("vec")))
      .withColumn("buckets", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signBucket(col("vec"), planes, t).as("bkt"))): _*)))
      .select(col("id"), col("vec"), col("nrm"),
        col("buckets.t").as("t"), col("buckets.bkt").as("bkt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bucketed.select(col("id").as("id_a"), col("vec").as("va"),
      col("nrm").as("na"), col("t"), col("bkt"))
    val b = bucketed.select(col("id").as("id_b"), col("vec").as("vb"),
      col("nrm").as("nb"), col("t"), col("bkt"))
    val out = a.join(b, Seq("t", "bkt")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("va"), col("vb"), col("na"), col("nb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
    (out, () => { bucketed.unpersist(); () })
  }

  /** The state bucket of a sign-LSH (table, signature) key under a
    * `numBuckets`-way layout — the embedding-index companion of
    * [[Dedup.bandBucket]] (same uniform-hash discipline; writer and probe
    * must derive buckets through this one function). The bucket is a pure
    * function of the key, so partition pruning to a batch's key buckets
    * provably cannot drop a candidate. */
  def esigBucket(t: Column, sig: Column, numBuckets: Int): Column = {
    require(numBuckets >= 1 && numBuckets <= Novelty.MaxBuckets,
      s"esigBucket: numBuckets must be in [1, ${Novelty.MaxBuckets}], got $numBuckets")
    pmod(xxhash64(t, sig), lit(numBuckets.toLong)).cast("int")
  }

  /** The PERSISTED sign-LSH index frame a standing intake appends per
    * batch for its SEMANTIC near-dup gate: one row per (doc, table) with
    * the table's [[signBucket]] signature — the thin probe index (a few
    * longs per doc; the embedding itself lives in its own doc-keyed
    * family, fetched only for matched candidates' exact re-rank). With
    * `numBuckets` > 0 rows carry the [[esigBucket]] state bucket (write
    * compacted bases with `partitionBy("bkt")`); 0 = the flat layout. */
  def esigIndexFrame(embs: DataFrame, planes: Int, tables: Int,
                     numBuckets: Int): DataFrame = {
    require(embs.columns.toSeq == Seq("doc_id", "emb"),
      s"esigIndexFrame: expected (doc_id, emb), got ${embs.columns.toSeq}")
    val exploded = embs
      .withColumn("sigs", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signBucket(col("emb"), planes, t).as("sig"))): _*)))
      .select(col("doc_id"), col("sigs.t").as("t"), col("sigs.sig").as("sig"))
    if (numBuckets > 0)
      exploded.withColumn("bkt", esigBucket(col("t"), col("sig"), numBuckets))
    else exploded
  }

  /** A bucket-pruned incremental SEMANTIC near-dup probe result: the pair
    * frame, the signature/embedding buckets it actually read (telemetry —
    * the no-silent-caps rule; None = the read was unpruned), and the
    * managed-persist cleanup. */
  final case class SemanticProbe(pairs: DataFrame, probedBuckets: Seq[Int],
                                 probedEmbBuckets: Option[Seq[Int]],
                                 cleanup: () => Unit)

  /** The embedding-space flavor of
    * [[Dedup.incrementalNearDupBanded]] — the standing intake's
    * cross-batch SEMANTIC gate: the batch's vectors are sign-LSH-signed
    * ([[signBucket]], the same deterministic ±1 planes as [[lshTopK]] /
    * [[cosinePairs]]), candidates are corpus docs sharing ANY table's
    * signature, and matched pairs verify by EXACT cosine ≥ `tau` against
    * the stored embeddings — fetched per candidate only, never scanned.
    *
    * Scale shape, mirroring the lexical gate exactly: with `numBuckets` >
    * 0 the stored signature index is read PRUNED to the buckets the
    * batch's own (t, sig) keys hash to (partition-directory pruning —
    * exact, the bucket being a pure key function), the batch side rides a
    * measured broadcast (shuffled-join degrade over the bound — never a
    * forced broadcast OOM), and the embedding fetch prunes to the matched
    * candidates' [[Dedup.docBucket]] buckets — so per-batch cost tracks
    * the BATCH and its candidates, not the accumulated corpus. Recall is
    * the sign-LSH any-of-N-tables recall by design (same trade the
    * banded MinHash gate makes with its band count).
    *
    * `storedSigs`: [[esigIndexFrame]] parts, (doc_id, t, sig[, bkt]).
    * `storedEmbs`: (doc_id, emb[, bkt]) parts. `batch`: one row per doc,
    * non-null `embCol`. Output pairs: (batch_id, corpus_id). */
  def incrementalSemanticDup(storedSigs: DataFrame, storedEmbs: DataFrame,
                             batch: DataFrame, idCol: String, embCol: String,
                             tau: Double, planes: Int = 6, tables: Int = 3,
                             numBuckets: Int = 0,
                             maxBroadcastRows: Long = 4L << 20): SemanticProbe = {
    val bucketed = numBuckets > 0
    val batchE = batch.select(col(idCol).as("doc_id"), col(embCol).as("emb"))
    val bSigs = esigIndexFrame(batchE, planes, tables, numBuckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one action derives the touched buckets AND the row count (≤ numBuckets
    // rows), the same measured-broadcast discipline as the lexical probe
    val (bkts, build) =
      if (bucketed) {
        val cnts = bSigs.groupBy("bkt").agg(count(lit(1)).as("c")).collect()
        val ks = cnts.map(_.getInt(0)).toSeq.sorted
        val n = cnts.map(_.getLong(1)).sum
        (ks, if (n <= maxBroadcastRows) broadcast(bSigs.as("x")) else bSigs.as("x"))
      } else (Nil, bSigs.as("x"))
    val idx =
      (if (bucketed) storedSigs.where(col("bkt").isin(bkts: _*)) else storedSigs)
        .as("y")
    val cand = idx
      .join(build, col("x.t") === col("y.t") && col("x.sig") === col("y.sig"))
      .select(col("x.doc_id").as("batch_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate verify: embeddings fetched for matched corpus ids only,
    // pruned to their doc buckets when the stored side carries them
    val (embBkts, corpusEmb) =
      if (storedEmbs.columns.contains("bkt")) {
        val tb = cand.select(Dedup.docBucket(col("corpus_id"), numBuckets).as("tb"))
          .distinct().collect().map(_.getInt(0)).toSeq.sorted
        (Some(tb), storedEmbs.where(col("bkt").isin(tb: _*)).drop("bkt"))
      } else (None, storedEmbs)
    val pairs = cand
      .join(corpusEmb.select(col("doc_id").as("corpus_id"), col("emb").as("cemb")),
        "corpus_id")
      .join(batchE.select(col("doc_id").as("batch_id"), col("emb").as("bemb")),
        "batch_id")
      .filter(cosine(col("bemb"), col("cemb"),
        l2norm(col("bemb")), l2norm(col("cemb"))) >= tau)
      .select("batch_id", "corpus_id")
    SemanticProbe(pairs, bkts, embBkts,
      () => { cand.unpersist(); bSigs.unpersist(); () })
  }
}
