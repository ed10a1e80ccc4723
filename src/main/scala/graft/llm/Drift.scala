package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between corpus slices — "did source B's
  * documents stop looking like source A's", the monitoring statistic behind
  * refresh gating (a crawl snapshot whose length/quality distribution
  * drifted needs re-weighting before it joins the mix) and between-shard
  * sanity checks.
  *
  * The statistic is the Kolmogorov–Smirnov distance computed on INTEGER
  * micro-unit ECDFs: for every unordered group pair,
  * `d_micros = max over observed values v of |ecdfA(v) − ecdfB(v)|` where
  * `ecdf(v) = cnt(≤v)·10^6 div n` — each side quantized independently, so
  * every intermediate is an exact integer ≤ 10^6 at ANY corpus size (no
  * n_A·n_B cross-product to overflow) and the DuckDB oracle replays the
  * identical value. The quantization means d_micros is within 2 micro-units
  * of the real-valued KS distance — a measurement statistic, not a
  * hypothesis test; thresholds are the caller's policy.
  *
  * Scale contract: `valueCol` must be an INTEGER statistic with a BOUNDED
  * domain (token counts, permille quality scores, micro scores — the
  * repo's integer-metrics convention): after the one corpus-scale
  * (group, value) count, every frame is (domain × groups)-sized. The
  * per-group running sum is one sorted pass over that bounded grid, and
  * the pair comparison joins it value-keyed with ≤ |groups|²/2 fan.
  *
  * Every statistic has a RAW form (one corpus-scale count, then
  * grid-scale math) and a `FromCounts` form taking a pre-aggregated
  * (group, value, count) frame — the standing-pipeline shape
  * ([[graft.app.Intake]]): a monitor that keeps domain-scale count STATE
  * per slice never re-scans the corpus, it folds each batch's counts in
  * and recomputes the grid-scale statistic. Both forms share every stage
  * after the count, so raw-vs-counts equivalence is structural. */
object Drift {

  /** Pairwise integer-ECDF KS distance over `valueCol` between the groups
    * of `groupCol`. Returns one row per unordered group pair:
    * (grp_a, grp_b, n_a, n_b, d_micros). Groups are compared on the UNION
    * of observed values (missing combinations carry the running count
    * forward, exactly the ECDF's step semantics). Null values AND null
    * groups are refused loudly — an ECDF over "unknown" is not a statistic,
    * and a null group would silently vanish from every pair (the `a.g <
    * b.g` join is null-rejecting), dropping a whole slice from the matrix.
    *
    * The bounded-domain contract is GUARDED, not just documented: the
    * distinct-value count (one scan, metadata-scale result) must not exceed
    * `maxDomain`, else the (domain × groups) grid this operator builds is
    * itself corpus-sized and the per-group sorted window over it becomes
    * the bottleneck the scaladoc promises to avoid. Quantize or bucket the
    * statistic first (the repo's integer-metrics convention). */
  def ecdfDrift(docs: DataFrame, groupCol: String, valueCol: String,
                maxDomain: Int = 65536): DataFrame =
    ecdfTail(countGrid(docs, groupCol, valueCol, maxDomain, "ecdfDrift",
      castValue = true))

  /** [[ecdfDrift]] over PRE-AGGREGATED counts — one row per observed
    * (group, value) with its count, e.g. accumulated monitor state or a
    * `groupBy(g, v).count()` a caller already ran. Identical output to the
    * raw form over the expanded rows (the two share every post-count
    * stage). Same guards: null group/value and null/negative counts are
    * refused loudly, the value domain is bounded by `maxDomain`. */
  def ecdfDriftFromCounts(counts: DataFrame, groupCol: String,
                          valueCol: String, countCol: String,
                          maxDomain: Int = 65536): DataFrame =
    ecdfTail(gridFromCounts(
      checkedCounts(counts, groupCol, valueCol, countCol, "ecdfDriftFromCounts",
        castValue = true),
      maxDomain, "ecdfDriftFromCounts"))

  private def ecdfTail(grid: DataFrame): DataFrame = {
    // the running sum carries each group's count across the OTHER groups'
    // step points (the grid is zero-filled), exactly the ECDF's steps
    val run = grid
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ecdf_micros", expr("cum * 1000000L div n"))
      .select(col("g"), col("v"), col("n"), col("ecdf_micros"))
    run.as("a")
      .join(run.as("b"), col("a.v") === col("b.v") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("grp_a"), col("b.g").as("grp_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(max(abs(col("a.ecdf_micros") - col("b.ecdf_micros"))).as("d_micros"))
  }

  /** Pairwise TOTAL-VARIATION distance over a CATEGORICAL `valueCol`
    * between the groups of `groupCol` — the companion statistic to
    * [[ecdfDrift]] for unordered domains (language mix, source mix, format
    * tags), where an ECDF's value ordering is meaningless:
    * `tv_micros = (Σ over observed values v of |share_a(v) − share_b(v)|) div 2`
    * with `share(v) = cnt(v)·10^6 div n` — each side quantized
    * independently, every intermediate an exact integer ≤ 10^6 at any
    * corpus size, same contract and guards as the KS form (bounded domain
    * enforced via `maxDomain`, null groups/values refused loudly). A value
    * absent from one group contributes that group's share as 0 (the grid
    * is zero-filled). Returns one row per unordered group pair:
    * (grp_a, grp_b, n_a, n_b, tv_micros). */
  def categoricalDrift(docs: DataFrame, groupCol: String, valueCol: String,
                       maxDomain: Int = 65536): DataFrame =
    tvTail(countGrid(docs, groupCol, valueCol, maxDomain,
      "categoricalDrift", castValue = false))

  /** [[categoricalDrift]] over PRE-AGGREGATED counts — the monitor-state
    * form, same contract as [[ecdfDriftFromCounts]] (the value keeps its
    * own type, per the categorical form). */
  def categoricalDriftFromCounts(counts: DataFrame, groupCol: String,
                                 valueCol: String, countCol: String,
                                 maxDomain: Int = 65536): DataFrame =
    tvTail(gridFromCounts(
      checkedCounts(counts, groupCol, valueCol, countCol,
        "categoricalDriftFromCounts", castValue = false),
      maxDomain, "categoricalDriftFromCounts"))

  private def tvTail(grid: DataFrame): DataFrame = {
    val shares = grid
      .withColumn("share_micros", expr("c * 1000000L div n"))
      .select(col("g"), col("v"), col("n"), col("share_micros"))
    shares.as("a")
      .join(shares.as("b"), col("a.v") === col("b.v") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("grp_a"), col("b.g").as("grp_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      // exact: the sum is ≤ maxDomain·10^6 ≪ 2^53 (double-exact), non-
      // negative, so /2 + cast-to-long IS the oracle's floor-half (`// 2`)
      .agg((sum(abs(col("a.share_micros") - col("b.share_micros"))) / 2)
        .cast("long").as("tv_micros"))
  }

  /** Pairwise EMBEDDING-CENTROID drift between the groups of `groupCol` —
    * the semantic companion to [[ecdfDrift]]/[[categoricalDrift]]: "did
    * source B's documents stop EMBEDDING like source A's". Each group's
    * centroid is computed in exact integers (per-component floor
    * quantization to `quantScale` units, per-dimension sum, floor-divided
    * by the group size), and the pair geometry is returned as exact
    * BIGINTs — the q79 register pattern: `dot_q` (centroid dot product)
    * and `nsq_a`/`nsq_b` (squared norms), from which the caller derives
    * cosine = dot_q / sqrt(nsq_a·nsq_b). No float leaves the operator, so
    * the output is bit-identical at any partitioning and independently
    * recomputable by the oracle.
    *
    * Scale posture: one corpus-scale posexplode + (group, dim) partial
    * sum; everything after is (groups × dims)-sized. Overflow is GUARDED,
    * not hoped: dims ≤ `maxDims`, and the realized bound
    * dims·max|mu|² must fit in a long with headroom — checked on the
    * (groups × dims) means frame (metadata-scale) and refused loudly,
    * since mean quantized components are group-size-independent the check
    * holds at ANY corpus size. Ragged embedding widths, empty input and
    * null groups/embeddings are refused loudly. */
  def centroidDrift(docs: DataFrame, groupCol: String, embCol: String,
                    quantScale: Int = 1000, maxDims: Int = 4096): DataFrame = {
    require(quantScale >= 1, s"centroidDrift: quantScale must be >= 1, got $quantScale")
    // clamped probe: 2 rows decide (one width = well-formed; a second
    // proves raggedness) — never a wide collect on pathological data.
    // size(null) is null, so an all-null column reads back as one NULL
    // width row — caught by the explicit null check, not an NPE.
    val widths = docs.select(size(col(embCol)).as("d")).distinct().limit(2).collect()
    require(widths.nonEmpty,
      s"centroidDrift: empty input — no $embCol rows to compare")
    require(widths.length == 1 && !widths.head.isNullAt(0),
      s"centroidDrift: ragged/null $embCol widths " +
        s"${widths.map(r => if (r.isNullAt(0)) "null" else r.get(0)).mkString(", ")}… — " +
        "centroid geometry needs one fixed dimensionality; repair upstream")
    val dims = widths.head.getInt(0)
    require(dims >= 1 && dims <= maxDims,
      s"centroidDrift: $embCol has $dims dims, outside [1, $maxDims] — the " +
        "pair compare is (groups x dims)-sized; raise maxDims deliberately " +
        "for wider embeddings")
    val q = docs
      .select(
        when(col(groupCol).isNull,
          raise_error(lit(s"centroidDrift: null $groupCol — a null group " +
            "would silently drop from every pair of the drift matrix"))
            .cast(docs.schema(groupCol).dataType))
          .otherwise(col(groupCol)).as("g"),
        posexplode(col(embCol)).as(Seq("dim", "x")))
      .select(col("g"), col("dim"),
        floor(col("x").cast("double") * quantScale).cast("long").as("m"))
    val sums = q.groupBy("g", "dim").agg(sum(col("m")).as("s"))
    val totals = docs.groupBy(col(groupCol).as("g")).agg(count(lit(1)).as("n"))
    // integer centroid: floor(s / n) — floor, not truncation, so negative
    // sums divide identically in every engine
    val means = sums.join(broadcast(totals), "g")
      .select(col("g"), col("dim"), col("n"),
        floor(col("s").cast("double") / col("n")).cast("long").as("mu"))
    // loud overflow guard on the metadata-scale means frame: the pair dot
    // accumulates dims terms of mu_a·mu_b. The bound itself is computed in
    // BigInt — dims·maxAbs² in plain Long arithmetic wraps exactly in the
    // regime the guard exists to refuse (|mu| ≳ 1.5e9), which would let
    // the require pass and the downstream sum overflow raw.
    val maxAbs = means.agg(max(abs(col("mu")))).head().getLong(0)
    require(maxAbs <= 0 ||
        BigInt(dims) * BigInt(maxAbs) * BigInt(maxAbs) <= BigInt(Long.MaxValue / 4),
      s"centroidDrift: dims($dims) x max|mu|($maxAbs)^2 leaves no int64 " +
        s"headroom — lower quantScale ($quantScale)")
    val nsq = means.groupBy("g", "n")
      .agg(sum(col("mu") * col("mu")).as("nsq"))
    means.as("a")
      .join(means.as("b"), col("a.dim") === col("b.dim") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("grp_a"), col("b.g").as("grp_b"))
      .agg(sum(col("a.mu") * col("b.mu")).as("dot_q"))
      .join(nsq.select(col("g").as("grp_a"), col("n").as("n_a"),
        col("nsq").as("nsq_a")), "grp_a")
      .join(nsq.select(col("g").as("grp_b"), col("n").as("n_b"),
        col("nsq").as("nsq_b")), "grp_b")
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        col("dot_q"), col("nsq_a"), col("nsq_b"))
  }

  /** The corpus-scale count step of the raw forms: null-refusing
    * (g, v, c) counts. `castValue` casts the value to BIGINT (the KS
    * form's integer-statistic contract); the categorical form keeps the
    * value's own type. */
  private def rawCounts(docs: DataFrame, groupCol: String, valueCol: String,
                        op: String, castValue: Boolean): DataFrame = {
    val rawValue =
      if (castValue) col(valueCol).cast("long")
      else col(valueCol)
    val valueType = if (castValue) org.apache.spark.sql.types.LongType
      else docs.schema(valueCol).dataType
    docs
      .select(
        when(col(groupCol).isNull,
          raise_error(lit(s"$op: null $groupCol — a null group would " +
            "silently drop from every pair of the drift matrix; filter or " +
            "label it first")).cast(docs.schema(groupCol).dataType))
          .otherwise(col(groupCol)).as("g"),
        when(col(valueCol).isNull,
          raise_error(lit(s"$op: null $valueCol — a distribution over " +
            "unknown values is not a statistic; filter or impute first"))
            .cast(valueType))
          .otherwise(rawValue).as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("c"))
  }

  /** Validation shim for the `FromCounts` forms: rename to the working
    * (g, v, c) shape, refuse null groups/values and null/negative counts
    * loudly (a negative count is corrupted state, not a distribution). */
  private def checkedCounts(counts: DataFrame, groupCol: String,
                            valueCol: String, countCol: String,
                            op: String, castValue: Boolean): DataFrame = {
    val rawValue =
      if (castValue) col(valueCol).cast("long")
      else col(valueCol)
    val valueType = if (castValue) org.apache.spark.sql.types.LongType
      else counts.schema(valueCol).dataType
    counts
      .select(
        when(col(groupCol).isNull,
          raise_error(lit(s"$op: null $groupCol — a null group would " +
            "silently drop from every pair of the drift matrix"))
            .cast(counts.schema(groupCol).dataType))
          .otherwise(col(groupCol)).as("g"),
        when(col(valueCol).isNull,
          raise_error(lit(s"$op: null $valueCol — a distribution over " +
            "unknown values is not a statistic")).cast(valueType))
          .otherwise(rawValue).as("v"),
        when(col(countCol).isNull || col(countCol) < 0,
          raise_error(lit(s"$op: null/negative $countCol — counts must be " +
            "non-negative")).cast("long"))
          .otherwise(col(countCol).cast("long")).as("c"))
      // a caller may legitimately hand un-merged count parts (the same
      // (g, v) from several batches) — fold them, so FromCounts is safe on
      // raw accumulated state, mirroring splitAssignContinuing's prior
      .groupBy("g", "v").agg(sum(col("c")).as("c"))
  }

  /** The shared guarded, zero-filled (group × observed-value) grid over a
    * (g, v, c) count frame: every combination present (c = 0 where a group
    * never shows the value) and n = the group's row count. */
  private def gridFromCounts(counts: DataFrame, maxDomain: Int,
                             op: String): DataFrame = {
    require(maxDomain >= 1, s"$op: maxDomain must be >= 1, got $maxDomain")
    val domain = counts.select(col("v")).distinct().count()
    require(domain <= maxDomain,
      s"$op: the value column has $domain distinct values > maxDomain=$maxDomain — " +
        "the comparison grid is (domain x groups)-sized, so an unbounded value " +
        "domain turns the bounded-grid plan corpus-scale; quantize or bucket " +
        "the statistic first (or raise maxDomain deliberately)")
    val groups = counts.select("g").distinct()
    val values = counts.select("v").distinct()
    // an all-zero-count group (legal per-row in the FromCounts forms —
    // checkedCounts only refuses null/negative) would reach the
    // `c·10^6 div n` share with n = 0: refuse it with the curated message
    // the operators promise instead of a raw divide-by-zero
    val totals = counts.groupBy("g").agg(sum(col("c")).as("n"))
      .select(col("g"),
        when(col("n") === 0,
          raise_error(concat(lit(s"$op: group "), col("g").cast("string"),
            lit(" has zero total count — a distribution over an empty " +
              "group has no shares; filter zero-count groups first")))
            .cast("long"))
          .otherwise(col("n")).as("n"))
    values.crossJoin(broadcast(groups))
      .join(counts, Seq("g", "v"), "left_outer")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .join(broadcast(totals), "g")
  }

  private def countGrid(docs: DataFrame, groupCol: String, valueCol: String,
                        maxDomain: Int, op: String, castValue: Boolean): DataFrame =
    gridFromCounts(rawCounts(docs, groupCol, valueCol, op, castValue),
      maxDomain, op)
}
