package graft

/** Codifies the 100 TB plan posture for EVERY catalog query, so a plan
  * regression fails the suite instead of surfacing as a bench cliff:
  *
  *  - no CartesianProduct anywhere (candidate generation must be keyed);
  *  - BroadcastNestedLoopJoin only where a bounded non-equi build side is
  *    the DESIGN (q12's 6-row band table, q23's broadcast query set — both
  *    documented in their operators), never silently elsewhere;
  *  - column pruning reaches the scan on the widest table (q1 reads a
  *    handful of lineitem columns, not all 16).
  */
class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val q = SparkEntry.catalog.find(_.name == name).get
    q.fn(spark, d).queryExecution.executedPlan.toString
  }

  /** Queries where a BroadcastNestedLoopJoin is the intended shape: the
    * build side is bounded by DESIGN (not by SF): q12 joins a 6-row band
    * table on a range predicate; q23/q23b/q31-adjacent exact re-ranks
    * broadcast the small query set with a non-equi (!=) residual. */
  private val bnljByDesign = Set("q12_rangejoin", "q23_ann_cosine",
    "q44_ann_quantized", // q44's approx pass broadcasts the query codes (bounded by design) with a != residual, like q23
    "q46_bm25") // 1-row corpus-stats frame cross-joined via explicit broadcast()

  test("no catalog query plans a CartesianProduct") {
    SparkEntry.catalog.foreach { q =>
      val plan = q.fn(spark, d).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product:\n$plan")
    }
  }

  test("BroadcastNestedLoopJoin appears only where it is the design") {
    SparkEntry.catalog.foreach { q =>
      val plan = q.fn(spark, d).queryExecution.executedPlan.toString
      if (!bnljByDesign(q.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} silently degraded to a nested-loop join:\n$plan")
    }
  }

  test("column pruning reaches the lineitem scan in q1") {
    val q = SparkEntry.catalog.find(_.name == "q1_agg").get
    val top = q.fn(spark, d).queryExecution.executedPlan
    val inner = top match { // AQE wrapper is opaque to collect
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = inner.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.requiredSchema.fields.length
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.output.length
    }
    assert(scans.nonEmpty, "no parquet scan found in q1's plan")
    assert(scans.forall(_ <= 7),
      s"q1 should read ≤7 lineitem columns, scans read $scans of 16")
  }

  test("q39/q41 are per-row: no join, no aggregate, only the output sort shuffles") {
    Seq("q39_repetition", "q41_stratified_sample").foreach { name =>
      val plan = planOf(name)
      assert(!plan.contains("Join"), s"$name must be row-local, found a join:\n$plan")
      assert(!plan.contains("HashAggregate"), s"$name must not aggregate:\n$plan")
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"$name should shuffle only for the output ORDER BY, " +
        s"found $exchanges exchanges:\n$plan")
    }
  }

  test("q40 cumulates on score LEVELS: windows exist but never sort a raw stratum") {
    // The naive form is one window partitioned by stratum over the document
    // frame. The two-phase plan aggregates to (stratum, score) levels FIRST,
    // windows the metadata-sized level frame, then windows only within
    // (stratum, score). So: an aggregate must appear, and every window
    // partition spec must include both stratum and score... except the level
    // frame's offset window (stratum only), which sits ABOVE the aggregate.
    val plan = planOf("q40_token_budget")
    assert(plan.contains("HashAggregate"), s"level aggregation missing:\n$plan")
    val windows = "Window \\[".r.findAllIn(plan).size
    assert(windows == 2, s"q40 should have exactly the offset + within-level windows, found $windows:\n$plan")
  }

  test("q45/q46 probe joins broadcast at runtime: AQE sees the small side") {
    // Both operators deliberately carry NO broadcast hint (a hint is honored
    // regardless of size); the contract is that AQE, seeing the true size of
    // the benchmark n-gram / query-term side behind its distinct shuffle,
    // converts the corpus-probe join to a broadcast hash join so the corpus
    // side never shuffles for the probe. Assert on the POST-execution plan.
    Seq("q45_decontam", "q46_bm25").foreach { name =>
      val q = SparkEntry.catalog.find(_.name == name).get
      val df = q.fn(spark, d)
      df.collect() // drive AQE to its final plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name's probe join did not become a broadcast hash join:\n$plan")
    }
  }

  test("q34 assigns IVF cells map-side: no join before the probe join") {
    // The r4 defect: cell assignment expanded candidates × centroids through
    // a windowed Exchange. The fixed plan computes the argmax inline, so the
    // ONLY joins in the whole plan are the probe equi-join (+ AQE wrappers).
    val plan = planOf("q34_ann_ivf")
    // count Window NODES ("Window [" ) — WindowGroupLimit pre-filters belong
    // to the same top-k window and are fine
    val windows = "Window \\[".r.findAllIn(plan).size
    val joins = "Join".r.findAllIn(plan).size
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"q34 re-grew the N×C expansion:\n$plan")
    assert(windows <= 1, s"q34 should window only for the final top-k, found $windows:\n$plan")
    assert(joins >= 1, "probe join must remain")
  }
}
