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
  private val bnljByDesign = Set("q12_rangejoin", "q23_ann_cosine")

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
