package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two invariants every Barrier call site relies on: the flat view
  * preserves rows+schema bit-for-bit, and its logical plan is a single
  * node (so downstream actions stop re-analyzing the original deep plan). */
class BarrierSpec extends SparkSpec {

  private def deepFrame() = {
    import spark.implicits._
    // A deliberately stacked plan: self-join + agg + filter over a range.
    val base = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
    base.groupBy("k").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .join(base.filter(col("id") < 500), Seq("k"))
      .filter(col("n") > lit(10))
  }

  test("flatten preserves schema and rows exactly") {
    val df = deepFrame()
    val flat = Barrier.flatten(df)
    assert(flat.schema === df.schema)
    val a = df.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = flat.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq === b.toSeq)
  }

  test("flatten yields a one-node analyzed plan") {
    val flat = Barrier.flatten(deepFrame())
    val plan = flat.queryExecution.analyzed
    assert(plan.children.isEmpty,
      s"expected a leaf LogicalRDD plan, got:\n$plan")
    assert(plan.nodeName.contains("LogicalRDD"), plan.nodeName)
  }

  test("flatten handles an empty frame (schema kept, zero rows, still flat)") {
    // Several call sites (CC round loops, intake stage frames) legitimately
    // hit empty frames — e.g. a batch with no near-dup pairs. A barrier
    // reimplementation (say, checkpoint-based) must not choke on them.
    val empty = deepFrame().filter(lit(false))
    val flat = Barrier.flatten(empty)
    assert(flat.schema === empty.schema)
    assert(flat.count() === 0L)
    assert(flat.queryExecution.analyzed.children.isEmpty)
  }

  test("flatPersist caches the backing and the view reads it back") {
    val df = deepFrame()
    val (flat, backing) = Barrier.flatPersist(df)
    try {
      assert(flat.count() === df.count())
      assert(backing.storageLevel.useMemory,
        "backing frame must hold the cache entry")
      // The view owns no cache: unpersisting it must not evict the backing.
      flat.unpersist()
      assert(backing.storageLevel.useMemory,
        "flat view unpersist must be a no-op on the backing cache")
    } finally backing.unpersist()
  }
}
