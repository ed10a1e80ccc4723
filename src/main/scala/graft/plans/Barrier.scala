package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Flat-`LogicalRDD` lineage barriers — the ANALYSIS-vs-EXECUTION contract.
  *
  * `persist()` truncates EXECUTION, not analysis: every driver action on a
  * DataFrame re-runs Catalyst analysis/optimization of its FULL logical plan
  * before the cache lookup short-circuits execution. For deep composed plans
  * (MinHash probe pipelines, LM scoring, PPJoin, iterated connected-
  * components rounds whose plans grow ~4× per iteration) that is seconds of
  * pure, data-independent driver CPU per action — measured 16–35 s at sf0.1
  * on a probe→anti-join→pair-join→CC composition with every cache hot, vs
  * ~4 s behind a barrier.
  *
  * [[flatten]] rewraps a frame's RDD in a one-node `LogicalRDD` plan:
  * downstream actions analyze a single scan node backed by the SAME RDD, so
  * execution cost is unchanged (the DataFrame analogue of GraphX's periodic
  * checkpoint in iterative algorithms). Two invariants callers rely on,
  * asserted by `BarrierSpec`:
  *   - schema and rows are preserved bit-for-bit (same RDD, same schema);
  *   - caching state rides the BACKING frame — `unpersist()` on the flat
  *     view is a no-op, so keep a handle on whatever was persisted.
  */
object Barrier {

  /** Wrap `df`'s RDD as a flat one-node plan. Call on an already-persisted
    * frame (or one whose recompute is cheap): the flat view executes the
    * same RDD, it just stops Catalyst re-analyzing the original deep plan
    * on every subsequent action. */
  def flatten(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Persist `df` and return `(flat view, backing frame)`. Run all actions
    * against the view; `unpersist()` the BACKING when done (the view's own
    * unpersist is a no-op — it owns no cache entry). */
  def flatPersist(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, DataFrame) = {
    val backing = df.persist(level)
    (flatten(backing), backing)
  }
}
