package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A-priori skew mitigation: salted equi-join.
  *
  * AQE's skew-join splits oversized SORT-MERGE partitions after the fact;
  * salting is the a-priori form that also covers shuffled HASH joins and keeps
  * working when one key alone exceeds an executor (the classic 100 TB hazard:
  * a null-ish or default-valued hot key holding >1/Nth of the corpus).
  *
  * Shape: the probe (big, skewed) side scatters each row deterministically
  * across `salt` sub-keys; the build side replicates each row `salt` times
  * (explode of a literal sequence — build is the smaller side by contract, so
  * the replication is the cheap half). The join keys become (key, salt), so
  * one hot key's rows land on `salt` different reducers instead of one.
  * Result set is IDENTICAL to the unsalted join: every probe row still meets
  * every matching build row exactly once (it meets the one replica that
  * carries its own salt).
  */
object Skew {

  /** Deterministic per-row scatter in [0, salt): hashed from the probe row's
    * key plus a uniquifier column (an id or any high-cardinality column), so
    * replays produce identical placement — no RNG, no
    * monotonically_increasing_id partition sensitivity. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeUniquifier: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(col(key), col(probeUniquifier)), lit(salt.toLong)).cast("int"))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
