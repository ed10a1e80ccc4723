package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-selection operators for training-data pipelines: pick WHICH
  * documents make the training mix once dedup/quality signals exist.
  *  - [[tokenBudget]]: per-stratum "best documents first until the token
  *    budget is spent" — the standard data-mixing step.
  *  - [[stratifiedSample]]: deterministic hash-bucket downsampling with a
  *    per-stratum rate — rebalances over-represented strata reproducibly.
  */
object Selection {

  /** Per-stratum token-budget selection: within each stratum keep documents
    * in (score DESC, id ASC) order while the running token total stays at or
    * under `budget`. Semantically identical to the per-document window
    * `sum(tok) OVER (PARTITION BY stratum ORDER BY score DESC, id ROWS
    * UNBOUNDED PRECEDING..CURRENT)` + `cum <= budget` — but that plan sorts
    * whole strata through single tasks (a handful of languages at 100 TB =
    * a handful of tasks). Instead:
    *
    *  1. aggregate to (stratum, score) LEVELS — map-side combinable, and the
    *     result has one row per distinct score value, metadata-sized no
    *     matter the corpus;
    *  2. run the cumulative window on that level frame to get each level's
    *     starting offset `prev_tok`, and PRUNE levels that start at or past
    *     the budget (their documents can never fit: tokens are ≥ 1);
    *  3. join the offsets back (broadcast-sized build side) and cumulate
    *     only WITHIN a (stratum, score) level, ordered by id — fine-grained
    *     window keys that distribute across the cluster, fed only by the
    *     surviving levels.
    *
    * Output: (stratum, id, score, tok, cum) for kept documents, where `cum`
    * equals the naive per-document running total. */
  def tokenBudget(docs: DataFrame, stratumCol: String, idCol: String,
                  score: Column, tok: Column, budget: Long): DataFrame = {
    val feat = docs.select(col(stratumCol).as("stratum"), col(idCol).as("id"),
      score.as("score"), tok.cast("long").as("tok"))
    val lvl = feat.groupBy("stratum", "score").agg(sum("tok").as("lvl_tok"))
    val byScore = Window.partitionBy("stratum").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = lvl
      .withColumn("prev_tok", sum(col("lvl_tok")).over(byScore) - col("lvl_tok"))
      .filter(col("prev_tok") < budget)
      .select(col("stratum"), col("score"), col("prev_tok"))
    val withinLevel = Window.partitionBy("stratum", "score").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    feat.join(offsets, Seq("stratum", "score")) // inner join prunes dead levels
      .withColumn("cum", col("prev_tok") + sum(col("tok")).over(withinLevel))
      .filter(col("cum") <= budget)
      .select(col("stratum"), col("id"), col("score"), col("tok"), col("cum"))
  }

  /** Deterministic per-stratum downsampling: keep a row iff
    * `H(stratum ':' id) mod 1000 < ratePm(row)`, H = the portable
    * first-60-bits-of-md5 hash ([[Dedup.shingleHash]]). Per-row and
    * shuffle-free; no RNG state, so the sample is reproducible across
    * engines, retries, and partitionings, and raising a stratum's permille
    * strictly grows its sample (nested samples — the property data-mixing
    * reruns rely on). Output: the input rows that survive, plus their
    * `bucket` (0..999). */
  def stratifiedSample(docs: DataFrame, stratumCol: String, idCol: String,
                       ratePm: Column): DataFrame =
    docs.withColumn("bucket",
        Dedup.shingleHash(concat_ws(":", col(stratumCol), col(idCol)))
          % Dedup.MinhashP % 1000)
      .filter(col("bucket") < ratePm)
}
