package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: BM25 (Robertson/Lucene form)
  * top-k scoring of a small query set against the full corpus — the standard
  * sparse-retrieval pass a training-data pipeline uses for doc-as-query
  * similarity, eval-set leakage triage, and quality-by-retrievability audits.
  *
  * Scale posture (the 100 TB contract):
  *  - The corpus side NEVER shuffles at corpus scale. The exploded corpus is
  *    filtered to query terms by a broadcast hash join BEFORE any aggregate,
  *    so the tf groupBy — the only shuffle touching corpus-derived rows —
  *    moves matched (doc, term) pairs only, not the vocabulary-expanded
  *    corpus. Document length rides the explode projection (it is
  *    functionally dependent on doc_id), so no corpus-scale dl join exists.
  *  - `queries` must be SMALL BY CONSTRUCTION (bounded count, not a corpus
  *    fraction) — that contract is what justifies the explicit `broadcast()`
  *    on the term set, per-term document frequencies, and the (q_id, term)
  *    frame. Unlike [[Decontam.contaminationReport]] (where the eval side's
  *    smallness is an empirical fact AQE verifies at runtime), here smallness
  *    is part of the operator's API contract, so a compile-time hint is the
  *    honest plan: the corpus probe side carries no Exchange at all, not even
  *    shuffle map writes that an AQE-converted join would still pay.
  *  - Corpus-wide scalars (N, Σdl) come from one tiny single-row aggregate
  *    that is explicitly broadcast (1 row).
  *  - The final per-query top-k is a rank window, which Spark plans with a
  *    partial [[org.apache.spark.sql.execution.window.WindowGroupLimitExec]]
  *    BELOW the q_id exchange: every upstream partition forwards at most k
  *    rows per query, so a stopword-heavy query matching a corpus-sized doc
  *    set funnels at most (#partitions × k) rows — not the full match set —
  *    into the per-query partition. `PlanAuditSpec` pins this shape.
  *
  * Determinism contract (shared with the DuckDB oracle): per-term scores are
  * rounded to integer MICROS before summation, so the cross-term sum is
  * associative integer arithmetic and summation order can never change the
  * result. Caveat, honestly stated: the per-term float expression itself
  * contains one `ln`, and `ln` is only faithfully-rounded (≤1 ulp) — JVM
  * `Math.log` and a platform libm may differ in the last bit, so a per-term
  * product landing within ~1e-10 of a `floor(x·1e6 + 0.5)` boundary can
  * round differently across engines. That is a ~1e-9-per-term event, not an
  * impossibility; the contract is "integer-exact given identical per-term
  * doubles, and boundary-collision-safe to ≈1e-9 per term", not bitwise
  * cross-engine identity of `ln`.
  */
object Retrieval {

  /** BM25 idf, Lucene form: `ln(1 + (N - df + 0.5)/(df + 0.5))` — always
    * positive, so stopword-heavy queries cannot produce negative terms. */
  def bm25Idf(nDocs: Column, df: Column): Column =
    log(lit(1.0) + (nDocs.cast("double") - df.cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5)))

  /** Top-k BM25 matches per query. `queries` must be a small frame with
    * columns (`q_id`, `q_text`) — bounded count by contract, see the class
    * doc; terms are the lowercased space-split words.
    * Output: (q_id, rank, doc_id, score_micro) — the score in integer micros.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      split(lower(col(textCol)), " ").as("ws"))
    // one row: corpus size + total token count (exact integer aggregates);
    // a second map-side corpus scan, never a shuffle
    val stats = words.select(size(col("ws")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val qTerms = queries.select(col("q_id"),
        explode(array_distinct(split(lower(col("q_text")), " "))).as("term"))

    // Term filter BELOW the aggregate: explode → broadcast-join the query
    // term set → THEN groupBy. The corpus-scale frame meets only a broadcast
    // build; the first (and only) corpus-derived shuffle is the tf groupBy
    // over matched pairs. dl is carried through the explode projection
    // (functionally dependent on doc_id) instead of joined back at corpus
    // scale.
    val matched = words
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("term"))
      .join(broadcast(qTerms.select("term").distinct()), "term")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

    // document frequency per matched term: ≤ |query vocabulary| rows
    val dfPerTerm = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = matched
      .join(broadcast(dfPerTerm), "term")
      .join(broadcast(qTerms), "term")
      .crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val termScore = bm25Idf(col("n_docs"), col("df")) *
      (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    import org.apache.spark.sql.expressions.Window
    scored
      .groupBy("q_id", "doc_id")
      .agg(sum(floor(termScore * lit(1000000.0) + lit(0.5))).as("score_micro"))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc_id"), col("score_micro"))
  }

  /** Per-document top-k KEYWORD extraction by integer tf–idf — the tagging
    * / routing / index-key step of a corpus pipeline (what to call a doc,
    * which shard lexicon it feeds), the per-doc mirror of [[bm25TopK]]'s
    * corpus-query direction.
    *
    * Score: `score_micros = tf · 10^6 div df` — the LINEAR inverse-df
    * variant of tf-idf (n_docs is a per-corpus constant, so ranking by
    * tf/df equals ranking by tf·(n/df); dropping the factor keeps every
    * value exact integer, bounded by tf·10^6 — no overflow at any corpus
    * size and no float log to disagree with the oracle). Stopwords
    * self-attenuate (df ≈ N ⇒ score ≈ tf); `maxDfPermille` < 1000
    * additionally DROPS terms present in more than that share of docs —
    * the explicit stopword cut real pipelines apply.
    *
    * 100 TB posture: tf groupBy (doc, term) with map-side partials, df is
    * a second partial-able aggregate over the tf frame (vocabulary-sized,
    * Heaps' law ≪ corpus), the idf join is term-keyed against that
    * vocabulary frame, and the per-doc top-k plans as a partial
    * WindowGroupLimit below the doc exchange (the q69 shape) — every
    * stage keyed, nothing corpus-scale crosses a broadcast threshold by
    * assumption. */
  def keywordsTopK(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, maxDfPermille: Long = 1000L): DataFrame = {
    require(k >= 1, s"keywordsTopK: k must be >= 1, got $k")
    require(maxDfPermille >= 1 && maxDfPermille <= 1000,
      s"keywordsTopK: maxDfPermille in [1, 1000], got $maxDfPermille")
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(col(idCol)).agg(count(lit(1)).as("n_docs"))
    import org.apache.spark.sql.expressions.Window
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs)) // 1-row corpus size, for the df cut only
      .filter(col("df") * 1000L <= lit(maxDfPermille) * col("n_docs"))
      .withColumn("score_micros", expr("tf * 1000000L div df"))
      .withColumn("rank", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score_micros").desc, col("term"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        col("score_micros"))
  }
}
