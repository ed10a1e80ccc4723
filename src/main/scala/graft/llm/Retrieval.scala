package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: BM25 (Robertson/Lucene form)
  * top-k scoring of a small query set against the full corpus — the standard
  * sparse-retrieval pass a training-data pipeline uses for doc-as-query
  * similarity, eval-set leakage triage, and quality-by-retrievability audits.
  *
  * Scale posture (the 100 TB contract):
  *  - The ONLY corpus-scale work is the postings build: one explode + one
  *    hash-groupBy on (doc_id, term) with map-side partial aggregation. No
  *    corpus self-join, no per-query pass over the corpus.
  *  - The query side is small by construction; its distinct term set sits
  *    behind a shuffle, so AQE broadcasts the probe join and corpus postings
  *    are filtered map-side to query terms BEFORE any further shuffle —
  *    document frequencies, lengths, and scores are computed on the filtered
  *    (queries × matched docs) frame only.
  *  - Corpus-wide scalars (N, Σdl) come from one tiny aggregate that Spark
  *    broadcast-joins (1 row).
  *
  * Determinism contract (shared with the DuckDB oracle): per-term scores are
  * rounded to integer MICROS before summation, so the cross-term sum is
  * associative integer arithmetic — the float expression tree (one ln, IEEE
  * mul/div) is evaluated identically per term by any engine, and summation
  * order can never change the result.
  */
object Retrieval {

  /** BM25 idf, Lucene form: `ln(1 + (N - df + 0.5)/(df + 0.5))` — always
    * positive, so stopword-heavy queries cannot produce negative terms. */
  def bm25Idf(nDocs: Column, df: Column): Column =
    log(lit(1.0) + (nDocs.cast("double") - df.cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5)))

  /** Top-k BM25 matches per query. `queries` must be a small frame with
    * columns (`q_id`, `q_text`); terms are the lowercased space-split words.
    * Output: (q_id, rank, doc_id, score_micro) — the score in integer micros.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      split(lower(col(textCol)), " ").as("ws"))
    val dl = words.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
    val tf = words.select(col("doc_id"), explode(col("ws")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val qTerms = queries.select(col("q_id"),
        explode(array_distinct(split(lower(col("q_text")), " "))).as("term"))
    // one row: corpus size + total token count (exact integer aggregates)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

    // postings filtered to query terms FIRST (AQE broadcasts the small side),
    // then df/dl/idf on the filtered frame only
    val matched = tf.join(qTerms.select("term").distinct(), "term")
    val dfPerTerm = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = matched
      .join(dl, "doc_id")
      .join(dfPerTerm, "term")
      .join(qTerms, "term")
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
}
