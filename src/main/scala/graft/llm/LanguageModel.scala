package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the CCNet/KenLM-shaped quality signal: a
  * cheap LM is trained on a corpus and each document is scored by its
  * negative log-likelihood under it; low-probability documents (gibberish,
  * boilerplate soup, wrong-language fragments) score high and are filtered
  * or down-weighted. Real pipelines train KenLM on a reference corpus
  * (e.g. Wikipedia); this operator trains an add-α bigram model on the
  * corpus itself — the same signal shape with zero external artifacts, and
  * the train corpus is a parameter so a reference corpus drops in.
  *
  * Scale posture (the 100 TB contract):
  *  - ONE corpus scan and one corpus-scale shuffle: the per-doc bigram
  *    multiplicities (`groupBy(doc, w1, w2)` — map-side combinable) are
  *    PERSISTED, because four downstream frames (model, heads, vocabulary,
  *    and the scoring join's probe side) all derive from them — uncached,
  *    Spark recomputes the explode chain once per consumer (the measured
  *    plan had four parquet scans and no exchange reuse). The model frame
  *    is persisted too: heads and the vocabulary scalar re-aggregate it,
  *    and it is vocabulary-scale, not corpus-scale.
  *  - Head counts and the vocabulary scalar derive from the MODEL frame;
  *    the model is enriched with its head totals model-side, so the
  *    corpus-derived pairs frame meets ONE join — on (w1, w2), the key
  *    both sides are already aggregated by. No broadcast hint: vocabulary
  *    size is corpus-dependent (AQE decides), unlike BM25's
  *    by-contract-small query set.
  *  - The final per-doc score is a groupBy over matched pairs — keyed by
  *    doc_id, map-side combinable.
  *
  * Determinism contract (shared with the DuckDB oracle, same as
  * [[Retrieval]]): each bigram's NLL term is rounded to integer MICROS
  * (`floor(x·1e6 + 0.5)`) before the weighted integer sum and integer
  * division, so summation order cannot change the result; the `ln` caveat
  * in Retrieval's doc applies identically.
  */
object LanguageModel {

  /** Per-document average bigram negative log-likelihood, in integer
    * micro-nats. Add-α smoothing: `P(w2|w1) = (c(w1,w2) + α) /
    * (c(w1) + α·V)` with `V` = number of distinct head words; `c(w1)` is
    * the bigram-head count (= Σ_w2 c(w1,w2)), so P is a proper conditional.
    * Documents with fewer than two words have no bigrams and are omitted.
    * Output: (doc_id, n_bigrams, avg_nll_micro). */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                alpha: Double = 0.5): DataFrame =
    bigramNllManaged(docs, idCol, textCol, alpha)._1

  /** [[bigramNll]] plus the cleanup handle for the two cached frames (same
    * managed-persist contract as [[Dedup.jaccardJoin]]). */
  def bigramNllManaged(docs: DataFrame, idCol: String, textCol: String,
                       alpha: Double = 0.5): (DataFrame, () => Unit) = {
    val ws = docs
      .select(col(idCol).as("doc_id"), split(lower(col(textCol)), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    // adjacent pairs via a 0-based index transform; explode once, then
    // pre-aggregate per (doc, bigram) so repeated bigrams ride as one row
    // with a multiplicity into everything downstream — persisted: four
    // consumers (model, and through it heads/vocab, plus the scoring join)
    val pairs = ws
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // the model: corpus bigram counts from the aggregated pairs; head counts
    // and vocabulary derive from the MODEL (vocabulary-scale inputs)
    val model = pairs.groupBy("w1", "w2").agg(sum("m").as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val heads = model.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = heads.agg(count(lit(1)).as("v"))
    val enriched = model.join(heads, "w1") // model-scale enrich: AQE decides

    val p = (col("c12").cast("double") + lit(alpha)) /
      (col("c1").cast("double") + lit(alpha) * col("v").cast("double"))
    val termMicro = floor(-log(p) * lit(1000000.0) + lit(0.5))

    val out = pairs
      .join(enriched, Seq("w1", "w2")) // the one corpus-derived join
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(sum(col("m")).cast("long").as("n_bigrams"),
        sum(col("m") * termMicro).cast("long").as("sum_nll_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_nll_micro div n_bigrams").as("avg_nll_micro"))
    (out, () => { model.unpersist(); pairs.unpersist(); () })
  }

  /** Per-document OUT-OF-VOCABULARY rate against the corpus' own top-`topK`
    * word vocabulary — the tokenizer/vocabulary-coverage signal a training
    * pipeline measures before committing to a token budget ("how much of
    * each document would fall to <unk> under a K-word vocabulary"): a doc
    * dominated by OOV occurrences is noise, non-target-language, or a
    * vocabulary-expansion candidate.
    *
    * Semantics: the vocabulary is the `topK` words by (occurrence count
    * DESC, word ASC) — a total order, so the K-boundary is engine-portable;
    * OOV is counted over word OCCURRENCES (not distinct words), so the rate
    * weights by how much of the document's token mass is uncovered.
    * `oov_micros` = n_oov·10^6 div n_words (exact integers; null for
    * zero-gram docs). One row per input document.
    *
    * Scale posture: one occurrence explode → one word-keyed count (map-side
    * combinable) → a `topK`-bounded TakeOrdered for the vocabulary → a
    * BROADCAST membership join per occurrence (the vocab is K rows by
    * construction — the one frame here that provably never scales with the
    * corpus) → one doc-keyed aggregate. Never a corpus sort. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              topK: Int = 500): DataFrame = {
    require(topK >= 1, s"oovRate: topK must be >= 1, got $topK")
    val occ = docs.select(col(idCol).as("doc_id"),
      explode(split(lower(col(textCol)), " ")).as("__w"))
    val vocab = occ.groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w"))
      .limit(topK)
      .select(col("__w"), lit(1).as("__iv"))
    val per = occ.join(broadcast(vocab), Seq("__w"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(col(idCol).as("doc_id")).join(per, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_words"), lit(0L)) > 0,
          expr("n_oov * 1000000 div n_words")).as("oov_micros"))
  }

  /** Per-(doc, bigram) multiplicities of a corpus: (doc_id, w1, w2, m) —
    * one explode + one map-side-combinable groupBy. Unpersisted. */
  private def pairsFrame(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(lower(col(textCol)), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))

  /** CROSS-corpus LM scoring: score `scoreDocs` under a bigram model trained
    * on `trainDocs` — the shape behind importance-weighted data selection
    * (DSIR, Xie et al. 2023: weight = NLL under the raw model − NLL under the
    * target model) and CCNet's "score the crawl under a Wikipedia LM".
    *
    * Differs from [[bigramNll]] (which scores the training corpus itself) in
    * that scored bigrams may be ABSENT from the model: joins are LEFT, with
    * add-α backoff — unseen (w1,w2) under a seen head scores (0+α)/(c1+αV);
    * an unseen head scores α/(αV) = 1/V. `crossNll(docs, docs)` is
    * value-identical to `bigramNll(docs)` (every bigram present ⇒ the left
    * joins all match), a property the spec asserts.
    *
    * Scale posture: two corpus-scale keyed shuffles (the two pairs
    * aggregates); the score side meets the model in ONE (w1,w2) join plus one
    * (w1) heads join — both on already-aggregated keys, no broadcast hint
    * (vocabulary size is corpus-dependent; AQE decides). Same integer-micros
    * determinism contract as [[bigramNll]].
    * Output: (doc_id, n_bigrams, avg_nll_micro). */
  def crossNll(scoreDocs: DataFrame, trainDocs: DataFrame,
               idCol: String, textCol: String, alpha: Double = 0.5): DataFrame =
    crossNllManaged(scoreDocs, trainDocs, idCol, textCol, alpha)._1

  /** [[crossNll]] plus the cleanup handle for the cached model frame. */
  def crossNllManaged(scoreDocs: DataFrame, trainDocs: DataFrame,
                      idCol: String, textCol: String,
                      alpha: Double = 0.5): (DataFrame, () => Unit) = {
    // train side: bigram counts need no doc dimension — aggregate straight
    // to the model key (one shuffle), then heads/vocab derive from the
    // persisted vocabulary-scale model frame
    val model = pairsFrame(trainDocs, idCol, textCol)
      .groupBy("w1", "w2").agg(sum("m").as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val heads = model.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = heads.agg(count(lit(1)).as("v"))

    val p = (coalesce(col("c12"), lit(0L)).cast("double") + lit(alpha)) /
      (coalesce(col("c1"), lit(0L)).cast("double") + lit(alpha) * col("v").cast("double"))
    val termMicro = floor(-log(p) * lit(1000000.0) + lit(0.5))

    val out = pairsFrame(scoreDocs, idCol, textCol)
      .join(model, Seq("w1", "w2"), "left")
      .join(heads, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(sum(col("m")).cast("long").as("n_bigrams"),
        sum(col("m") * termMicro).cast("long").as("sum_nll_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_nll_micro div n_bigrams").as("avg_nll_micro"))
    (out, () => { model.unpersist(); () })
  }
}
