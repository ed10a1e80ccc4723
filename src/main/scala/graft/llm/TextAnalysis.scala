package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting. All per-row column
  * compositions (whole-stage codegen, shuffle-free); ratios are integer
  * permille so results are bit-identical across engines. */
object TextAnalysis {

  /** Small per-language stopword lists for the n-gram/stopword-hit heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "von", "auf", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pour", "avec", "dans", "une", "des"),
    "es" -> Seq("el", "los", "y", "es", "para", "con", "las", "una", "por", "del"))

  def words(text: Column): Column = split(lower(text), " ")

  /** Stopword hits of `text` against one language's list. */
  def stopwordHits(text: Column, lang: String): Column = {
    val list = array(stopwords.toMap.apply(lang).map(lit): _*)
    size(filter(words(text), w => array_contains(list, w))).cast("long")
  }

  /** Predicted language: argmax of stopword hits with a fixed priority
    * tie-break (en > de > fr > es) — deterministic and trivially portable. */
  def langId(text: Column): Column = {
    val s = stopwords.map { case (l, _) => l -> stopwordHits(text, l) }.toMap
    when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es"), "en")
      .when(s("de") >= s("fr") && s("de") >= s("es"), "de")
      .when(s("fr") >= s("es"), "fr")
      .otherwise("es")
  }

  /** Integer permille (0..1000) of `part` in `whole`. Floor of the double
    * quotient equals exact integer division for the magnitudes involved
    * (both ≤ ~1e9, quotient ≥ 1e-9 away from any non-equal integer), so both
    * engines produce the identical BIGINT. */
  def permille(part: Column, whole: Column): Column =
    when(whole === 0, lit(0L))
      .otherwise(floor((lit(1000) * part).cast("double") / whole.cast("double")).cast("long"))

  /** Whitespace token count. */
  def wsTokens(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish subword token count: alpha runs, digit runs, and single
    * non-alphanumeric marks — the classic pre-tokenizer regex. */
  def subwordTokens(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** MinHash-style document fingerprint: minimum 60-bit shingle hash over word
    * 4-gram shingles (a 1-hash winnowing fingerprint) — robust to local edits,
    * one md5 per shingle. */
  /** Document fingerprints as a FRAME op (doc_id, fp): minimum 4-gram hash
    * built from once-per-word md5s combined arithmetically over
    * [[Dedup.wordHashFrame]] — min is duplicate-insensitive. Frame-level (not
    * a Column) because the word-hash array needs the aggregate
    * materialization barrier (see wordHashFrame's warning). */
  def fingerprints(docs: org.apache.spark.sql.DataFrame,
                   idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    Dedup.wordHashFrame(docs, idCol, textCol)
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")), "doc_id")
      .select(col("doc_id"),
        coalesce(
          array_min(Dedup.ngramHashes(col("whs"), 4)),
          Dedup.shingleHash(lower(col("__text"))) % Dedup.MinhashP).as("fp"),
        md5(lower(col("__text"))).as("fp_full"))
}
