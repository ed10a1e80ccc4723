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
  def fingerprint(text: Column): Column =
    // Raw (non-distinct) shingles: min is duplicate-insensitive, and
    // array_distinct over ~1e3-element arrays is pure overhead here.
    // array_min of an empty array is NULL, so coalesce expresses the
    // no-shingles fallback with a SINGLE reference to the shingle expression
    // (a when(size(sh)>0, ...) guard evaluates the array twice).
    coalesce(
      array_min(transform(Dedup.shinglesRaw(text, 4), s => Dedup.shingleHash(s))),
      Dedup.shingleHash(lower(text)))
}
