package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus novelty scoring — how much of each document's n-gram content is
  * NEW relative to everything that came before it in corpus order.
  *
  * The measurement behind dataset-redundancy curves (how fast a growing
  * crawl stops contributing new text) and behind "freshness" selection
  * policies: a document whose 8-grams have all been seen in earlier
  * documents is a rephrase/boilerplate candidate even when no single
  * earlier document is a near-duplicate (MinHash/SimHash find PAIRS; this
  * finds diffuse redundancy against the whole prefix of the corpus).
  *
  * Semantics: a gram's OWNER is the smallest `idCol` containing it; a gram
  * is novel for exactly its owner. `novelty_micros` = novel-gram share of
  * the document's distinct grams, in integer micro-units (exact, no float
  * drift between engines).
  *
  * Spark-first shape and 100 TB posture: distinct word n-grams per doc
  * (row-local, codegen), one gram-keyed partial-aggregated `min(id)` — the
  * same shuffle the repeated-span and decontam tiers run — an equi-join
  * back on the gram (exchange reuse: the aggregate's partitioning feeds
  * the join), then one doc-keyed aggregate. No driver state, no sort, no
  * cartesian; hot grams are 1:N joins against a single owner row. */
object Novelty {

  /** Per-document novelty against the `idCol`-ordered corpus prefix.
    *
    * Returns one row per input document: `idCol`, `n_grams` (distinct word
    * `n`-grams, 0 for docs shorter than `n` words), `n_novel` (grams this
    * document owns), `novelty_micros` (= n_novel·10^6 div n_grams, null
    * when the document has no grams).
    *
    * Tokenization is the catalog's standard: lowercase, split on a single
    * space (empty tokens preserved — both engines agree). Grams are built
    * with [[Dedup.hashedGramSets]] — per-word xxhash64 once, gram =
    * xxhash64 of the n consecutive word hashes — never as strings: gram
    * STRING construction (an O(n) array_join per gram) was the measured
    * hot path, and the shuffle keys on 8-byte longs. Every OUTPUT is a
    * count — identical to the string-gram computation absent a 64-bit
    * collision between two distinct grams of the corpus (the q33
    * hash-invariance argument; the oracle computes the string form and
    * hash-matches). */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val exploded = Dedup.hashedGramSets(
        docs.select(col(idCol).as("doc_id"), col(textCol)), "doc_id", textCol, n)
      .select(col("doc_id").as(idCol), explode(col("sh")).as("__gram"))
    // the gram's owner: the earliest document containing it
    val owner = exploded.groupBy("__gram").agg(min(col(idCol)).as("__owner"))
    val per = exploded.join(owner, "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__owner") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          expr("n_novel * 1000000 div n_grams")).as("novelty_micros"))
  }
}
