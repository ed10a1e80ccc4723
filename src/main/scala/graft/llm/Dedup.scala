package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * Scale posture (the 100 TB contract):
  *  - NOTHING here does an all-pairs comparison. Candidate generation is
  *    bucket-based (LSH banding): only documents sharing a band bucket meet in
  *    the join, so the shuffle is keyed on band hashes and the quadratic blowup
  *    is confined to genuine near-duplicate clusters.
  *  - Signatures are computed per-row with higher-order functions (no shuffle,
  *    no UDF), so the heavy part is embarrassingly parallel map work.
  *  - Exact dedup is a hash-groupBy (map-side partial aggregation applies);
  *    never a self-join.
  */
object Dedup {

  /** Distinct word n-gram shingles of a lowercased text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(lower(text), " ")
    array_distinct(
      when(size(words) >= n,
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** MinHash signature: element h is the minimum md5 of `h || ':' || shingle`
    * over all shingles — a per-row computation, no shuffle. Using md5 keeps the
    * signature engine-portable (the DuckDB oracle computes the same bytes). */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(sh, s => md5(concat(h.cast("string"), lit(":"), s)))))

  /** LSH band keys for a signature: `bands` buckets of `rows` hashes each;
    * key = md5 over the band's slice. Returns ARRAY<STRUCT<b INT, bkey STRING>>. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("b"),
        md5(concat(
          b.cast("string") +: lit("|") +:
            (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*)).as("bkey")))

  /** Near-duplicate pairs via MinHash + LSH banding + exact Jaccard verify.
    * Output: (doc_a, doc_b, jac) with doc_a < doc_b, jac >= `threshold`.
    *
    * Plan shape: map (shingle+sign) → explode bands → shuffle on (b, bkey)
    * self-join → distinct pairs → re-join signatures for the verify. No
    * cross-join anywhere; at 1000 executors every stage partitions on either
    * the band key or the doc id. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 12, bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sig = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("mh", minhashSignature(col("sh"), numHashes))

    val bandDf = sig
      .select(col("doc_id"), explode(bandKeys(col("mh"), bands, rows)).as("band"))
      .select(col("doc_id"), col("band.b").as("b"), col("band.bkey").as("bkey"))

    val cand = bandDf.as("x").join(bandDf.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sh = sig.select(col("doc_id"), col("sh"))
    cand
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  /** Exact-duplicate groups on a content key: hash-groupBy keeping the minimum
    * id as the canonical survivor. `keyExpr` is the normalized content (e.g.
    * `md5(text)` or a normalization thereof). */
  def exactDupGroups(docs: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    docs.groupBy(keyExpr.as("content_key"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_dups"),
        concat_ws(",", sort_array(collect_list(col(idCol)))).as("members"))

  private def shr(a: Column, b: Column): Column = call_function("shiftright", a, b)
  private def shlL(a: Column, b: Column): Column = call_function("shiftleft", a, b)

  /** 60-bit SimHash over shingle tokens: bit j of the hash is the sign of the
    * sum over tokens of (bit j of md5(token) → ±1). Single pass over the
    * tokens (each md5 computed once), per-row, shuffle-free. 60 bits = the
    * first 15 hex chars of md5, so the value fits a signed long and the DuckDB
    * oracle can parse the identical integer (`('0x'||substr(md5(w),1,15))::BIGINT`).
    *
    * Tokens are word 3-gram shingles, not bare words: on corpora drawn from a
    * small vocabulary every document contains nearly every word, so a
    * bag-of-WORDS simhash collapses (measured: background pairs at Hamming 0);
    * shingle sets keep background pairs ~random (Hamming ≈ 30) while true
    * near-duplicates stay ≤ ~10. */
  def simhash64(text: Column): Column = {
    val words = shingles(text, 3)
    val zero = transform(sequence(lit(0), lit(59)), _ => lit(0L))
    val tokBits = (w: Column) => {
      val h = conv(substring(md5(w), 1, 15), 16, 10).cast("long")
      transform(sequence(lit(0), lit(59)),
        j => when(shr(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
    }
    val sums = aggregate(words, zero, (acc, w) => zip_with(acc, tokBits(w), (a, b) => a + b))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(59)), (s, j) => when(s > 0, shlL(lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** SimHash near-duplicate pairs: band the 60-bit hash into four 15-bit
    * buckets (any shared band ⇒ candidate — Hamming-LSH), then verify
    * `hamming <= maxDist`. Same no-all-pairs discipline as [[nearDupPairs]]. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 10): DataFrame = {
    val withH = docs.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sh"))
    val bandDf = withH.select(col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("b"), shr(col("sh"), b * 15).bitwiseAND(lit(0x7FFFL)).as("bkey")))).as("band"))
      .select(col("doc_id"), col("sh"), col("band.b").as("b"), col("band.bkey").as("bkey"))
    bandDf.as("x").join(bandDf.as("y"),
        col("x.b") === col("y.b") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hamming(col("x.sh"), col("y.sh")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Exact n-gram Jaccard similarity between two text columns (for pair
    * verification / small candidate sets). */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val (sa, sb) = (shingles(a, n), shingles(b, n))
    size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
  }
}
