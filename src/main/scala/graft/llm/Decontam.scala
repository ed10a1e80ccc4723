package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word n-grams
  * with a held-out evaluation/benchmark set, so they can be dropped (or
  * down-weighted) before training. This is the standard n-gram-overlap
  * decontamination pass from the public LLM-corpus literature (exact n-gram
  * collision against the eval set), expressed Spark-first.
  *
  * Scale posture (the 100 TB contract):
  *  - The benchmark side is SMALL BY CONSTRUCTION — eval sets are megabytes
  *    while the corpus is the 100 TB side. Its distinct n-gram set sits behind
  *    a shuffle (distinct), so AQE observes its true size at runtime and
  *    converts the probe join to a broadcast hash join; the corpus n-grams are
  *    then matched map-side and NEVER shuffle. (No broadcast hint on purpose —
  *    same reasoning as [[Dedup.wordHashFrame]]'s dictionary: a hint is
  *    honored regardless of size; AQE is honored only when it fits.)
  *  - N-grams travel as 8-byte integer hashes (stepwise-mod polynomial over
  *    the once-per-distinct-word md5 dictionary from [[Dedup.wordHashFrame]]),
  *    never as strings: the join key is a long, not a ~50-byte shingle. The
  *    modulus is a 58-bit prime ([[DecontamP]]), NOT minhash's 31-bit one —
  *    a 31-bit gram space saturates at corpus scale and would flood the
  *    report with hash-collision false positives (see [[DecontamP]]).
  *  - The aggregate is a hash-groupBy on doc_id with map-side partial
  *    aggregation; nothing here is all-pairs.
  */
object Decontam {

  import Dedup.MinhashP

  /** N-gram hash modulus: the largest prime below 2^58. Minhash needs its
    * 31-bit prime ([[Dedup.MinhashP]]) so the `a·x + b` permutation products
    * fit a signed 64-bit long, but decontamination has no permutation family —
    * and a 31-bit gram space SATURATES at scale: a 100 TB corpus holds ~10^10
    * distinct n-grams, so under mod 2^31 essentially every hash value occurs
    * and every benchmark n-gram "hits" spurious documents (≈10^9 false pairs
    * for a 10^6-gram eval set). At 2^58 the same workload expects ~10^4 false
    * pairs corpus-wide — negligible next to real overlap. The bound is exact
    * arithmetic in BOTH engines: fold intermediates are at most
    * `31·(P−1) + (2^31−1) < 2^63 − 1` (word-hash inputs stay mod-2^31), so
    * JVM longs never wrap and DuckDB's overflow-checked BIGINT never raises. */
  val DecontamP = 288230376151711717L

  /** Word n-gram hashes with the modulus applied at EVERY fold step:
    * `h_{k+1} = (h_k · 31 + w_{k+1}) mod p`, so intermediates stay below
    * `31·p + 2^31` and the value is reproducible by any engine with 64-bit
    * integer arithmetic (DuckDB raises on BIGINT overflow, so
    * [[Dedup.ngramHashes]]'s mod-at-the-end form is only portable for n ≤ 7;
    * this form works for any n, for any `p` up to [[DecontamP]]'s 2^58
    * bound). `wh` MUST be a materialized attribute ([[Dedup.wordHashFrame]]
    * output) — see the re-evaluation trap documented there. */
  def ngramHashesMod(wh: Column, n: Int, p: Long = DecontamP): Column =
    when(size(wh) >= n,
      transform(sequence(lit(0), size(wh) - n),
        i => (1 until n).foldLeft(element_at(wh, i + 1))(
          (acc, j) => (acc * 31L + element_at(wh, i + j + 1)) % p)))
      .otherwise(array().cast("array<bigint>"))

  /** Contamination report: one row per CORPUS document that shares at least
    * one word `n`-gram with ANY benchmark document.
    *
    * Output: (doc_id, n_hits, n_ngrams, hit_permille) where `n_hits` counts
    * the document's DISTINCT n-grams that appear in the benchmark set,
    * `n_ngrams` its total distinct n-grams, and `hit_permille` the integer
    * contamination ratio ‰ (integer `div` — deterministic across engines,
    * unlike a double divide + truncate).
    */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val corpusNgrams = Dedup.wordHashFrame(corpus, idCol, textCol)
      .select(col("doc_id"), array_distinct(ngramHashesMod(col("whs"), n)).as("ngs"))
      .select(col("doc_id"), size(col("ngs")).cast("long").as("n_ngrams"),
        explode(col("ngs")).as("ng"))
    val benchNgrams = Dedup.wordHashFrame(benchmark, idCol, textCol)
      .select(explode(ngramHashesMod(col("whs"), n)).as("ng"))
      .distinct()
    corpusNgrams.join(benchNgrams, "ng")
      .groupBy("doc_id", "n_ngrams")
      .agg(count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("n_hits"), col("n_ngrams"),
        expr("n_hits * 1000 div n_ngrams").as("hit_permille"))
  }

  /** Cross-source n-gram overlap matrix — the LEAKAGE MATRIX between the
    * corpus's own sources: for every unordered source pair, how many
    * distinct word n-grams they share and the Jaccard of their source-level
    * gram SETS (integer micros). [[contaminationReport]] answers "is this
    * corpus contaminated by that benchmark"; this answers "which of my own
    * sources duplicate each other" — the first diagnostic before assigning
    * mixing weights ([[Selection.mixSources]]) or deduplicating across
    * sources (two mirrors of the same crawl should not both get full
    * weight).
    *
    * Scale posture: one doc-keyed join attaches the source to the word-hash
    * frame (two narrow corpus-scale frames, equi-keyed); the corpus then
    * collapses to DISTINCT (source, gram) pairs — one partial-aggregated
    * groupBy — after which everything is vocabulary-scale: the gram-keyed
    * pair self-join fans out ≤ |sources|²/2 per gram (sources are an enum,
    * not a scale axis) and the matrix aggregate is metadata-scale. */
  def crossSourceOverlap(corpus: DataFrame, sourceCol: String, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val sg = Dedup.wordHashFrame(corpus, idCol, textCol)
      .join(corpus.select(col(idCol).as("doc_id"), col(sourceCol).as("source")),
        "doc_id")
      .select(col("source"), explode(ngramHashesMod(col("whs"), n)).as("ng"))
      .groupBy("source", "ng").agg(count(lit(1)).as("__dup")) // distinct pairs
      .select("source", "ng")
    val totals = sg.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val shared = sg.as("a").join(sg.as("b"),
        col("a.ng") === col("b.ng") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
    shared
      .join(totals.select(col("source").as("src_a"), col("n_grams").as("n_a")), "src_a")
      .join(totals.select(col("source").as("src_b"), col("n_grams").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("shared_grams"),
        expr("shared_grams * 1000000L div (n_a + n_b - shared_grams)").as("jac_micros"))
  }

  /** SPAN-level contamination mask — [[contaminationReport]]'s surgical
    * sibling: instead of flagging whole documents for DROPPING, locate the
    * exact word spans whose n-grams collide with the benchmark set and merge
    * them into maximal `[start, end)` ranges ([[Dedup.mergeIslands]]).
    * Feeding the result to [[Dedup.removeSpans]] masks the contamination
    * while KEEPING the rest of the document — the right trade when the
    * overlap is a quoted benchmark question inside an otherwise-clean page
    * (dropping the page wastes data; keeping it leaks the eval).
    *
    * Same scale posture as the report: gram hashes from the shared word
    * dictionary, benchmark side distinct + AQE-broadcast, corpus grams never
    * shuffle for the probe; only COLLIDING positions (rare by construction)
    * reach the doc-keyed island merge. */
  def contaminationSpans(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val grams = Dedup.wordHashFrame(corpus, idCol, textCol)
      .select(col("doc_id"),
        posexplode(ngramHashesMod(col("whs"), n)).as(Seq("p", "ng")))
    val benchNgrams = Dedup.wordHashFrame(benchmark, idCol, textCol)
      .select(explode(ngramHashesMod(col("whs"), n)).as("ng"))
      .distinct()
    Dedup.mergeIslands(grams.join(benchNgrams, "ng").select(col("doc_id"), col("p")), n)
  }

  /** N-gram hashes computed DIRECTLY from a materialized words array — no
    * word dictionary. Value-identical to [[ngramHashesMod]] over
    * [[Dedup.wordHashFrame]] output (the dictionary never changes the hash, a
    * word's value is content-deterministic md5 mod P; it only amortizes the
    * md5 over occurrences vs this form's one md5 per word PER ROW). The
    * right trade exactly where this is used: a streaming micro-batch (the
    * dictionary's corpus-wide distinct aggregate would add a stateful
    * stage) and row-local sketch probes (q70 — a dictionary join would
    * reintroduce the shuffle the sketch exists to avoid).
    * `words` MUST be a materialized attribute (see the re-evaluation trap in
    * [[Dedup.wordHashFrame]]: an inline `split` would be re-evaluated per
    * `element_at`, turning O(len·n) into O(len²·n)). The per-word hashes are
    * let-bound to a lambda variable INSIDE the expression (a bound value —
    * immune to CollapseProject re-inlining), so md5 runs once per word, not
    * once per (gram, position): the inlined form measured ~8× slower at n=8
    * with identical output. */
  def ngramHashesDirect(words: Column, n: Int, p: Long = DecontamP): Column = {
    def let(value: Column, body: Column => Column): Column =
      element_at(transform(array(value), body), 1)
    let(transform(words, w => Dedup.shingleHash(w) % MinhashP), whs =>
      when(size(whs) >= n,
        transform(sequence(lit(0), size(whs) - n),
          i => (1 until n).foldLeft(element_at(whs, i + 1))(
            (acc, j) => (acc * 31L + element_at(whs, i + j + 1)) % p)))
        .otherwise(array().cast("array<bigint>")))
  }

  /** Streaming SPAN-level decontamination scrub: the stream-static form of
    * the q54 composition ([[contaminationSpans]] → [[Dedup.removeSpans]]) —
    * each micro-batch's documents are probed against the STATIC benchmark
    * n-gram set, colliding gram positions are merged into maximal spans, and
    * each document is re-emitted with those spans cut out. The shape a live
    * ingest pipeline needs: scrub-on-arrival, with the batch composition
    * remaining the full-corpus audit.
    *
    * Column parity with [[Dedup.removeSpans]]: (doc_id, n_words, n_removed,
    * clean_text) for EVERY document — clean documents pass through with
    * n_removed = 0 — emitted when the watermark passes the document's event
    * time.
    *
    * Plan shape:
    *  - per-row gram hashing ([[ngramHashesDirect]]) with a Generate barrier
    *    materializing the words array; `posexplode_outer` keeps sub-n-word
    *    documents alive;
    *  - stream-static LEFT join against the bounded benchmark gram frame —
    *    stateless, static side re-planned per micro-batch, AQE-broadcast at
    *    its true (small) size;
    *  - ONE stateful operator: the per-document regroup keyed by the
    *    watermarked event time + doc_id, collecting the (rare) hit positions
    *    and the words array. Its state carries each document's words until
    *    the watermark passes — unavoidable for an operator that must rebuild
    *    the text — so state is bounded by watermark delay × ingest rate, the
    *    same contract as [[contaminationStream]] but text-sized; size the
    *    delay accordingly.
    *  - island merge + span removal after the aggregate are row-local folds
    *    (the batch path's window/groupBy become an in-row `aggregate` over
    *    the sorted hit positions — per-document data, never wider). */
  def spanScrubStream(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, benchmark: DataFrame, benchIdCol: String,
      benchTextCol: String, n: Int = 8, watermarkDelay: String = "10 minutes"): DataFrame = {
    val benchNgrams = Dedup.wordHashFrame(benchmark, benchIdCol, benchTextCol)
      .select(explode(ngramHashesMod(col("whs"), n)).as("ng"))
      .distinct()
      .withColumn("__hit", lit(1))
    docs
      .select(col(tsCol).as("__ts"), col(idCol).as("doc_id"),
        explode(array(split(lower(col(textCol)), " "))).as("__ws"))
      .select(col("__ts"), col("doc_id"), col("__ws"),
        posexplode_outer(ngramHashesDirect(col("__ws"), n)).as(Seq("p", "ng")))
      .withWatermark("__ts", watermarkDelay)
      .join(benchNgrams, Seq("ng"), "left")
      .groupBy(col("__ts"), col("doc_id"))
      .agg(first(col("__ws")).as("__ws"),
        sort_array(collect_list(when(col("__hit").isNotNull, col("p").cast("long"))))
          .as("ps"))
      // islands: chain hit positions at most n apart; (s, l) = first/last
      // start of the chain, span = [s, l + n)
      .withColumn("spans", expr(
        s"""aggregate(ps, cast(array() as array<struct<s: bigint, l: bigint>>),
           |  (acc, p) -> if(size(acc) = 0 or p > element_at(acc, -1).l + $n,
           |    concat(acc, array(struct(p as s, p as l))),
           |    concat(slice(acc, 1, size(acc) - 1),
           |      array(struct(element_at(acc, -1).s as s, p as l)))))""".stripMargin))
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        expr(s"aggregate(spans, cast(0 as bigint), (a, sp) -> a + sp.l + $n - sp.s)")
          .as("n_removed"),
        expr(s"array_join(filter(__ws, (w, i) -> " +
          s"!exists(spans, sp -> i >= sp.s and i < sp.l + $n)), ' ')")
          .as("clean_text"))
  }

  /** Streaming decontamination: the stream-static form of
    * [[contaminationReport]] — each micro-batch of incoming documents is
    * probed against the STATIC benchmark n-gram set, the shape a live ingest
    * pipeline uses (the batch operator remains the full-corpus audit).
    * Column parity with the batch report: (doc_id, n_hits, n_ngrams,
    * hit_permille), one row per contaminated document, emitted when the
    * watermark passes the document's event time.
    *
    * Plan shape, stateless until the last step:
    *  - per-row n-gram hashing via [[ngramHashesDirect]], with
    *    `explode(array(…))` Generate barriers materializing the words and
    *    gram arrays (CollapseProject does not merge across a Generate, so
    *    neither array is re-evaluated per consuming element);
    *  - the benchmark side is a bounded static frame: the stream-static
    *    equi-join on the 8-byte gram hash keeps NO state and re-plans the
    *    static side per micro-batch;
    *  - the only stateful operator is the per-document count, keyed by the
    *    watermarked event time + doc_id, so aggregate state is evicted as
    *    the watermark advances — bounded at any ingest rate, the same
    *    contract as [[graft.streaming.StreamingAggs.fingerprintDedup]]. */
  def contaminationStream(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, benchmark: DataFrame, benchIdCol: String,
      benchTextCol: String, n: Int = 8, watermarkDelay: String = "10 minutes"): DataFrame = {
    val benchNgrams = Dedup.wordHashFrame(benchmark, benchIdCol, benchTextCol)
      .select(explode(ngramHashesMod(col("whs"), n)).as("ng"))
      .distinct()
    docs
      .select(col(tsCol).as("__ts"), col(idCol).as("doc_id"),
        explode(array(split(lower(col(textCol)), " "))).as("__ws"))
      .select(col("__ts"), col("doc_id"),
        explode(array(array_distinct(ngramHashesDirect(col("__ws"), n)))).as("__ngs"))
      .select(col("__ts"), col("doc_id"),
        size(col("__ngs")).cast("long").as("n_ngrams"), explode(col("__ngs")).as("ng"))
      .withWatermark("__ts", watermarkDelay)
      .join(benchNgrams, "ng")
      .groupBy(col("__ts"), col("doc_id"), col("n_ngrams"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("n_hits"), col("n_ngrams"),
        expr("n_hits * 1000 div n_ngrams").as("hit_permille"))
  }
}
