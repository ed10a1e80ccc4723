package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge training (Sennrich et al., ACL 2016) — the
  * tokenizer-construction step of a training-data pipeline, distributed.
  *
  * Trains on the WORD-FREQUENCY DICTIONARY, the standard formulation every
  * real BPE trainer uses: pair statistics are weighted by word counts, so
  * the corpus is scanned ONCE (one map-side-combinable groupBy to build the
  * dictionary) and every merge iteration runs on the vocabulary-scale frame
  * — Heaps' law puts the vocabulary at ~K·N^0.5, so at 100 TB the per-round
  * work is a few GB regardless of corpus size.
  *
  * Per round: adjacent-symbol pair counts (explode + weighted groupBy —
  * map-side combined), ONE driver-collected top pair (count DESC, then
  * lexicographic — fully deterministic tie-break), then the merge applied to
  * every word's symbol array as a greedy left-to-right fold (a per-row
  * `aggregate` with an array accumulator — the BPE greedy semantics:
  * "aaaa" under (a,a) becomes ["aa","aa"]). Rounds are separated by the
  * same flat-`LogicalRDD` lineage barrier [[Clusters]] uses: each round
  * references the previous round's expressions, and without the barrier the
  * analyzed plan nests one fold per round.
  */
object Bpe {

  /** Greedy left-to-right application of ONE merge (a, b) to a symbol
    * array: scan the symbols, and whenever the accumulator's last element
    * is `a` and the current symbol is `b`, replace the last element with
    * `a+b`. A merged token never re-merges within the same pass (standard
    * BPE single-pass greedy). */
  private def mergeOnce(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** The word-frequency dictionary with initial character symbols:
    * (w, n, sym). One corpus-scale shuffle; everything after is
    * vocabulary-scale. */
  private def dictionary(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("sym", array_remove(split(col("w"), ""), ""))

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge list
    * in training order — the tokenizer artifact (apply them in order to
    * encode). Stops early if no adjacent pair remains. Deterministic:
    * integer counts, total (count DESC, a, b) tie-break. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    var vocab = dictionary(docs, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      // weighted adjacent-pair counts: vocabulary-scale explode, map-side
      // combined groupBy; ONE row to the driver
      val top = vocab
        .select(col("n"), explode(when(size(col("sym")) >= 2,
          transform(sequence(lit(0), size(col("sym")) - 2),
            i => struct(element_at(col("sym"), i + 1).as("a"),
              element_at(col("sym"), i + 2).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val round = vocab.withColumn("sym", mergeOnce(col("sym"), a, b))
        // flat-LogicalRDD lineage barrier (graft.plans.Barrier): constant
        // per-round plan size; the persisted RDD backs execution either way
        val next = graft.plans.Barrier.flatten(round)
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before dropping the previous round
        vocab.unpersist()
        vocab = next
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Learn `numMerges` BPE merges — the PRODUCTION training path. Bit-
    * identical to [[trainMerges]] (same weighted pair counts, same
    * (count DESC, a, b) tie-break, same greedy merge application; proven in
    * BpeSpec) but runs O(1) Spark jobs total instead of one aggregate +
    * collect + materialization PER MERGE: a real 32k–50k-merge tokenizer
    * under [[trainMerges]] is tens of thousands of sequential driver
    * round-trips — days of fixed scheduling overhead at ANY corpus size.
    *
    * Shape: ONE corpus-scale map-side-combined groupBy builds the
    * word-frequency dictionary; the dictionary is collected to the driver
    * under the same loud metadata-scale clamp contract as the k-means seed
    * collect (`KMeans.scala` — Heaps' law puts the vocabulary at ~K·N^0.5,
    * a few million entries even at 100 TB, and the clamp REFUSES rather than
    * silently truncates); then the classic incremental trainer (Sennrich
    * et al. 2016, `learn_bpe`) runs driver-side: pair counts maintained
    * incrementally via an inverted pair→words index, best pair selected
    * from a lazy-deletion max-heap, only words containing the merged pair
    * rewritten. Per-merge cost is O(occurrences), not O(vocabulary), and
    * zero Spark jobs. */
  def trainMergesFast(docs: DataFrame, textCol: String, numMerges: Int,
                      maxVocab: Int = 1 << 22): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // the ONE corpus-scale job: dictionary groupBy, clamped collect
    val dictRows = dictionary(docs, textCol).select("w", "n")
      .limit(maxVocab + 1).collect()
    require(dictRows.length <= maxVocab,
      s"trainMergesFast: word dictionary exceeds maxVocab=$maxVocab entries — " +
        "the driver-side trainer requires a metadata-scale vocabulary " +
        "(Heaps' law normally guarantees this; raise maxVocab only with " +
        "driver memory to match, or pre-filter rare words)")
    trainFromDictionary(
      dictRows.map(r => (r.getString(0), r.getLong(1))), numMerges)
  }

  /** The driver-side incremental BPE loop over a (word, count) dictionary.
    * Exposed package-private so BpeSpec can parity-test it directly. */
  private[llm] def trainFromDictionary(dict: Array[(String, Long)],
                                       numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    type Pair = (String, String)
    val words: Array[mutable.ArrayBuffer[String]] =
      dict.map { case (w, _) => mutable.ArrayBuffer.from(w.map(_.toString)) }
    val freq: Array[Long] = dict.map(_._2)

    val pairCount = mutable.HashMap.empty[Pair, Long]
    val pairWords = mutable.HashMap.empty[Pair, mutable.HashSet[Int]]
    def addOcc(p: Pair, n: Long, idx: Int): Unit = {
      pairCount.updateWith(p) { c => Some(c.getOrElse(0L) + n) }
      pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += idx
    }
    for (i <- words.indices; j <- 0 until words(i).length - 1)
      addOcc((words(i)(j), words(i)(j + 1)), freq(i), i)

    // lazy-deletion max-heap: max count first, then LEXICOGRAPHICALLY
    // SMALLEST (a, b) — the same total tie-break as the distributed
    // `orderBy(c DESC, a, b)`. An entry is valid iff its stored count still
    // equals the live count; every count change pushes a fresh entry.
    val ord: Ordering[(Long, String, String)] = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val ca = y._2.compareTo(x._2)
          if (ca != 0) ca else y._3.compareTo(x._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    pairCount.foreach { case ((a, b), c) => heap.enqueue((c, a, b)) }

    val merges = mutable.ArrayBuffer.empty[Pair]
    while (merges.length < numMerges && heap.nonEmpty) {
      val (c, a, b) = heap.dequeue()
      if (pairCount.get((a, b)).contains(c)) { // live entry
        merges += ((a, b))
        val merged = a + b
        val touched = mutable.HashSet.empty[Pair]
        // rewrite only the words that contain the pair (index may hold
        // stale members — words rewritten since they were indexed — so
        // re-verify adjacency during the greedy pass)
        for (i <- pairWords.getOrElse((a, b), mutable.HashSet.empty)) {
          val sym = words(i); val n = freq(i)
          val out = mutable.ArrayBuffer.empty[String]
          var changed = false
          for (s <- sym) {
            if (out.nonEmpty && out.last == a && s == b) {
              out(out.length - 1) = merged; changed = true
            } else out += s
          }
          if (changed) {
            def bump(p: Pair, d: Long): Unit = {
              val nc = pairCount.getOrElse(p, 0L) + d
              if (nc <= 0L) { pairCount.remove(p); pairWords.remove(p) }
              else pairCount.update(p, nc)
              touched += p
            }
            for (j <- 0 until sym.length - 1) bump((sym(j), sym(j + 1)), -n)
            for (j <- 0 until out.length - 1) {
              val p = (out(j), out(j + 1))
              bump(p, n)
              pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
            }
            words(i) = out
          }
        }
        pairCount.remove((a, b)); pairWords.remove((a, b))
        for (p <- touched; lc <- pairCount.get(p)) heap.enqueue((lc, p._1, p._2))
      } // else: stale heap entry, discard
    }
    merges.toSeq
  }

  /** Encode a text column with a learned merge list: per-word character
    * symbols folded through the merges IN TRAINING ORDER, words flattened
    * left to right. Pure per-row expression work (no shuffle); expression
    * depth grows with the merge count, so this is the right shape for the
    * bounded merge lists a test/spec uses — production encoders apply the
    * learned table in native tokenizer code, not in the engine. */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val words = split(lower(text), " ")
    flatten(transform(words, w => {
      val sym0 = array_remove(split(w, ""), "")
      merges.foldLeft(sym0) { case (s, (a, b)) => mergeOnce(s, a, b) }
    }))
  }

  /** Imperative batched form of [[encode]] — the corpus-scale path. The
    * greedy merge fold is a dense per-row string kernel with no relational
    * structure, so like the k-means argmin it earns the mapPartitions
    * carve-out: nested Catalyst HOF folds evaluate interpreted per symbol,
    * measured ~10× slower on real documents. Proven token-identical to the
    * expression form (`BpeSpec`). Adds `tokens: array<string>` named
    * `outCol`. */
  def encodeBatched(df: DataFrame, textCol: String, merges: Seq[(String, String)],
                    outCol: String = "tokens"): DataFrame = {
    val mergeList = merges.toArray
    val schema = df.schema.add(outCol, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.map { r =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (w <- r.getString(idx).toLowerCase(java.util.Locale.ROOT).split(" ", -1) if w.nonEmpty) {
          var sym = w.map(_.toString).toBuffer
          for ((a, b) <- mergeList) {
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            for (s <- sym) {
              if (merged.nonEmpty && merged.last == a && s == b)
                merged(merged.length - 1) = a + b
              else merged += s
            }
            sym = merged
          }
          out ++= sym
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ out.toSeq)
      }
    }(enc)
  }
}
