package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase text matching via Aho–Corasick (1975) — the blocklist
  * primitive of a corpus pipeline (toxic-phrase filters, PII trigger lists,
  * contamination canaries). The regex-alternation form ([[graft.cdc
  * .TopicFilter]]-style `p1|p2|…`) degrades linearly in pattern count and
  * catastrophically in backtracking engines; the automaton scans each
  * document ONCE regardless of how many phrases the list holds — O(text +
  * matches) per document for a 10k-phrase blocklist exactly as for 10.
  *
  * Scale shape: the automaton is built ONCE on the driver from the phrase
  * list (a blocklist is metadata-scale by definition — thousands of short
  * strings) and broadcast; the scan is a per-partition dense string kernel —
  * the same imperative carve-out as the BPE batch encoder and the k-means
  * argmin (a character-at-a-time automaton walk has no relational structure;
  * per-character Catalyst expressions would evaluate interpreted). No
  * shuffle, no join: the corpus side never moves.
  *
  * Match semantics: EVERY (phrase, end-position) occurrence is reported,
  * overlapping and nested included — the standard automaton output, and the
  * definition a SQL oracle can replay exactly (count positions i where
  * `substr(text, i, len(p)) = p`). Matching is case-sensitive over raw
  * characters; callers normalize (e.g. `lower`) upstream, visibly. */
object PhraseMatch {

  /** Immutable trie-with-failure-links automaton. Built driver-side;
    * serializable for broadcast. Public algorithm (Aho & Corasick, CACM
    * 1975), goto/fail/output construction via BFS. */
  final class AhoCorasick private (
      goto_ : Array[Map[Char, Int]],
      fail: Array[Int],
      out: Array[List[Int]],
      val phrases: Array[String]) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (s != 0 && !goto_(s).contains(c)) s = fail(s)
      goto_(s).getOrElse(c, 0)
    }

    /** All matches in `text` as (phraseIndex, endPosExclusive) pairs, in
      * scan order. */
    def findAll(text: String): Seq[(Int, Int)] = {
      val acc = List.newBuilder[(Int, Int)]
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        out(s).foreach(p => acc += ((p, i + 1)))
        i += 1
      }
      acc.result()
    }

    /** Total occurrence count and distinct-phrase count in one pass. */
    def countAndDistinct(text: String): (Long, Long) = {
      var n = 0L
      val seen = new java.util.BitSet(phrases.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        var os = out(s)
        while (os.nonEmpty) { n += 1; seen.set(os.head); os = os.tail }
        i += 1
      }
      (n, seen.cardinality().toLong)
    }
  }

  object AhoCorasick {
    def apply(phrases: Seq[String]): AhoCorasick = {
      require(phrases.nonEmpty, "phrase list must be non-empty")
      require(phrases.forall(_.nonEmpty), "phrases must be non-empty strings")
      require(phrases.distinct.size == phrases.size,
        s"duplicate phrases would double-count: ${phrases.diff(phrases.distinct).distinct}")
      val goto_ = scala.collection.mutable.ArrayBuffer(Map.empty[Char, Int])
      val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      // trie
      phrases.zipWithIndex.foreach { case (p, pi) =>
        var s = 0
        p.foreach { c =>
          goto_(s).get(c) match {
            case Some(n) => s = n
            case None =>
              goto_ += Map.empty; outB += Nil
              val n = goto_.length - 1
              goto_(s) = goto_(s) + (c -> n)
              s = n
          }
        }
        outB(s) = pi :: outB(s)
      }
      // failure links by BFS; output sets merge along them
      val fail = Array.fill(goto_.length)(0)
      val queue = scala.collection.mutable.Queue.empty[Int]
      goto_(0).values.foreach(queue += _)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        goto_(u).foreach { case (c, v) =>
          queue += v
          var f = fail(u)
          while (f != 0 && !goto_(f).contains(c)) f = fail(f)
          val cand = goto_(f).getOrElse(c, 0)
          fail(v) = if (cand == v) 0 else cand
          outB(v) = outB(v) ++ outB(fail(v))
        }
      }
      new AhoCorasick(goto_.toArray, fail, outB.toArray, phrases.toArray)
    }
  }

  /** Scan `textCol` against the phrase list: adds `<out>_n` (total
    * occurrences, overlapping included) and `<out>_distinct` (distinct
    * phrases hit). One automaton broadcast, one partition-local pass. */
  def countMatches(df: DataFrame, textCol: String, phrases: Seq[String],
                   outPrefix: String = "match"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(AhoCorasick(phrases))
    val schema = df.schema
      .add(s"${outPrefix}_n", org.apache.spark.sql.types.LongType, nullable = false)
      .add(s"${outPrefix}_distinct", org.apache.spark.sql.types.LongType, nullable = false)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      val ac = bc.value
      it.map { r =>
        val t = if (r.isNullAt(idx)) "" else r.getString(idx)
        val (n, d) = ac.countAndDistinct(t)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ n :+ d)
      }
    }(enc)
  }
}
