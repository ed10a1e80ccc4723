package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** [[Bpe]] against a driver-side reference implementation of the identical
  * algorithm (word-frequency dict, weighted pair counts, (count DESC, a, b)
  * tie-break, greedy left-to-right merge application). */
class BpeSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def refApply(sym: Vector[String], a: String, b: String): Vector[String] =
    sym.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
      else acc :+ s
    }

  private def refTrain(texts: Seq[String], numMerges: Int): Seq[(String, String)] = {
    val wordCounts = texts.flatMap(_.toLowerCase.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    var vocab: Map[String, (Long, Vector[String])] =
      wordCounts.map { case (w, n) => (w, (n, w.map(_.toString).toVector)) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (merges.length < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (n, sym) =>
        sym.iterator.sliding(2).withPartial(false).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), _) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b))
        vocab = vocab.map { case (w, (n, sym)) => (w, (n, refApply(sym, a, b))) }
      }
    }
    merges.toSeq
  }

  test("hand fixture: merges learn the shared prefix of low/lower/lowest") {
    import spark.implicits._
    val docs = Seq("low lower lowest low low", "low lower newest").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", 3)
    // 'l o' and 'lo w' occur in every "low*" word (count 7); 'e' pairs are rarer
    assert(merges.take(2) === Seq(("l", "o"), ("lo", "w")),
      s"first merges must collapse the dominant prefix: $merges")
  }

  test("distributed merges equal the driver-side reference on sf0.001 (8 rounds)") {
    val docs = Tables.documents(spark, d)
    val got = Bpe.trainMerges(docs, "text", 8)
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    assert(got === refTrain(texts, 8))
  }

  test("trainMergesFast ≡ driver reference over 120 merges (incremental heap loop)") {
    val docs = Tables.documents(spark, d)
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val fast = Bpe.trainMergesFast(docs, "text", 120)
    val ref = refTrain(texts, 120)
    assert(fast.length === ref.length)
    // pinpoint the first divergence if any (full-seq compare is unreadable)
    fast.zip(ref).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"first divergence at merge $i: got $g want $w")
    }
  }

  test("trainMergesFast ≡ trainMerges (the distributed cross-check form, 10 merges)") {
    val docs = Tables.documents(spark, d).limit(120)
    assert(Bpe.trainMergesFast(docs, "text", 10) === Bpe.trainMerges(docs, "text", 10))
  }

  test("trainMergesFast: ties break (count DESC, a, b); exhaustion stops early") {
    import spark.implicits._
    // "ab" and "cd" both have pair count 2 → (a,b) wins lexicographically
    val docs = Seq("ab cd", "ab cd").toDF("text")
    val m = Bpe.trainMergesFast(docs, "text", 50)
    assert(m.head === (("a", "b")))
    // single-char words exhaust: every word eventually collapses to 1 symbol
    assert(m.length < 50, s"must stop when no adjacent pair remains: $m")
  }

  test("trainMergesFast refuses a dictionary over maxVocab — loud clamp, no truncation") {
    import spark.implicits._
    val docs = Seq("w1 w2 w3 w4 w5 w6 w7 w8").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Bpe.trainMergesFast(docs, "text", 2, maxVocab = 5)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
  }

  test("encode applies merges greedily left-to-right (aaaa -> aa aa; aaa -> aa a)") {
    import spark.implicits._
    val out = Seq("aaaa aaa ab").toDF("t")
      .select(Bpe.encode(col("t"), Seq(("a", "a"))).as("toks"))
      .collect().map(_.getSeq[String](0)).head
    assert(out === Seq("aa", "aa", "aa", "a", "a", "b"))
  }

  test("encode parity with the reference fold on real text") {
    import spark.implicits._
    val docs = Tables.documents(spark, d)
    val merges = Bpe.trainMerges(docs, "text", 5)
    val sample = docs.orderBy("doc_id").limit(20)
    val got = sample.select(Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(_.getSeq[String](0).toVector)
    val want = sample.select("text").collect().map { r =>
      r.getString(0).toLowerCase.split(" ").filter(_.nonEmpty).toVector.flatMap { w =>
        merges.foldLeft(w.map(_.toString).toVector) {
          case (s, (a, b)) => refApply(s, a, b)
        }
      }
    }
    assert(got.toSeq === want.toSeq)
  }

  test("encodeBatched (imperative corpus path) ≡ the expression form, per doc") {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text")).limit(100)
    val merges = Seq(("t", "h"), ("th", "e"), ("e", "r"), ("a", "n"))
    val expr = docs.select(col("doc_id"), Bpe.encode(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val batched = Bpe.encodeBatched(docs, "text", merges, "toks")
      .select("doc_id", "toks")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    assert(batched === expr)
  }
}
