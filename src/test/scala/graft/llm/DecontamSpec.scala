package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, prefix: String): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("span-level decontamination masks exactly the quoted benchmark region, " +
    "keeping the rest of the document") {
    // bench doc: b0..b11. Corpus doc 1 quotes b0..b11 verbatim between
    // unique prose; doc 2 is clean.
    val bench = Seq((100L, words(12, "b"))).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, words(10, "u") + " " + words(12, "b") + " " + words(10, "v")),
      (2L, words(20, "z"))).toDF("doc_id", "text")
    val spans = Decontam.contaminationSpans(corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // the quote occupies words [10, 22); its internal 8-grams start at
    // 10..14 and merge to one span [10, 22) — the surrounding prose's mixed
    // grams differ from the bench doc's, so the span is EXACTLY the quote
    assert(spans === Seq((1L, 10L, 22L)), s"$spans")
    val cleaned = Dedup.removeSpans(corpus, spans.toDF("doc_id", "span_start", "span_end"),
        "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(cleaned(0)._3 === 12L)
    assert(cleaned(0)._4 === words(10, "u") + " " + words(10, "v"),
      "only the quoted region is cut")
    assert(cleaned(1) === ((2L, 20L, 0L, words(20, "z"))), "clean docs untouched")
  }

  test("flags exactly the corpus docs sharing a full n-gram with the benchmark") {
    // bench doc: w0..w9. Corpus: doc 1 embeds w1..w8 (a full 8-gram of the
    // bench doc), doc 2 shares only a 7-word run, doc 3 shares nothing.
    val bench = Seq((100L, words(10, "w"))).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x0 " + (1 to 8).map("w" + _).mkString(" ") + " x1"),
      (2L, "x0 " + (1 to 7).map("w" + _).mkString(" ") + " x1 x2"),
      (3L, words(12, "z"))).toDF("doc_id", "text")
    val got = Decontam.contaminationReport(corpus, bench, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    val r = got.head
    assert(r.getLong(1) == 1L)          // n_hits: the one embedded 8-gram
    assert(r.getLong(2) == 3L)          // 10 words -> 3 distinct 8-grams
    assert(r.getLong(3) == 333L)        // 1000 div 3
  }

  test("hit counting is distinct per n-gram even when the doc repeats it") {
    val bench = Seq((9L, words(8, "b"))).toDF("doc_id", "text")
    val rep = (words(8, "b") + " ") * 3 // the same 8-gram appears 3 times
    val corpus = Seq((1L, rep.trim)).toDF("doc_id", "text")
    val got = Decontam.contaminationReport(corpus, bench, "doc_id", "text").collect()
    assert(got.length == 1)
    // distinct n-grams of the repeated doc include the planted one once
    assert(got.head.getLong(1) == 1L)
  }

  test("short docs (< n words) on either side produce no n-grams and no rows") {
    val bench = Seq((9L, words(5, "b"))).toDF("doc_id", "text")
    val corpus = Seq((1L, words(5, "b")), (2L, words(20, "b")))
      .toDF("doc_id", "text")
    assert(Decontam.contaminationReport(corpus, bench, "doc_id", "text")
      .count() == 0L)
  }

  test("ngramHashesMod equals ngramHashes where both are defined (n <= 7)") {
    // same-modulus algebraic identity: stepwise-mod == mod-at-the-end
    val df = Seq((1L, words(30, "t"))).toDF("doc_id", "text")
    val wh = Dedup.wordHashFrame(df, "doc_id", "text")
    val both = wh.select(
      Decontam.ngramHashesMod(col("whs"), 4, Dedup.MinhashP).as("m"),
      Dedup.ngramHashes(col("whs"), 4).as("e"))
    val r = both.collect().head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("ngramHashesDirect (no dictionary) equals ngramHashesMod over wordHashFrame") {
    val df = Seq((1L, words(30, "t")), (2L, words(9, "u"))).toDF("doc_id", "text")
    val viaDict = Dedup.wordHashFrame(df, "doc_id", "text")
      .select(col("doc_id"), Decontam.ngramHashesMod(col("whs"), 8).as("ngs"))
    val direct = df
      .select(col("doc_id"), explode(array(split(lower(col("text")), " "))).as("ws"))
      .select(col("doc_id"), Decontam.ngramHashesDirect(col("ws"), 8).as("ngs"))
    val d = viaDict.orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val e = direct.orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(d.toSeq == e.toSeq)
    // 58-bit modulus actually in effect: values exceed the 31-bit space
    assert(d.flatten.exists(_ > Dedup.MinhashP), s"expected 58-bit hashes: ${d.toSeq}")
  }

  test("crossSourceOverlap: exact shared counts and jaccard on a planted " +
    "three-source corpus; self-pairs absent; unordered pairs once") {
    // n=2 grams. srcA doc: "a b c d" -> grams {ab, bc, cd}
    //            srcB doc: "b c d e" -> grams {bc, cd, de}
    //            srcB doc2: "a b"    -> gram  {ab}
    //            srcC doc: "x y"     -> gram  {xy} (disjoint)
    // A = {ab,bc,cd} (3), B = {bc,cd,de,ab} (4), C = {xy} (1)
    // A∩B = {ab,bc,cd} = 3 -> jac = 3/(3+4-3) = 750000 micros
    val docs = Seq(
      (1L, "A", "a b c d"), (2L, "B", "b c d e"), (3L, "B", "a b"),
      (4L, "C", "x y")).toDF("doc_id", "source", "text")
    val got = Decontam.crossSourceOverlap(docs, "source", "doc_id", "text", n = 2)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === Set(("A", "B")), s"disjoint pairs must be absent: $got")
    assert(got(("A", "B")) === ((3L, 4L, 3L, 750000L)))
  }
}
