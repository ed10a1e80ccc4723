package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[PhraseMatch]] — Aho–Corasick automaton vs a brute-force all-occurrences
  * reference (count positions i where text.substring(i).startsWith(p)). */
class PhraseMatchSpec extends SparkSpec {

  private def bruteAll(text: String, phrases: Seq[String]): Seq[(Int, Int)] =
    for {
      (p, pi) <- phrases.zipWithIndex
      i <- 0 to text.length - p.length
      if text.regionMatches(i, p, 0, p.length)
    } yield (pi, i + p.length)

  test("findAll equals brute force, incl. overlapping, nested and shared-suffix patterns") {
    // nested ("he" in "she"), overlapping ("aa" in "aaa"), shared suffixes
    val phrases = Seq("he", "she", "his", "hers", "aa", "aba")
    val texts = Seq(
      "ushers", // classic: she, he, hers all end inside
      "aaa",    // "aa" twice, overlapping
      "ababa",  // "aba" twice, overlapping
      "his hers she he", "", "xyz", "hehehe")
    for (t <- texts) {
      val ac = PhraseMatch.AhoCorasick(phrases)
      assert(ac.findAll(t).toSet === bruteAll(t, phrases).toSet, s"text: '$t'")
      val (n, d) = ac.countAndDistinct(t)
      val ref = bruteAll(t, phrases)
      assert(n === ref.size.toLong, s"count for '$t'")
      assert(d === ref.map(_._1).distinct.size.toLong, s"distinct for '$t'")
    }
  }

  test("property: automaton equals brute force on random texts over a small alphabet") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val phraseGen = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val caseGen = for {
      k <- Gen.chooseNum(1, 8)
      ps <- Gen.listOfN(k, phraseGen).map(_.distinct).suchThat(_.nonEmpty)
      t <- Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    } yield (ps, t)
    val p = Prop.forAll(caseGen) { case (ps, t) =>
      PhraseMatch.AhoCorasick(ps).findAll(t).toSet == bruteAll(t, ps).toSet
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"automaton/brute-force property failed: $r")
  }

  test("countMatches: DataFrame pass matches per-row automaton; null text = 0") {
    import spark.implicits._
    val phrases = Seq("the", "he", "data")
    val df = Seq(
      (1L, "the data theory"),
      (2L, "he the he"),
      (3L, null.asInstanceOf[String]),
      (4L, "x")).toDF("id", "text")
    val out = PhraseMatch.countMatches(df, "text", phrases, "m")
      .select("id", "m_n", "m_distinct")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ac = PhraseMatch.AhoCorasick(phrases)
    // "the data theory": the(x2: "the", "theory"), he(x2 inside both "the"s), data(x1)
    val (n1, d1) = ac.countAndDistinct("the data theory")
    assert(out.contains((1L, n1, d1)) && n1 === 5L && d1 === 3L)
    assert(out.contains((3L, 0L, 0L)), "null text scans as empty")
    assert(out.contains((4L, 0L, 0L)))
  }

  test("duplicate and empty phrases are refused loudly") {
    intercept[IllegalArgumentException] { PhraseMatch.AhoCorasick(Seq("a", "a")) }
    intercept[IllegalArgumentException] { PhraseMatch.AhoCorasick(Seq("a", "")) }
    intercept[IllegalArgumentException] { PhraseMatch.AhoCorasick(Nil) }
  }
}
