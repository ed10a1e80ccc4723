package graft.llm

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("BM25 matches the hand-computed score on a tiny corpus") {
    // 3 docs, one query term "apple": doc 1 has tf=2/dl=4, doc 2 tf=1/dl=4,
    // doc 3 no match. N=3, sum_dl=12, avgdl=4 -> dl/avgdl=1 for all docs.
    val docs = Seq(
      (1L, "apple pie apple crumble"),
      (2L, "apple banana cherry date"),
      (3L, "kiwi lime mango nectarine")).toDF("doc_id", "text")
    val qs = Seq((100L, "apple")).toDF("q_id", "q_text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qs, k = 5)
      .orderBy("rank").collect()

    def score(tf: Double): Long = {
      val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
      val s = idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * 1.0))
      math.floor(s * 1000000.0 + 0.5).toLong
    }
    assert(got.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 1L, score(2.0)), (2L, 2L, score(1.0))))
  }

  test("doc-as-query retrieval ranks the document itself first") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma other words here"),
      (3L, "completely unrelated text body four")).toDF("doc_id", "text")
    val qs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("q_id", "q_text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qs, k = 2)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(got.head.getLong(3) > got.last.getLong(3))
  }

  test("query terms absent from the corpus contribute nothing and never fail") {
    val docs = Seq((1L, "only these words")).toDF("doc_id", "text")
    val qs = Seq((9L, "missing tokens entirely")).toDF("q_id", "q_text")
    assert(Retrieval.bm25TopK(docs, "doc_id", "text", qs, k = 3).count() == 0L)
  }
}
