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

  test("keywordsTopK: integer scores hand-check, stopword cut drops " +
    "ubiquitous terms, ties break by term, k bounds per doc") {
    // 4 docs; "the" is in all 4 (df=4) -> dropped at maxDfPermille=500
    // (4*1000 > 500*4); "apple" df=2, "kiwi"/"pear"/"plum" df=1.
    val docs = Seq(
      (1L, "the apple apple kiwi"),
      (2L, "the apple pear"),
      (3L, "the plum plum plum"),
      (4L, "the the the")).toDF("doc_id", "text")
    val got = Retrieval.keywordsTopK(docs, "doc_id", "text", k = 2,
        maxDfPermille = 500L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    // doc 1: apple tf=2 df=2 -> 1000000; kiwi tf=1 df=1 -> 1000000; TIE ->
    // term order: apple rank 1, kiwi rank 2
    // doc 2: pear 1000000 (tf1 df1), apple 500000 (tf1 df2)
    // doc 3: plum tf=3 df=1 -> 3000000
    // doc 4: only "the" -> cut entirely, no rows
    assert(got === Seq(
      (1L, 1L, "apple", 1000000L), (1L, 2L, "kiwi", 1000000L),
      (2L, 1L, "pear", 1000000L), (2L, 2L, "apple", 500000L),
      (3L, 1L, "plum", 3000000L)))
    // k bound: with k=1 only the rank-1 rows survive
    val k1 = Retrieval.keywordsTopK(docs, "doc_id", "text", k = 1,
        maxDfPermille = 500L).collect()
    assert(k1.length === 3 && k1.forall(_.getLong(1) == 1L))
    // no cut: maxDfPermille=1000 keeps "the" (score tf*1e6/4)
    val all = Retrieval.keywordsTopK(docs, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(all.contains((4L, "the")))
  }

  test("query terms absent from the corpus contribute nothing and never fail") {
    val docs = Seq((1L, "only these words")).toDF("doc_id", "text")
    val qs = Seq((9L, "missing tokens entirely")).toDF("q_id", "q_text")
    assert(Retrieval.bm25TopK(docs, "doc_id", "text", qs, k = 3).count() == 0L)
  }
}
