// Verify-tail experiment (VERDICT r17 #4): over the SAME materialized
// band-join candidate frame, time the production per-pair shingle
// recompute (Dedup.verifyCrossPairs) against the precompute-per-doc
// alternative (Dedup.verifyCrossPairsPre). Corpus/batch are the q99
// shape: documents widened with derived exact copies so the candidate
// set carries the adversarial pair fan-out (on the 10× replica set every
// doc is a 10-way cluster; verified pairs grow ~45×).
//
// Usage: sbt "runMain graft.tools.VerifyPairsProbe <sfDir> [reps]"
//   1×:  /root/testdata/sf0.1      10×: /tmp/graft_sf1.0 (Scale10Gen)
package graft.tools

import graft.{GraftSession, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.functions._

object VerifyPairsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val off = {
      val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
      math.pow(10, mx.toString.length.toDouble).toLong
    }
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .unionByName(docs.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 50 === 1)
        .select((col("doc_id") + 2L * off).as("doc_id"), col("text")))
      .persist()
    val corpus = docs.filter(col("doc_id") % 10 =!= 0).persist()

    val (cand0, release) = Dedup.crossCandidates(corpus, batch, "doc_id", "text")
    val (cand, candBack) = graft.plans.Barrier.flatPersist(cand0)
    val nCand = cand.count()
    release()
    println(s"[probe] sf=$sfDir candidates=$nCand " +
      s"batch=${batch.count()} corpus=${corpus.count()}")

    def time(label: String,
             f: () => org.apache.spark.sql.DataFrame): Seq[Double] =
      (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val n = f().count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $label rep$i: $s%.3f s ($n verified)")
        s
      }

    // alternate the variants so JIT/IO drift hits both equally
    val rec = time("recompute",
      () => Dedup.verifyCrossPairs(cand, corpus, batch, "doc_id", "text", 0.5))
    val pre = time("precompute",
      () => Dedup.verifyCrossPairsPre(cand, corpus, batch, "doc_id", "text", 0.5))
    val rec2 = time("recompute2",
      () => Dedup.verifyCrossPairs(cand, corpus, batch, "doc_id", "text", 0.5))

    println(f"[probe] RESULT sf=$sfDir recompute=${(rec ++ rec2).min}%.3f " +
      f"precompute=${pre.min}%.3f (min over ${reps * 2}/$reps reps)")
    candBack.unpersist(); batch.unpersist(); corpus.unpersist()
    spark.stop()
  }
}
