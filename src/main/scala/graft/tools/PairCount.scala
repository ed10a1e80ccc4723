// Evidence helper for the 10×-scale readings (operational entry point, kept
// in the jar alongside Bench/Verify/Scale10Gen): output-row counts for the
// pair-producing joins, so wall-clock slopes can be normalized by TRUE pair
// volume (the derived 10× set plants ~×100 high-containment pairs by
// construction — every doc gains 9 tag-only replicas).
//
// Counts BOTH pair tiers: the asymmetric containment join (q83) and the
// exact-Jaccard join (q33 — also the pair graph q38's connected components
// and q43's curation capstone run over), each with its catalog parameters.
//
// Usage: sbt "runMain graft.tools.PairCount <sfDir> [containmentMicros] [jaccardThreshold]"
package graft.tools

object PairCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tm = args.lift(1).map(_.toLong).getOrElse(600000L)
    val jt = args.lift(2).map(_.toDouble).getOrElse(0.5)
    val spark = graft.GraftSession.get()
    val docs = graft.Tables.documents(spark, dir)
    val (cPairs, cCleanup) =
      graft.llm.Dedup.containmentJoinManaged(docs, "doc_id", "text", 3, tm)
    val nContain = cPairs.count()
    cCleanup()
    val (jPairs, jCleanup) =
      graft.llm.Dedup.jaccardJoinManaged(docs, "doc_id", "text", 3, jt)
    val nJaccard = jPairs.count()
    jCleanup()
    println(s"""{"dir":"$dir","containment_pairs":$nContain,"jaccard_pairs":$nJaccard}""")
    spark.stop()
  }
}
