// Evidence helper for the 10×-scale readings: output-row counts for the
// pair-producing joins, so wall-clock slopes can be normalized by TRUE pair
// volume (the derived 10× set plants ~×100 high-containment pairs by
// construction — every doc gains 9 tag-only replicas).
//
// Usage: sbt "runMain graft.tools.PairCount <sfDir> [thresholdMicros]"
package graft.tools

object PairCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tm = args.lift(1).map(_.toLong).getOrElse(600000L)
    val spark = graft.GraftSession.get()
    val docs = graft.Tables.documents(spark, dir)
    val (pairs, cleanup) =
      graft.llm.Dedup.containmentJoinManaged(docs, "doc_id", "text", 3, tm)
    println(s"""{"dir":"$dir","containment_pairs":${pairs.count()}}""")
    cleanup()
    spark.stop()
  }
}
