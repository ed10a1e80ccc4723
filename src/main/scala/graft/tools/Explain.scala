package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: dump `explain("formatted")` for catalog queries (plan-shape
  * audit — pushed filters, broadcast choices, codegen spans). Usage:
  * `runMain graft.tools.Explain [sfDir] [q1,q2,...]`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    val spark = GraftSession.get("4")
    SparkEntry.catalog
      .filter(q => only.forall(_.contains(q.name)))
      .foreach { q =>
        println(s"\n======== ${q.name} ========")
        try q.fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage.take(300)}") }
      }
    spark.stop()
  }
}
