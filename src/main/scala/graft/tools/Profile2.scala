package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.DataFrame

/** Dev tool: time individual catalog queries N times cold. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption.map(_.split(",").toSet).getOrElse(Set("q18_update_pairs"))
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    SparkEntry.catalog.filter(q => names.contains(q.name)).foreach { q =>
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        exec(q.fn(spark, d))
        println(f"PROF ${q.name} run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
