package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main: prints schemas + engine parity facts (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "orders", "lineitem", "documents", "embeddings")) {
      println(s"== $t")
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        df.printSchema()
        df.show(3, 40, vertical = false)
      } catch { case e: Throwable => println(s"READ FAILED: ${e.getMessage.take(400)}") }
    }
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // to_json formatting parity probe
    val j = Seq((1L, 185.22, "x")).toDF("a", "b", "c")
      .select(to_json(struct($"a", $"b", $"c")).as("j")).as[String].head()
    println(s"spark to_json: $j")
    println("round(2.675,2) double = " + Seq(2.675).toDF("x").select(round($"x", 2)).head())
    spark.stop()
  }
}
