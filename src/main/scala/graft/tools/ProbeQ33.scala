package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: quantifies q33's candidate volume with the r6
  * epsilon-guarded PPJoin alpha vs the unguarded r5 ceil, and times the
  * stages — the VERDICT r6 watch item (not part of the library surface). */
object ProbeQ33 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.5
    val n = 3

    val docs = graft.Tables.documents(spark, dir)
    val wh = docs
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("__p", "__w")))
      .select(col("doc_id"), col("__p"), xxhash64(col("__w")).as("__h"))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__h")))),
        s => s.getField("__h")).as("whs"))
    val ngrams = when(size(col("whs")) >= n,
      transform(sequence(lit(0), size(col("whs")) - n),
        i => xxhash64((0 until n).map(j => element_at(col("whs"), i + j + 1)): _*)))
      .otherwise(array().cast("array<bigint>"))
    val base = wh
      .select(col("doc_id"), array_distinct(ngrams).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    val exploded = base.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfreq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
    val prefixes = exploded.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("sz"),
        posexplode(expr(s"slice(transform(gs, x -> x.g), 1, " +
          s"size(gs) - cast(ceil(size(gs) * $threshold - 1e-9) as int) + 1)")).as(Seq("p", "g")))
      .persist()
    println(s"prefix rows: ${prefixes.count()}")

    val grouped = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") * threshold <= col("a.sz") &&
          col("a.sz") * threshold <= col("b.sz"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(max(least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p"))).as("ub"))
      .persist()
    val shared = grouped.count()

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val candR6 = timed("count r6 (epsilon alpha)") {
      grouped.filter(col("ub") >=
        ceil(lit(threshold / (1 + threshold)) * (col("sz_a") + col("sz_b")) - lit(1e-9))).count()
    }
    val candR5 = timed("count r5 (raw ceil alpha)") {
      grouped.filter(col("ub") >=
        ceil(lit(threshold / (1 + threshold)) * (col("sz_a") + col("sz_b")))).count()
    }
    println(s"prefix-sharing pairs: $shared; candidates r6=$candR6 r5=$candR5 " +
      s"(delta ${candR6 - candR5})")

    timed("full q33") {
      graft.llm.Dedup.jaccardJoin(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
