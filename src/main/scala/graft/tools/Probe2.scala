package graft.tools

import graft.{GraftSession, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Scratch probe: q33 stage costs at sf0.1 (not part of the library surface). */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    def time[T](tag: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t) / 1e9}%.2fs"); r
    }
    val threshold = 0.5
    val base = docs
      .select(col("doc_id"),
        array_distinct(transform(Dedup.shingles(col("text"), 3), g => xxhash64(g))).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("base persist")(println(base.count()))
    val exploded = base.select(col("doc_id"), explode(col("sh")).as("g"))
    val dfreq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
    time("dfreq")(println(dfreq.count()))
    val prefixes = exploded.join(dfreq, "g")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("sz"),
        posexplode(expr(s"slice(transform(gs, x -> x.g), 1, " +
          s"size(gs) - cast(ceil(size(gs) * $threshold) as int) + 1)")).as(Seq("p", "g")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("prefixes persist")(println(prefixes.count()))
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") * threshold <= col("a.sz") &&
          col("a.sz") * threshold <= col("b.sz"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(max(least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p"))).as("ub"))
      .filter(col("ub") >=
        ceil(lit(threshold / (1 + threshold)) * (col("sz_a") + col("sz_b"))))
      .select(col("doc_a"), col("doc_b"))
    time("cand")(println(cand.count()))
    val out = cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jac"))
    time("verify")(println(out.count()))
    spark.stop()
  }
}
