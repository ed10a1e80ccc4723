package graft.tools

import graft.{GraftSession, Tables}
import graft.llm.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the hot operators at a given SF. */
object Profile {
  private def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, d)

    time("docs.scan")(docs)
    time("shingles3")(docs.select(Dedup.shingles(col("text"), 3).as("sh")))
    time("shingles3.size")(docs.select(size(Dedup.shingles(col("text"), 3)).as("n")))
    time("sh.hash.min")(docs.select(
      array_min(transform(Dedup.shinglesRaw(col("text"), 4), s => Dedup.shingleHash(s))).as("m")))
    time("minhash.sig.materialized")(docs
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("xs", transform(col("sh"), s => Dedup.shingleHash(s) % Dedup.MinhashP))
      .select(Dedup.minhashSignature(col("xs"), 12).as("mh")))
    time("full.nearDupPairs")(Dedup.nearDupPairs(docs, "doc_id", "text"))
    time("full.simhashPairs")(Dedup.simhashPairs(docs, "doc_id", "text"))

    // q19 decomposition: derivation -> decode -> envelope JSON
    import graft.cdc.{Decode, EnvelopeBuilder, Json}
    val li = Tables.lineitem(spark, d)
    val lk = col("l_orderkey"); val ln = col("l_linenumber")
    val fullRow = array(
      (lk * 10 + ln).cast("string"), ((lk % 256) - 128).cast("string"),
      ((col("l_suppkey") % 65536) - 32768).cast("string"),
      (-(lk % 100) - 1).cast("string"), (-(lk % 1000) - 1).cast("string"),
      (-(lk % 500) - 1).cast("string"),
      when(col("l_returnflag") === "A", 1).when(col("l_returnflag") === "N", 2).otherwise(3).cast("string"),
      (lk % 8).cast("string"), concat(lit("n_"), ln))
    time("q19.rowbuild")(li.select(fullRow.as("r")))
    time("q19.escape.str")(li.select(Json.str(concat(lit("n_"), ln)).as("s")))

    // q19 stage decomposition over the real static envelope path
    import graft.queries.CdcQueries
    val raw19 = li.select(
      lit("shop").as("database"), lit("items").as("table"),
      lit("insert").as("action"), lit(0L).as("ts"),
      (lk * 100 + ln).as("stmt_seq"),
      array(when(lk % 7 === 0, slice(fullRow, 1, 7)).otherwise(fullRow)).as("rows"))
    time("q19.raw")(raw19)
    val env19 = EnvelopeBuilder.envelopesStatic(raw19, CdcQueries.q19Cols)
    time("q19.envelopes")(env19)
    time("q19.envelopes+sort")(env19.orderBy("stmt_seq", "pair_pos"))
    spark.stop()
  }
}
