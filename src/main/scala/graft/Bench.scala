package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main. Prints ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Measurement rules (VERDICT r1):
  *  - execute the FULL plan via the `noop` datasource, not `count()` (count lets
  *    Catalyst prune the aggregate/sort away);
  *  - stable query order from SparkEntry.catalog (a Map iteration is not);
  *  - untimed warm-up first (JVM + parquet footer + codegen caches);
  *  - per-query best-of-2 so one GC pause doesn't define the number.
  */
object Bench {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    // Dev aid: SPARK_GRAFT_BENCH_ONLY=q22,q28 restricts the suite (comma-
    // separated name prefixes). Unset = full driver harness.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty))
    val suite = only match {
      case Some(ps) => SparkEntry.benchQueries.filter(q => ps.exists(q.name.startsWith))
      case None => SparkEntry.benchQueries
    }
    // Warm-up: run the first two queries untimed (parquet footers, codegen, JIT).
    suite.take(2).foreach(q => try exec(q.fn(spark, sfDir)) catch { case _: Throwable => () })

    val results = suite.map { q =>
      val times = (1 to 2).map { _ =>
        // Internal persists (EventIndexer, LSH signature frames) would be
        // reused across repeats via the cache manager's canonicalized-plan
        // lookup, flattering the min — every timed run starts cold.
        spark.catalog.clearCache()
        // Suite-position isolation (VERDICT r4 #1): a long sweep accumulates
        // broadcast blocks, shuffle state and old-gen garbage whose cleanup
        // (ContextCleaner fires on GC of the driver-side references)
        // otherwise lands INSIDE a later query's timed window — measured as
        // q22/q30 running ~3x their isolated times in the 37-query sweep.
        // Forcing a full GC between queries makes each timed run start from
        // the same heap/cleaner state as an isolated run.
        System.gc()
        Thread.sleep(50) // let the cleaner drain the newly-unreferenced state
        val t0 = System.nanoTime()
        try { exec(q.fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      q.name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    def jsonLine(rows: Seq[(String, Double)], extra: String = ""): String = {
      val qs = rows.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val total = results.map(_._2).filter(_ >= 0).sum
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$extra}"""
    }
    // The FULL per-query map goes to a file the driver/judge can read whole
    // (path overridable for local runs). Stdout gets a COMPACT line — same
    // schema, but only the worst-8 rows plus the file pointer: the driver
    // captures stdout's TAIL, and the full ~4 KB line has outgrown that
    // window three rounds running ("parsed": null in BENCH_r17), truncating
    // mid-number. Total/sf/unit are identical between the two lines.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    def writeFile(path: String, line: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"bench: could not write $path: $e") }
    writeFile(outPath, jsonLine(results))
    // Compact line: worst-8 rows + the file pointer + the FAILED names —
    // the full map carries failures as -1 entries, but a consumer that only
    // sees this tail line needs them spelled out (they are filtered from
    // the worst-8 map, whose ordering is by time).
    val failed = results.filter(_._2 < 0).map(_._1)
    val worst = results.filter(_._2 >= 0).sortBy(-_._2).take(8)
    val compact = jsonLine(worst,
      s""","n_queries":${results.size},"failed":${
        failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"full":"$outPath"""")
    // The same compact line also lands in a FIXED artifact, so machine
    // consumers never depend on how much of stdout survives capture (sbt's
    // "[info] " prefix + tail truncation have eaten it before).
    writeFile(sys.env.getOrElse("SPARK_GRAFT_BENCH_SUMMARY", "BENCH_SUMMARY.json"),
      compact)
    println(compact)
    spark.stop()
  }
}
