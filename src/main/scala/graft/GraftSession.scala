package graft

import org.apache.spark.sql.SparkSession

/** One place that knows how to build a correctly-configured session for this
  * engine. All entry points (Verify, Bench, tests, tools) go through here so
  * the required confs are set at build time, never mutated mid-session.
  *
  * Local mode stands in for a real cluster: `local[N]` with
  * `shuffle.partitions = N` models N executor cores; all query plans are
  * written to survive a 1000-executor deployment (partial aggs, no scaling
  * broadcasts, AQE on).
  */
object GraftSession {

  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(cpus: String = defaultCpus): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet is TIMESTAMP(NANOS); Spark 4 reads it as a raw Long
      // under this flag (Tables.events then derives µs + TimestampType).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(cpus: String = defaultCpus): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
