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

  /** Shuffle/spill scratch space for THIS single-node session. Host disk on a
    * shared box stalls unpredictably, and those stalls land inside whatever
    * query is shuffling/spilling at that moment (measured: q22 1.9 s →
    * 8-16 s in 2 of 5 full-sweep runs, both attempts slow, only ever on
    * disk-backed local dirs). A RAM disk removes that failure mode; it is
    * only a LOCAL-mode stand-in — on a real cluster the cluster manager
    * provides per-node local SSDs and this builder is not used. Respects an
    * explicit SPARK_LOCAL_DIRS from the environment. */
  private def ramLocalDir: Option[String] =
    if (sys.env.contains("SPARK_LOCAL_DIRS")) None
    else {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-spark-local") else None
    }

  def builder(cpus: String = defaultCpus): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet is TIMESTAMP(NANOS); Spark 4 reads it as a raw Long
      // under this flag (Tables.events then derives µs + TimestampType).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val withDir = ramLocalDir.fold(b)(d => b.config("spark.local.dir", d))
    // Deployment/experiment overrides WITHOUT a code edit: SPARK_GRAFT_CONF
    // holds ;-separated key=value Spark confs applied LAST (so a cluster
    // run can size shuffle partitions, advisory sizes, codecs for its own
    // hardware — the local defaults above stay the bench contract).
    // Guard rails: correctness-pinned keys are refused loudly (an env var
    // must not silently flip what the queries compute), malformed entries
    // are refused rather than dropped, and every applied override is
    // logged — a cluster run's effective config must be auditable.
    val pinned = Set(
      "spark.sql.legacy.parquet.nanosAsLong", // Tables' nanos contract
      "spark.sql.session.timeZone",           // epoch arithmetic vs oracle
      "spark.sql.extensions")                 // native expression registry
    sys.env.get("SPARK_GRAFT_CONF").iterator
      .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty)
      .foldLeft(withDir) { (bb, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) if pinned(k.trim) =>
            throw new IllegalArgumentException(
              s"SPARK_GRAFT_CONF: '${k.trim}' is correctness-pinned and " +
                "cannot be overridden via the environment")
          case Array(k, v) =>
            System.err.println(s"[graft] conf override: ${k.trim}=${v.trim}")
            bb.config(k.trim, v.trim)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_CONF: malformed entry '$kv' (expected key=value)")
        }
      }
  }

  def get(cpus: String = defaultCpus): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
