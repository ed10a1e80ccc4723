package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark-first implementation plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  * Both sides emit the SAME column names and a total deterministic ORDER BY. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the sf0.1 bench sweep (all queries must be scale-safe, but
      * bench runs the headline set). */
    bench: Boolean = true)
