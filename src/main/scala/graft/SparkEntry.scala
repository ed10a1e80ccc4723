package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query catalog lives in graft.queries.*; each entry carries both the
  * Spark-first implementation and (where SQL-expressible) the DuckDB oracle. */
object SparkEntry {

  /** All catalog entries, in stable order. */
  def catalog: Seq[QueryDef] =
    graft.queries.RelationalQueries.all ++
      graft.queries.CdcQueries.all ++
      graft.queries.ScalarQueries.all ++
      graft.queries.LlmQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Headline subset for the bench sweep. */
  def benchQueries: Seq[QueryDef] = catalog.filter(_.bench)
}
