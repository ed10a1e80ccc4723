package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.StringFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function parity queries (SURVEY.md §2.1b): the reference's WString
  * digit-run ToInt/ToFloat, rune Substr/Length — exercised over real table
  * strings and checked against DuckDB regexp/CASE oracles. */
object ScalarQueries {

  private def q24(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val p = Tables.part(s, d)
    // Equality key: the modulo join used previously exploded to |C|·|P|/200
    // rows (1.5M at sf0.1) for no verification value.
    val joined = c.join(p, c("c_custkey") === p("p_partkey"))
    joined.select(
        col("c_custkey"), col("p_partkey"),
        toIntDigitRun(col("c_name")).as("cust_num"),                       // "Customer#000000001" -> 1
        toIntDigitRun(concat(lit("a"), col("p_size"), lit("b"), col("p_partkey"))).as("first_run"),
        toIntDigitRun(col("p_type")).as("no_digits"),                      // no digits -> 0
        toFloatDigitRun(concat(col("p_size"), lit("."), col("p_partkey"), lit("x"))).as("float_run"),
        toFloatDigitRun(concat(col("p_size"), lit("."), col("p_partkey"), lit("."), col("p_size"))).as("two_dots"),
        toFloatDigitRun(col("p_name")).as("lead_alpha"),                   // leading non-digit -> 0
        substrGo(col("p_name"), 2, 5).as("sub_pos"),
        substrGo(col("p_name"), -4, 4).as("sub_neg"),
        lengthRunes(col("p_name")).as("name_len"))
      .orderBy("c_custkey", "p_partkey")
  }

  private val q24Sql =
    """SELECT c_custkey, p_partkey,
      |  CASE WHEN regexp_extract(c_name, '[0-9]+') = '' THEN 0
      |       ELSE COALESCE(TRY_CAST(regexp_extract(c_name, '[0-9]+') AS BIGINT), 0) END AS cust_num,
      |  CASE WHEN regexp_extract('a' || p_size || 'b' || p_partkey, '[0-9]+') = '' THEN 0
      |       ELSE COALESCE(TRY_CAST(regexp_extract('a' || p_size || 'b' || p_partkey, '[0-9]+') AS BIGINT), 0) END AS first_run,
      |  CASE WHEN regexp_extract(p_type, '[0-9]+') = '' THEN 0
      |       ELSE COALESCE(TRY_CAST(regexp_extract(p_type, '[0-9]+') AS BIGINT), 0) END AS no_digits,
      |  COALESCE(CASE WHEN regexp_matches(regexp_extract(p_size || '.' || p_partkey || 'x', '^[0-9][0-9.]*'), '^[0-9]+(\.[0-9]*)?$')
      |       THEN CAST(regexp_extract(p_size || '.' || p_partkey || 'x', '^[0-9][0-9.]*') AS DOUBLE) END, 0.0) AS float_run,
      |  COALESCE(CASE WHEN regexp_matches(regexp_extract(p_size || '.' || p_partkey || '.' || p_size, '^[0-9][0-9.]*'), '^[0-9]+(\.[0-9]*)?$')
      |       THEN CAST(regexp_extract(p_size || '.' || p_partkey || '.' || p_size, '^[0-9][0-9.]*') AS DOUBLE) END, 0.0) AS two_dots,
      |  COALESCE(CASE WHEN regexp_matches(regexp_extract(p_name, '^[0-9][0-9.]*'), '^[0-9]+(\.[0-9]*)?$')
      |       THEN CAST(regexp_extract(p_name, '^[0-9][0-9.]*') AS DOUBLE) END, 0.0) AS lead_alpha,
      |  substring(p_name, 3, 5) AS sub_pos,
      |  substring(p_name, length(p_name) - 3, 4) AS sub_neg,
      |  length(p_name)::INT AS name_len
      |FROM customer JOIN part ON c_custkey = p_partkey
      |ORDER BY c_custkey, p_partkey""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q24_scalar_fns", q24, Some(q24Sql)),
  )
}
