package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Parity notes (vs the DuckDB oracle):
  *  - Two generations of driver testdata exist for `events.ts`:
  *    TIMESTAMP(NANOS) — which Spark 4 cannot read natively, so it is read as a
  *    raw nanosecond Long under `spark.sql.legacy.parquet.nanosAsLong` — and
  *    TIMESTAMP(MICROS)/NTZ, read natively as TIMESTAMP_NTZ. [[Tables.events]]
  *    normalizes both to the same columns: `ts_ns` (ns long), `ts_us` (µs long)
  *    and `ts` (TimestampType, µs). DuckDB reads either generation as a naive
  *    µs TIMESTAMP, so `ts_us == epoch_us(ts)` exactly. Instant-semantics
  *    TIMESTAMP(isAdjustedToUTC=true) parquet is rejected loudly: DuckDB would
  *    read it as TIMESTAMPTZ and `date_trunc` results would then depend on the
  *    oracle session's timezone, which this repo does not pin.
  *  - Money columns are 2-decimal doubles; aggregates go through DECIMAL so both
  *    engines do exact integer-scaled arithmetic (see [[Num]]).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Required at session build time (see GraftSession): flipping it lazily here
    // would be a hidden session-wide side effect and would leave DataFrames
    // planned before the first Tables call with an inconsistent schema.
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "Set spark.sql.legacy.parquet.nanosAsLong=true at SparkSession build time " +
        "(use graft.GraftSession.builder); legacy testdata generations carry " +
        "events.ts as TIMESTAMP(NANOS) (the flag is a no-op for MICROS data).")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events with ts normalized: ts_ns (ns long), ts_us (µs long, oracle-exact), ts (timestamp).
    *
    * Two generations of the driver's testdata exist: TIMESTAMP(NANOS) (read as a raw
    * ns Long under nanosAsLong) and TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ).
    * Both normalize to the same three columns; session TZ is UTC so the NTZ → TIMESTAMP
    * cast's `unix_micros` matches DuckDB's `epoch_us(ts)` exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    val normalized = raw.schema("ts").dataType match {
      case LongType => // legacy TIMESTAMP(NANOS) read as raw ns
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case TimestampNTZType =>
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
      case TimestampType =>
        // isAdjustedToUTC=true parquet: DuckDB reads this as TIMESTAMPTZ, so the
        // oracle's date_trunc would depend on its session timezone. Refuse rather
        // than silently break q16-style hash parity.
        throw new IllegalStateException(
          "events.ts is instant-semantics TIMESTAMP (isAdjustedToUTC=true); oracle " +
            "parity requires TIMESTAMP_NTZ or legacy TIMESTAMP(NANOS) testdata.")
      case other =>
        throw new IllegalStateException(s"events.ts has unsupported type $other")
    }
    // Canonical column order regardless of which generation was read: original
    // positions with ts normalized in place, derived ts_us/ts_ns appended.
    normalized.select("event_id", "ts", "user_id", "event_type", "value", "props", "ts_us", "ts_ns")
  }
}

/** Deterministic numeric helpers: both engines do exact DECIMAL arithmetic, then a
  * final cast to DOUBLE — identical bits on both sides, no float-sum-order issues. */
object Num {
  val D2  = DecimalType(12, 2)
  val D4  = DecimalType(18, 4)
  def dec2(c: Column): Column = c.cast(D2)
  def d184(c: Column): Column = c.cast(D4)
  def dbl(c: Column): Column  = c.cast(DoubleType)
  /** revenue term `extprice * (1 - discount)` kept within decimal-38 on both engines. */
  def revTerm(price: Column, disc: Column): Column =
    d184(dec2(price) * (lit(1) - dec2(disc)))
}
