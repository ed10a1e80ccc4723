package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level JSON fragment builders.
  *
  * The engine serializes envelopes to JSON exactly once before fan-out
  * (reference: `src/library/binlog/handler.go:81-98`, `json.Marshal`). Go's
  * `encoding/json` sorts map keys alphabetically, so the reference's observable
  * wire format has alphabetically-ordered keys — we reproduce that.
  *
  * We build JSON with explicit `concat` over pre-encoded fragments instead of
  * `to_json`: (1) the payload is dynamically typed (a MySQL row image mixes
  * numbers and strings), which a static Spark schema can't carry without
  * VariantType; (2) the byte-level output must be reproducible by the DuckDB
  * oracle — plain string concatenation is engine-independent and stays inside
  * whole-stage codegen.
  *
  * A "fragment" is a string column holding already-valid JSON: `123`,
  * `"abc"`, `null`, `18446744073709551615`.
  */
object Json {

  /** JSON string escaping for the characters that can occur in our inputs
    * (Jackson/encoding-json-compatible for `\`, `"`, `\n`, `\r`, `\t`).
    * Non-ASCII passes through raw, as both Go and Spark emit UTF-8 unescaped. */
  def escape(c: Column): Column = {
    val esc = Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t")
    val escaped = esc.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), java.util.regex.Matcher.quoteReplacement(to))
    }
    // Fast path: one containment check instead of five regexp passes — in CDC
    // payloads the overwhelming majority of strings need no escaping at all.
    when(c.rlike("[\\\\\"\n\r\t]"), escaped).otherwise(c)
  }

  /** `"escaped"` — a JSON string literal fragment; SQL-NULL in → fragment `null`. */
  def str(c: Column): Column =
    when(c.isNull, lit("null")).otherwise(concat(lit("\""), escape(c), lit("\"")))

  /** A JSON number fragment from any numeric column; SQL-NULL → `null`. */
  def num(c: Column): Column =
    when(c.isNull, lit("null")).otherwise(c.cast("string"))

  /** `{"k1":v1,...}` from an ARRAY<STRUCT<k:STRING, v:STRING>> of (key, fragment)
    * entries, in array order. Callers wanting Go-`json.Marshal` order pass a
    * key-sorted array (see [[sortEntries]]). NULL array → SQL NULL. */
  def obj(entries: Column): Column =
    when(entries.isNull, lit(null).cast("string"))
      .otherwise(concat(
        lit("{"),
        concat_ws(",", transform(entries, e => concat(str(e.getField("k")), lit(":"), e.getField("v")))),
        lit("}")))

  /** Sort (k, v) entries by key — `encoding/json` marshals Go maps in sorted
    * key order, so this is what makes our bytes match the reference's. */
  def sortEntries(entries: Column): Column = array_sort(entries)

  /** One (key, fragment) entry. */
  def entry(k: Column, v: Column): Column = struct(k.as("k"), v.as("v"))
}
