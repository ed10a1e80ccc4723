package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function parity with the reference's `WString` library
  * (`/root/reference/src/library/string/string.go`). Every function is a
  * composition of codegen'd Spark built-ins — no UDFs.
  *
  * The digit-run semantics are NOT plain casts:
  *   ToInt("a12b34")  == 12   — FIRST maximal digit run anywhere (`string.go:59-95`)
  *   ToFloat("12.3x") == 12.3 — but the FIRST char must be a digit, then digits
  *                              and dots; an unparseable run ("1.2.3") → 0
  *                              (`string.go:133-213`)
  *   empty / no match → 0 in both.
  */
object StringFns {

  /** `WString.ToInt/ToInt64` on strings: first digit run, else 0
    * (`string.go:59-131`; "123a"→123, "a12b34"→12, ""→0). Overflow → 0 like
    * Go's ignored `strconv` error. */
  def toIntDigitRun(c: Column): Column = {
    val run = regexp_extract(c, "[0-9]+", 0)
    // try_cast, not cast: under Spark 4's default ANSI mode a >19-digit run
    // would make cast THROW (failing the query) instead of yielding the null
    // this coalesce turns into Go's errors-ignored 0.
    coalesce(when(run === "", 0L).otherwise(run.try_cast("long")), lit(0L))
  }

  /** `WString.ToFloat64`: leading char must be a digit (`string.go:139-143`
    * breaks at k==0), then accepts digits and dots; `strconv.ParseFloat`
    * failure (e.g. "1.2.3") → 0 (`string.go:133-213`). */
  def toFloatDigitRun(c: Column): Column = {
    val run = regexp_extract(c, "^[0-9][0-9.]*", 0)
    coalesce(when(run === "", 0.0).otherwise(try_to_number_double(run)), lit(0.0))
  }

  /** Strict double parse that yields NULL (not an error) on junk like "1.2.3". */
  private def try_to_number_double(c: Column): Column =
    when(c.rlike("^[0-9]+(\\.[0-9]*)?$"), c.cast("double"))

  /** `WString.Substr(pos, length)`: rune-aware, 0-based, negative pos counts
    * from the end, end clamps to the string length (`string.go:38-49`). */
  def substrGo(c: Column, pos: Int, len: Int): Column =
    if (pos >= 0) substring(c, pos + 1, len)
    else substring(c, pos, len)

  /** `WString.Length`: rune (code point) count (`string.go:55-57`) — Spark's
    * `length` already counts characters, not bytes. */
  def lengthRunes(c: Column): Column = length(c)
}
