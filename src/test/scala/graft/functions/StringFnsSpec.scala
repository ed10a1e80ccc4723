package graft.functions

import graft.SparkSpec
import graft.functions.StringFns._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Table-driven parity cases transcribed from the reference's
  * `src/library/string/string_test.go` plus the digit-run edge semantics of
  * `string.go:59-213`. */
class StringFnsSpec extends SparkSpec {

  private def eval1[T](input: String, f: Column => Column): T = {
    import spark.implicits._
    Seq(input).toDF("s").select(f(col("s")).as("r")).collect()(0).getAs[T]("r")
  }

  test("ToInt: digit-run extraction (string_test.go:104-141)") {
    assert(eval1[Long]("123", toIntDigitRun) === 123L)
    assert(eval1[Long]("123a", toIntDigitRun) === 123L)
    assert(eval1[Long]("123.12a", toIntDigitRun) === 123L)  // ToInt64 case 2
    assert(eval1[Long]("a12b34", toIntDigitRun) === 12L)    // FIRST run wins
    assert(eval1[Long]("", toIntDigitRun) === 0L)
    // overflow -> 0 like Go's ignored strconv error; under Spark 4's default
    // ANSI mode a plain cast would THROW here instead
    assert(eval1[Long]("x99999999999999999999y", toIntDigitRun) === 0L)
    assert(eval1[Long]("abc", toIntDigitRun) === 0L)
    assert(eval1[Long]("007x", toIntDigitRun) === 7L)
  }

  test("ToFloat64: leading digit required, digits+dots, parse failure -> 0") {
    assert(eval1[Double]("123", toFloatDigitRun) === 123.0)
    assert(eval1[Double]("123.12a", toFloatDigitRun) === 123.12)
    assert(eval1[Double]("a123.12", toFloatDigitRun) === 0.0)  // k==0 break (string.go:139-143)
    assert(eval1[Double]("1.2.3", toFloatDigitRun) === 0.0)    // ParseFloat error -> 0
    assert(eval1[Double]("9.", toFloatDigitRun) === 9.0)
    assert(eval1[Double]("1e5", toFloatDigitRun) === 1.0)      // 'e' stops the run
    assert(eval1[Double]("", toFloatDigitRun) === 0.0)
  }

  test("Substr: 0-based, negative start from end, clamped (string_test.go:49-76)") {
    assert(eval1[String]("12345", substrGo(_, 0, 3)) === "123")
    assert(eval1[String]("12345", substrGo(_, -2, 2)) === "45")  // "1234".Substr(-2,2)=="34" shape
    assert(eval1[String]("12345", substrGo(_, 2, 100)) === "345") // clamp
    assert(eval1[String]("哈哈哈xy", substrGo(_, 0, 3)) === "哈哈哈") // rune-aware
  }

  test("Length: rune count (string_test.go:78-102)") {
    assert(eval1[Int]("123", lengthRunes) === 3)
    assert(eval1[Int]("哈哈", lengthRunes) === 2)
    assert(eval1[Int]("", lengthRunes) === 0)
  }
}
