package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

// Top-level: Dataset encoders cannot instantiate inner (outer-scoped) case classes.
case class DecMeta(name: String, rawType: String, unsigned: Boolean,
                   enumValues: Seq[String], setValues: Seq[String])

/** fieldDecode parity cases from FIXTURES.md §3
  * (reference `/root/reference/src/library/binlog/util.go:61-146`). */
class DecodeSpec extends SparkSpec {
  private type Meta = DecMeta
  private val Meta = DecMeta

  private def decode(value: String, m: Meta): String = {
    import spark.implicits._
    val df = Seq((value, m)).toDF("v", "meta")
    df.select(Decode.toJsonFragment(col("v"), col("meta")).as("r")).collect()(0).getString(0)
  }

  private def m(rawType: String, unsigned: Boolean = false,
                enum: Seq[String] = Nil, set: Seq[String] = Nil): Meta =
    Meta("c", rawType, unsigned, enum, set)

  test("tinyint unsigned: -1 -> 255") {
    assert(decode("-1", m("tinyint(3) unsigned", unsigned = true)) === "255")
  }
  test("smallint unsigned: -1 -> 65535") {
    assert(decode("-1", m("smallint(5) unsigned", unsigned = true)) === "65535")
  }
  test("mediumint unsigned: -1 -> 16777215 (rawType not prefixed 'int')") {
    assert(decode("-1", m("mediumint(8) unsigned", unsigned = true)) === "16777215")
  }
  test("int unsigned: -1 -> 4294967295 (rawType prefixed 'int')") {
    assert(decode("-1", m("int(10) unsigned", unsigned = true)) === "4294967295")
  }
  test("bigint unsigned: -1 -> 18446744073709551615") {
    assert(decode("-1", m("bigint(20) unsigned", unsigned = true)) === "18446744073709551615")
  }
  test("signed ints pass through unchanged") {
    assert(decode("7", m("int(11)")) === "7")
    assert(decode("-7", m("tinyint(3)")) === "-7")
    assert(decode("-123456789012", m("bigint(20)")) === "-123456789012")
  }
  test("unsigned but non-negative passes through") {
    assert(decode("200", m("tinyint(3) unsigned", unsigned = true)) === "200")
  }
  test("enum ordinal is 1-based: 2 -> second label") {
    assert(decode("2", m("enum('a','b','c')", enum = Seq("a", "b", "c"))) === "\"b\"")
  }
  test("set bitmask 5 -> 'x,z' (bits 0 and 2)") {
    assert(decode("5", m("set('x','y','z')", set = Seq("x", "y", "z"))) === "\"x,z\"")
  }
  test("set bitmask 0 -> empty string") {
    assert(decode("0", m("set('x','y','z')", set = Seq("x", "y", "z"))) === "\"\"")
  }
  test("string passthrough is a quoted JSON fragment with escaping") {
    assert(decode("he\"llo\\x", m("varchar(32)")) === "\"he\\\"llo\\\\x\"")
  }
  test("NULL (short-row padding) -> JSON null") {
    assert(decode(null, m("varchar(32)")) === "null")
  }
}
