package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

// Top-level: Dataset encoders cannot instantiate inner (outer-scoped) case classes.
case class EnvMeta(name: String, rawType: String, unsigned: Boolean,
                   enumValues: Seq[String], setValues: Seq[String])
case class EnvRaw(database: String, table: String, action: String,
                  ts: Long, stmt_seq: Long,
                  cols: Seq[EnvMeta], rows: Seq[Seq[String]])

/** Golden envelope tests from FIXTURES.md §1/§2: byte-exact JSON (Go
  * `json.Marshal` sorts map keys alphabetically — reference
  * `handler.go:81-98`), multi-row explode counts, update pairing, alter
  * without an `event` key, short-row NULL padding. */
class EnvelopeSpec extends SparkSpec {
  private type Meta = EnvMeta
  private val Meta = EnvMeta
  private type Raw = EnvRaw
  private val Raw = EnvRaw

  private val cityCols = Seq(
    Meta("id", "int(11)", unsigned = false, Nil, Nil),
    Meta("city_name", "varchar(64)", unsigned = false, Nil, Nil),
    Meta("provinces_id", "int(11)", unsigned = false, Nil, Nil))

  private def run(raw: Seq[Raw]): Array[(Long, String, String)] = {
    import spark.implicits._
    val df: DataFrame = raw.toDF()
    val env = EnvelopeBuilder.withEventIndex(EnvelopeBuilder.fromPositional(df))
    env.withColumn("envelope", EnvelopeBuilder.envelopeJson(env))
      .orderBy("event_index")
      .select(col("event_index"), col("topic"), col("envelope"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
  }

  test("insert golden envelope (FIXTURES §1), unicode intact, keys alphabetical") {
    val out = run(Seq(Raw("test", "city", "insert", 1524115914L, 1,
      cityCols, Seq(Seq("6078191", "哈哈哈", "1")))))
    assert(out.length === 1)
    assert(out(0)._3 ===
      """{"database":"test","event":{"data":{"city_name":"哈哈哈","id":6078191,"provinces_id":1}},"event_index":1,"event_type":"insert","table":"city","time":1524115914}""")
    assert(out(0)._2 === "test.city")
  }

  test("update pairs even/odd rows into old_data/new_data (FIXTURES §1)") {
    val out = run(Seq(Raw("test", "city", "update", 1524115867L, 1,
      cityCols, Seq(Seq("5764809", "北海市", "22"), Seq("5764809", "北海市1", "22")))))
    assert(out.length === 1)
    assert(out(0)._3 ===
      """{"database":"test","event":{"data":{"new_data":{"city_name":"北海市1","id":5764809,"provinces_id":22},"old_data":{"city_name":"北海市","id":5764809,"provinces_id":22}}},"event_index":1,"event_type":"update","table":"city","time":1524115867}""")
  }

  test("delete golden envelope (FIXTURES §1)") {
    val out = run(Seq(Raw("test", "city", "delete", 1524115287L, 1,
      cityCols, Seq(Seq("5764808", "梧州市", "22")))))
    assert(out(0)._3 ===
      """{"database":"test","event":{"data":{"city_name":"梧州市","id":5764808,"provinces_id":22}},"event_index":1,"event_type":"delete","table":"city","time":1524115287}""")
  }

  test("alter carries NO event key (handler.go:101-110)") {
    val out = run(Seq(Raw("test", "bar", "alter", 1524116248L, 1, cityCols, null)))
    assert(out(0)._3 ===
      """{"database":"test","event_index":1,"event_type":"alter","table":"bar","time":1524116248}""")
  }

  test("multi-row statements explode: 3-row insert -> 3 envelopes, 4-row update -> 2, dense index") {
    val out = run(Seq(
      Raw("d", "t", "insert", 10L, 1, cityCols,
        Seq(Seq("1", "a", "1"), Seq("2", "b", "2"), Seq("3", "c", "3"))),
      Raw("d", "t", "update", 11L, 2, cityCols,
        Seq(Seq("1", "a", "1"), Seq("1", "a2", "1"), Seq("2", "b", "2"), Seq("2", "b2", "2"))),
      Raw("d", "t", "delete", 12L, 3, cityCols, Seq(Seq("9", "z", "9")))))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val types = out.map(_._3).map(e => "\"event_type\":\"(\\w+)\"".r.findFirstMatchIn(e).get.group(1))
    assert(types.toSeq === Seq("insert", "insert", "insert", "update", "update", "delete"))
  }

  test("short row pads missing trailing columns with null (handler.go:146-148)") {
    val out = run(Seq(Raw("d", "t", "insert", 1L, 1, cityCols, Seq(Seq("7", "x")))))
    assert(out(0)._3.contains(""""event":{"data":{"city_name":"x","id":7,"provinces_id":null}}"""))
  }

  test("static (plan-time schema) path emits byte-identical envelopes to the dynamic path") {
    import spark.implicits._
    val metas = Seq(
      Meta("id", "int(11)", unsigned = false, Nil, Nil),
      Meta("big_u", "bigint(20) unsigned", unsigned = true, Nil, Nil),
      Meta("flag", "enum('a','b')", unsigned = false, Seq("a", "b"), Nil),
      Meta("tags", "set('x','y')", unsigned = false, Nil, Seq("x", "y")),
      Meta("note", "varchar(8)", unsigned = false, Nil, Nil))
    val statics = metas.map(m => Decode.ColMeta(m.name, m.rawType, m.unsigned, m.enumValues, m.setValues))
    val rawRows = Seq(
      Raw("d", "t", "insert", 1L, 1, metas, Seq(Seq("7", "-1", "2", "3", "he\"y"))),
      Raw("d", "t", "update", 2L, 2, metas,
        Seq(Seq("7", "5", "1", "0", "a"), Seq("7", "5", "2", "1", "b"))),
      Raw("d", "t", "insert", 3L, 3, metas, Seq(Seq("9", "1"))),   // short row
      Raw("d", "t", "alter", 4L, 4, metas, null))
    val df = rawRows.toDF()
    val dyn = EnvelopeBuilder.envelopes(EnvelopeBuilder.fromPositional(df))
      .orderBy("stmt_seq", "pair_pos").select("event_type", "event", "topic")
      .collect().map(_.toSeq).toSeq
    val sta = EnvelopeBuilder.envelopesStatic(df.drop("cols"), statics)
      .orderBy("stmt_seq", "pair_pos").select("event_type", "event", "topic")
      .collect().map(_.toSeq).toSeq
    assert(sta === dyn)
  }

  test("event_index continues from a restored start offset (ST2 semantics)") {
    import spark.implicits._
    val df = Seq(Raw("d", "t", "insert", 1L, 1, cityCols, Seq(Seq("1", "a", "1"), Seq("2", "b", "2")))).toDF()
    val env = EnvelopeBuilder.withEventIndex(EnvelopeBuilder.fromPositional(df), startIndex = 1161L)
    assert(env.select("event_index").collect().map(_.getLong(0)).sorted.toSeq === Seq(1162L, 1163L))
  }

  test("static path sorts keys by UTF-8 bytes like Go, not UTF-16 code units") {
    import spark.implicits._
    // U+FFFD (UTF-8: EF BF BD) sorts BEFORE U+1F600 (F0 9F 98 80) in byte
    // order — but AFTER it in Java String order (0xFFFD > surrogate 0xD83D).
    // Go's json.Marshal and the dynamic path's array_sort both compare
    // UTF-8 bytes; the static path must agree.
    val repl = "�"
    val emoji = new String(Character.toChars(0x1F600))
    val cols = Seq(Decode.ColMeta(emoji, "int(11)"), Decode.ColMeta(repl, "int(11)"))
    val json = Seq(Seq("7", "8")).toDF("row")
      .select(EnvelopeBuilder.rowJsonStatic(col("row"), cols).as("j"))
      .collect()(0).getString(0)
    assert(json.indexOf(repl) >= 0 && json.indexOf(emoji) >= 0)
    assert(json.indexOf(repl) < json.indexOf(emoji),
      s"UTF-8 byte order puts U+FFFD first: $json")
    // and the value slots still follow the POSITIONAL column order
    assert(json.contains(s""""$repl":8""") && json.contains(s""""$emoji":7"""), json)
  }
}
