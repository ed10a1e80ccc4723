package graft.source

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.CRC32

import graft.SparkSpec
import graft.cdc.{Decode, SchemaRegistry}
import org.apache.spark.sql.functions._

/** Crafts REAL binlog-format bytes (v4 headers, FORMAT_DESCRIPTION,
  * TABLE_MAP, ROWS v2, QUERY, CRC32) independently of the parser, so the
  * golden tests exercise [[BinaryBinlogReader]] against the wire format
  * itself — mirroring `vendor/.../replication/row_event.go:385-500`
  * semantics from the byte level up. */
final class BinlogFixtureWriter(checksum: Boolean) {
  import BinlogWire._
  private val out = new ByteArrayOutputStream()
  out.write(Magic)

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
  private def be(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray

  /** Append one event; returns its start offset in the file. */
  def event(ts: Long, etype: Int, body: Array[Byte], crcOverride: Option[Long] = None): Long = {
    val start = out.size().toLong
    val withCrc = checksum || etype == FORMAT_DESCRIPTION_EVENT
    val size = 19 + body.length + (if (withCrc) 4 else 0)
    val head = new ByteArrayOutputStream()
    head.write(le(ts, 4)); head.write(etype); head.write(le(1L, 4)) // server_id
    head.write(le(size, 4)); head.write(le(start + size, 4)); head.write(le(0, 2))
    val h = head.toByteArray
    out.write(h); out.write(body)
    if (withCrc) {
      val crc = new CRC32(); crc.update(h); crc.update(body)
      out.write(le(crcOverride.getOrElse(crc.getValue), 4))
    }
    start
  }

  /** FORMAT_DESCRIPTION: version 4, header length 19, checksum alg in the
    * standard tail position (last byte before the event's own CRC).
    * `serverVersion` lets fixtures speak a MariaDB version string — the
    * layout is identical (MariaDB ≥5.3 writes the same v4 FDE + checksum
    * byte). */
  def fde(ts: Long = 100L, serverVersion: String = "5.7.44-graft-fixture"): Long = {
    val b = new ByteArrayOutputStream()
    b.write(le(4, 2))
    val sv = serverVersion.getBytes(StandardCharsets.UTF_8)
    b.write(java.util.Arrays.copyOf(sv, 50))
    b.write(le(ts, 4)); b.write(19)
    b.write(Array.fill(39)(0.toByte)) // post-header length table (unused here)
    b.write(if (checksum) 1 else 0)   // checksum algorithm
    event(ts, FORMAT_DESCRIPTION_EVENT, b.toByteArray)
  }

  def tableMap(ts: Long, tableId: Long, db: String, table: String,
               cols: Seq[(Int, Array[Byte])]): Long = {
    val b = new ByteArrayOutputStream()
    b.write(le(tableId, 6)); b.write(le(0, 2))
    val dbB = db.getBytes(StandardCharsets.UTF_8)
    val tbB = table.getBytes(StandardCharsets.UTF_8)
    b.write(dbB.length); b.write(dbB); b.write(0)
    b.write(tbB.length); b.write(tbB); b.write(0)
    b.write(cols.length) // lenenc (< 251)
    cols.foreach { case (t, _) => b.write(t) }
    val metaBytes = cols.flatMap(_._2).toArray
    b.write(metaBytes.length) // lenenc
    b.write(metaBytes)
    b.write(Array.fill((cols.length + 7) / 8)(0.toByte)) // null-bits
    event(ts, TABLE_MAP_EVENT, b.toByteArray)
  }

  /** TABLE_MAP carrying MySQL 8 `binlog_row_metadata=FULL` optional TLVs:
    * SIGNEDNESS(1, MSB-first over numeric columns), COLUMN_NAME(4),
    * SET_STR_VALUE(5), ENUM_STR_VALUE(6). */
  def tableMapFull(ts: Long, tableId: Long, db: String, table: String,
                   cols: Seq[(Int, Array[Byte])], names: Seq[String],
                   unsignedNumeric: Seq[Boolean],
                   enums: Seq[Seq[String]] = Nil,
                   sets: Seq[Seq[String]] = Nil): Long = {
    val b = new ByteArrayOutputStream()
    b.write(le(tableId, 6)); b.write(le(0, 2))
    val dbB = db.getBytes(StandardCharsets.UTF_8)
    val tbB = table.getBytes(StandardCharsets.UTF_8)
    b.write(dbB.length); b.write(dbB); b.write(0)
    b.write(tbB.length); b.write(tbB); b.write(0)
    b.write(cols.length)
    cols.foreach { case (t, _) => b.write(t) }
    val metaBytes = cols.flatMap(_._2).toArray
    b.write(metaBytes.length); b.write(metaBytes)
    b.write(Array.fill((cols.length + 7) / 8)(0.toByte)) // null-bits
    def tlv(t: Int, v: Array[Byte]): Unit = { b.write(t); b.write(v.length); b.write(v) }
    val bits = new Array[Byte]((unsignedNumeric.length + 7) / 8)
    unsignedNumeric.zipWithIndex.foreach { case (u, k) =>
      if (u) bits(k >> 3) = (bits(k >> 3) | (0x80 >> (k & 7))).toByte
    }
    if (unsignedNumeric.nonEmpty) tlv(1, bits)
    val nb = new ByteArrayOutputStream()
    names.foreach { nm =>
      val x = nm.getBytes(StandardCharsets.UTF_8); nb.write(x.length); nb.write(x)
    }
    tlv(4, nb.toByteArray)
    def groups(gs: Seq[Seq[String]]): Array[Byte] = {
      val gb = new ByteArrayOutputStream()
      gs.foreach { g =>
        gb.write(g.length)
        g.foreach { v =>
          val x = v.getBytes(StandardCharsets.UTF_8); gb.write(x.length); gb.write(x)
        }
      }
      gb.toByteArray
    }
    if (sets.nonEmpty) tlv(5, groups(sets))
    if (enums.nonEmpty) tlv(6, groups(enums))
    event(ts, TABLE_MAP_EVENT, b.toByteArray)
  }

  /** One rows event (v2). Each image is a Seq of pre-encoded values
    * (None = NULL). All columns present. */
  def rows(ts: Long, etype: Int, tableId: Long, nCols: Int,
           images: Seq[Seq[Option[Array[Byte]]]]): Long = {
    val b = new ByteArrayOutputStream()
    b.write(le(tableId, 6)); b.write(le(0, 2))
    b.write(le(2, 2)) // v2 extra-data length (just the length field itself)
    b.write(nCols)    // lenenc
    val bmLen = (nCols + 7) / 8
    val allPresent = Array.tabulate(bmLen)(i =>
      (0 until 8).map(j => if (i * 8 + j < nCols) 1 << j else 0).sum.toByte)
    b.write(allPresent)
    if (etype == UPDATE_ROWS_V2) b.write(allPresent)
    images.foreach { img =>
      val nulls = new Array[Byte](bmLen)
      img.zipWithIndex.foreach { case (v, i) => if (v.isEmpty) nulls(i >> 3) = (nulls(i >> 3) | (1 << (i & 7))).toByte }
      b.write(nulls)
      img.foreach(_.foreach(b.write))
    }
    event(ts, etype, b.toByteArray)
  }

  /** GTID transaction header (gtid_mode=ON): commit flag, source uuid,
    * transaction number, 5.7 logical-clock tail. */
  def gtid(ts: Long, sid: String, gno: Long): Long = {
    val b = new ByteArrayOutputStream()
    b.write(1) // GTID_FLAG_MAY_HAVE_SBR
    b.write(GtidSet.sidBytes(sid))
    b.write(le(gno, 8))
    b.write(2) // logical-clock typecode
    b.write(le(0, 8)); b.write(le(0, 8)) // last_committed, sequence_number
    event(ts, GTID_EVENT, b.toByteArray)
  }

  /** PREVIOUS_GTIDS file prologue: the executed set at file creation. */
  def previousGtids(ts: Long, set: GtidSet): Long =
    event(ts, PREVIOUS_GTIDS_EVENT, set.encode)

  /** XID transaction-commit marker. */
  def xid(ts: Long, id: Long): Long = event(ts, XID_EVENT, le(id, 8))

  /** ROWS_QUERY_EVENT (binlog_rows_query_log_events=ON): one length byte
    * (capped at 255 — the text always runs to the event end regardless) +
    * the original statement text. */
  def rowsQuery(ts: Long, sql: String): Long = {
    val b = new ByteArrayOutputStream()
    val sqlB = sql.getBytes(StandardCharsets.UTF_8)
    b.write(math.min(sqlB.length, 255))
    b.write(sqlB)
    event(ts, ROWS_QUERY_EVENT, b.toByteArray)
  }

  def query(ts: Long, db: String, sql: String): Long = {
    val b = new ByteArrayOutputStream()
    val dbB = db.getBytes(StandardCharsets.UTF_8)
    b.write(le(7, 4)); b.write(le(0, 4)) // thread id, exec time
    b.write(dbB.length); b.write(le(0, 2)); b.write(le(0, 2)) // err, status len
    b.write(dbB); b.write(0)
    b.write(sql.getBytes(StandardCharsets.UTF_8))
    event(ts, QUERY_EVENT, b.toByteArray)
  }

  def bytes: Array[Byte] = out.toByteArray

  // ------------------------------------------------- value encoders (inverse)
  def vTiny(v: Int): Option[Array[Byte]] = Some(le(v & 0xff, 1))
  def vShort(v: Int): Option[Array[Byte]] = Some(le(v & 0xffff, 2))
  def vInt24(v: Int): Option[Array[Byte]] = Some(le(v & 0xffffff, 3))
  def vLong(v: Int): Option[Array[Byte]] = Some(le(v & 0xffffffffL, 4))
  def vLongLong(v: Long): Option[Array[Byte]] = Some(le(v, 8))
  def vFloat(v: Float): Option[Array[Byte]] = Some(le(java.lang.Float.floatToIntBits(v) & 0xffffffffL, 4))
  def vDouble(v: Double): Option[Array[Byte]] = Some(le(java.lang.Double.doubleToLongBits(v), 8))
  def vYear(y: Int): Option[Array[Byte]] = Some(le(if (y == 0) 0 else y - 1900, 1))
  def vVarchar(s: String, maxLen: Int): Option[Array[Byte]] = {
    val d = s.getBytes(StandardCharsets.UTF_8)
    Some((if (maxLen < 256) le(d.length, 1) else le(d.length, 2)) ++ d)
  }
  def vEnum(ordinal: Int, size: Int): Option[Array[Byte]] = Some(le(ordinal, size))
  def vSet(mask: Long, size: Int): Option[Array[Byte]] = Some(le(mask, size))
  def vBit(v: Long, nbits: Int): Option[Array[Byte]] = Some(be(v, (nbits + 7) / 8))
  def vBlob(data: String, metaBytes: Int): Option[Array[Byte]] = {
    val d = data.getBytes(StandardCharsets.UTF_8)
    Some(le(d.length, metaBytes) ++ d)
  }
  def vDate(y: Int, m: Int, d: Int): Option[Array[Byte]] = Some(le(d | (m << 5) | (y << 9), 3))
  def vDatetime2(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int): Option[Array[Byte]] = {
    val ym = y * 13 + mo
    Some(be(0x8000000000L + ((ym.toLong << 22) | (d.toLong << 17) | (h.toLong << 12) | (mi.toLong << 6) | s), 5))
  }
  def vTimestamp2(secs: Long): Option[Array[Byte]] = Some(be(secs, 4))
  def vTime2(h: Int, m: Int, s: Int): Option[Array[Byte]] = {
    Some(be(0x800000L + ((h.toLong << 12) | (m.toLong << 6) | s), 3))
  }
  def vDecimal(text: String, precision: Int, scale: Int): Option[Array[Byte]] = {
    val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
    val neg = text.startsWith("-")
    val t = text.stripPrefix("-")
    val (ip0, fp0) = t.span(_ != '.')
    val ip = ip0.reverse.padTo(precision - scale, '0').reverse
    val fp = fp0.stripPrefix(".").padTo(scale, '0')
    val b = new ByteArrayOutputStream()
    val intRem = (precision - scale) % 9
    var idx = 0
    if (intRem > 0) { b.write(be(ip.substring(0, intRem).toLong, dig2bytes(intRem))); idx = intRem }
    while (idx < ip.length) { b.write(be(ip.substring(idx, idx + 9).toLong, 4)); idx += 9 }
    idx = 0
    while (idx + 9 <= fp.length) { b.write(be(fp.substring(idx, idx + 9).toLong, 4)); idx += 9 }
    val fracRem = scale % 9
    if (fracRem > 0) b.write(be(fp.substring(idx).toLong, dig2bytes(fracRem)))
    val arr = b.toByteArray
    if (neg) { var i = 0; while (i < arr.length) { arr(i) = (~arr(i)).toByte; i += 1 } }
    arr(0) = (arr(0) ^ 0x80).toByte
    Some(arr)
  }

  // TABLE_MAP metadata helpers
  def mNone: Array[Byte] = Array.empty
  def m1(v: Int): Array[Byte] = Array(v.toByte)
  def mLe2(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  /** STRING-multiplexed ENUM/SET/CHAR: (real_type, size) big-endian pair. */
  def mBe2(realType: Int, size: Int): Array[Byte] = Array(realType.toByte, size.toByte)
  def mBit(nbits: Int): Array[Byte] = Array((nbits % 8).toByte, (nbits / 8).toByte)
}

class BinlogWireSpec extends SparkSpec {
  import BinlogWire._

  private def readAll(file: Path): Seq[(Long, String)] = {
    val r = new BinaryBinlogReader(file.toString, 0L, Long.MaxValue)
    try Iterator.continually(r.nextLine()).takeWhile(_ != null).toList
    finally r.close()
  }
  private def writeTmp(bytes: Array[Byte]): Path = {
    val p = Files.createTempFile("binlog", ".bin")
    Files.write(p, bytes); p.toFile.deleteOnExit(); p
  }
  private def rowsOf(line: String): Seq[Seq[Option[String]]] = {
    // parse through Spark's from_json for contract fidelity
    import spark.implicits._
    val df = Seq(line).toDF("value")
      .select(from_json(col("value"), graft.streaming.CdcStream.rawPositionalSchema).as("r"))
      .select("r.rows")
    df.collect().head.getSeq[scala.collection.Seq[String]](0)
      .map(img => img.map(Option(_)).toSeq).toSeq
  }

  test("§1.4 type matrix round-trips from wire bytes to positional carriers") {
    val w = new BinlogFixtureWriter(checksum = false)
    w.fde()
    val cols = Seq(
      TYPE_TINY -> w.mNone, TYPE_SHORT -> w.mNone, TYPE_INT24 -> w.mNone,
      TYPE_LONG -> w.mNone, TYPE_LONGLONG -> w.mNone,
      TYPE_FLOAT -> w.m1(4), TYPE_DOUBLE -> w.m1(8),
      TYPE_NEWDECIMAL -> Array(12.toByte, 4.toByte), // precision 12, scale 4 (LE pair: meta&0xff=prec)
      TYPE_VARCHAR -> w.mLe2(300),
      TYPE_STRING -> w.mBe2(TYPE_ENUM, 1),
      TYPE_STRING -> w.mBe2(TYPE_SET, 2),
      TYPE_STRING -> w.mBe2(TYPE_STRING, 5), // CHAR(5)
      TYPE_BIT -> w.mBit(12),
      TYPE_BLOB -> w.m1(2),
      TYPE_DATE -> w.mNone, TYPE_YEAR -> w.mNone,
      TYPE_DATETIME2 -> w.m1(0), TYPE_TIMESTAMP2 -> w.m1(0), TYPE_TIME2 -> w.m1(0))
    w.tableMap(10L, 7L, "shop", "typed", cols)
    w.rows(11L, WRITE_ROWS_V2, 7L, cols.length, Seq(
      Seq(w.vTiny(-6), w.vShort(-2), w.vInt24(-70000), w.vLong(-5), w.vLongLong(-1L),
        w.vFloat(1.5f), w.vDouble(-2.25),
        w.vDecimal("-12345678.9012", 12, 4),
        w.vVarchar("héllo \"q\"", 300),
        w.vEnum(2, 1), w.vSet(5L, 2),
        w.vVarchar("chars", 5), // CHAR(5): same 1-byte length prefix at len<256
        w.vBit(0xABC, 12), w.vBlob("blobby", 2),
        w.vDate(2024, 2, 29), w.vYear(1999),
        w.vDatetime2(2023, 12, 31, 23, 59, 58), w.vTimestamp2(1700000000L), w.vTime2(13, 14, 15)),
      Seq(None, None, None, None, None, None, None, None, None, None, None, None,
        None, None, None, None, None, None, None) // all-NULL image
    ))
    val lines = readAll(writeTmp(w.bytes))
    assert(lines.size === 1)
    val images = rowsOf(lines.head._2)
    assert(images.size === 2)
    assert(images(0) === Seq(
      Some("-6"), Some("-2"), Some("-70000"), Some("-5"), Some("-1"),
      Some("1.5"), Some("-2.25"),
      Some("-12345678.9012"),
      Some("héllo \"q\""),
      Some("2"), Some("5"), Some("chars"),
      Some((0xABC).toString), Some("blobby"),
      Some("2024-02-29"), Some("1999"),
      Some("2023-12-31 23:59:58"), Some("2023-11-14 22:13:20"), Some("13:14:15")).map(identity))
    assert(images(1).forall(_.isEmpty), "all-NULL image decodes to nulls")
  }

  test("seeded sweep: random values round-trip the wire for every numeric/string type") {
    // The fixture writer (encoder) and BinaryBinlogReader (decoder) are
    // independent implementations of the same public byte format; a seeded
    // random sweep over values is therefore a real property test, not the
    // code agreeing with itself.
    val rnd = new scala.util.Random(0xB1470)
    (1 to 8).foreach { round =>
      val w = new BinlogFixtureWriter(checksum = round % 2 == 0)
      w.fde()
      val varLen = 20 + rnd.nextInt(400)
      val prec = 6 + rnd.nextInt(24); val scale = rnd.nextInt(math.min(prec, 9))
      val cols = Seq(
        TYPE_TINY -> w.mNone, TYPE_SHORT -> w.mNone, TYPE_INT24 -> w.mNone,
        TYPE_LONG -> w.mNone, TYPE_LONGLONG -> w.mNone,
        TYPE_DOUBLE -> w.m1(8),
        TYPE_NEWDECIMAL -> Array(prec.toByte, scale.toByte),
        TYPE_VARCHAR -> w.mLe2(varLen))
      w.tableMap(10L, 9L, "d", "t", cols)
      val expected = (1 to 20).map { _ =>
        val tiny = rnd.nextInt(256) - 128
        val short = rnd.nextInt(65536) - 32768
        val i24 = rnd.nextInt(1 << 24) - (1 << 23)
        val i32 = rnd.nextInt()
        val i64 = rnd.nextLong()
        val dbl = rnd.nextDouble() * math.pow(10, rnd.nextInt(6)) * (if (rnd.nextBoolean()) 1 else -1)
        val intDigits = prec - scale
        val ip = (1 to intDigits).map(_ => rnd.nextInt(10)).mkString.replaceFirst("^0+(?=.)", "")
        val fp = (1 to scale).map(_ => rnd.nextInt(10)).mkString
        val dec = (if (rnd.nextBoolean() && ip.exists(_ != '0')) "-" else "") +
          BigDecimal(if (fp.isEmpty) ip else s"$ip.$fp").toString match {
            case s if scale > 0 && !s.contains(".") => s + "." + "0" * scale
            case s if scale > 0 => s + "0" * (scale - s.split("\\.")(1).length)
            case s => s
          }
        val str = rnd.alphanumeric.take(rnd.nextInt(varLen - 10)).mkString
        (tiny, short, i24, i32, i64, dbl, dec, str)
      }
      expected.foreach { case (t, s, m, i, l, d, dec, str) =>
        w.rows(11L, WRITE_ROWS_V2, 9L, cols.length, Seq(Seq(
          w.vTiny(t), w.vShort(s), w.vInt24(m), w.vLong(i), w.vLongLong(l),
          w.vDouble(d), w.vDecimal(dec, prec, scale), w.vVarchar(str, varLen))))
      }
      val lines = readAll(writeTmp(w.bytes))
      assert(lines.size === expected.size)
      lines.zip(expected).foreach { case ((_, line), (t, s, m, i, l, d, dec, str)) =>
        val img = rowsOf(line).head
        assert(img(0) === Some(t.toString) && img(1) === Some(s.toString) &&
          img(2) === Some(m.toString) && img(3) === Some(i.toString) &&
          img(4) === Some(l.toString), s"int mismatch round=$round: $img")
        assert(img(5) === Some(d.toString), s"double mismatch round=$round")
        assert(img(6).map(BigDecimal(_)) === Some(BigDecimal(dec)),
          s"decimal mismatch round=$round prec=$prec scale=$scale: ${img(6)} vs $dec")
        assert(img(7) === Some(str), s"string mismatch round=$round")
      }
    }
  }

  test("legacy temporals (pre-5.6 TIMESTAMP/DATETIME/TIME) decode") {
    val w = new BinlogFixtureWriter(checksum = false)
    w.fde()
    val cols = Seq(TYPE_TIMESTAMP -> w.mNone, TYPE_DATETIME -> w.mNone, TYPE_TIME -> w.mNone)
    w.tableMap(10L, 2L, "d", "t", cols)
    w.rows(11L, WRITE_ROWS_V2, 2L, 3, Seq(Seq(
      Some(Array[Byte]( // 1700000000 LE
        (1700000000L & 0xff).toByte, ((1700000000L >> 8) & 0xff).toByte,
        ((1700000000L >> 16) & 0xff).toByte, ((1700000000L >> 24) & 0xff).toByte)),
      Some((0 until 8).map(i => ((20231231235958L >> (8 * i)) & 0xff).toByte).toArray),
      Some(Array[Byte]((132415 & 0xff).toByte, ((132415 >> 8) & 0xff).toByte,
        ((132415 >> 16) & 0xff).toByte)))))
    val lines = readAll(writeTmp(w.bytes))
    assert(rowsOf(lines.head._2) === Seq(Seq(
      Some("2023-11-14 22:13:20"), Some("2023-12-31 23:59:58"), Some("13:24:15"))))
  }

  test("binary JSON (JSONB) decodes scalars, containers, inlining and nesting") {
    import BinlogWire.decodeJsonb
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // scalar string "hi"
    assert(decodeJsonb(b(0x0c, 0x02, 'h', 'i')) === "\"hi\"")
    // uint64 max
    assert(decodeJsonb(b(0x0a) ++ Array.fill(8)(0xff.toByte)) === "18446744073709551615")
    // double
    val dbits = java.lang.Double.doubleToLongBits(2.5)
    assert(decodeJsonb(b(0x0b) ++ (0 until 8).map(i => ((dbits >> (8 * i)) & 0xff).toByte)) === "2.5")
    // small object {"a":1,"b":"x"}: int16 inlined, string by offset
    val obj = b(0x00,
      0x02, 0x00, 0x16, 0x00,             // count=2, size=22
      0x12, 0x00, 0x01, 0x00,             // key "a": off 18, len 1
      0x13, 0x00, 0x01, 0x00,             // key "b": off 19, len 1
      0x05, 0x01, 0x00,                   // val a: int16 inline = 1
      0x0c, 0x14, 0x00,                   // val b: string at off 20
      'a', 'b',
      0x01, 'x')                          // varlen 1, "x"
    assert(decodeJsonb(obj) === """{"a":1,"b":"x"}""")
    // small array [null, -2, "hi"]
    val arr = b(0x02,
      0x03, 0x00, 0x10, 0x00,             // count=3, size=16
      0x04, 0x00, 0x00,                   // null inline
      0x05, 0xfe, 0xff,                   // int16 -2 inline
      0x0c, 0x0d, 0x00,                   // string at off 13
      0x02, 'h', 'i')
    assert(decodeJsonb(arr) === """[null,-2,"hi"]""")
    // nested: [ {"a":true} ]
    val nested = b(0x02,
      0x01, 0x00, 0x13, 0x00,             // outer count=1, size=19
      0x00, 0x07, 0x00,                   // entry: small object at off 7
      // inner object payload (offsets relative to ITS start):
      0x01, 0x00, 0x0c, 0x00,             // count=1, size=12
      0x0b, 0x00, 0x01, 0x00,             // key "a": off 11, len 1
      0x04, 0x01, 0x00,                   // val: literal true inline
      'a')
    assert(decodeJsonb(nested) === """[{"a":true}]""")
  }

  test("a TYPE_JSON column round-trips through a rows event") {
    val w = new BinlogFixtureWriter(checksum = false)
    w.fde()
    val cols = Seq(TYPE_LONG -> w.mNone, TYPE_JSON -> w.m1(2))
    w.tableMap(10L, 4L, "d", "j", cols)
    val jsonb = Array[Byte](0x0c, 0x03, 'y', 'e', 's')
    val payload = Array[Byte]((jsonb.length & 0xff).toByte, 0) ++ jsonb // 2-byte LE length
    w.rows(11L, WRITE_ROWS_V2, 4L, 2, Seq(Seq(w.vLong(7), Some(payload))))
    val lines = readAll(writeTmp(w.bytes))
    assert(rowsOf(lines.head._2) === Seq(Seq(Some("7"), Some("\"yes\""))))
  }

  test("update images alternate before/after; delete emits delete") {
    val w = new BinlogFixtureWriter(checksum = false)
    w.fde()
    val cols = Seq(TYPE_LONG -> w.mNone, TYPE_VARCHAR -> w.mLe2(40))
    w.tableMap(10L, 3L, "d", "t", cols)
    w.rows(11L, UPDATE_ROWS_V2, 3L, 2, Seq(
      Seq(w.vLong(1), w.vVarchar("old", 40)), Seq(w.vLong(1), w.vVarchar("new", 40)),
      Seq(w.vLong(2), w.vVarchar("a", 40)), Seq(w.vLong(2), w.vVarchar("b", 40))))
    w.rows(12L, DELETE_ROWS_V2, 3L, 2, Seq(Seq(w.vLong(9), None)))
    val lines = readAll(writeTmp(w.bytes))
    assert(lines.size === 2)
    assert(lines.head._2.contains("\"action\":\"update\""))
    assert(rowsOf(lines.head._2) === Seq(
      Seq(Some("1"), Some("old")), Seq(Some("1"), Some("new")),
      Seq(Some("2"), Some("a")), Seq(Some("2"), Some("b"))))
    assert(lines(1)._2.contains("\"action\":\"delete\""))
    assert(rowsOf(lines(1)._2) === Seq(Seq(Some("9"), None)))
  }

  test("golden: binary wire produces the SAME envelopes as the JSON fixture") {
    import spark.implicits._
    // One logical history, twice: binary binlog bytes vs JSON fixture lines.
    val w = new BinlogFixtureWriter(checksum = true)
    w.fde()
    val cols = Seq(TYPE_LONG -> w.mNone, TYPE_VARCHAR -> w.mLe2(60))
    w.tableMap(10L, 5L, "shop", "user", cols)
    w.rows(10L, WRITE_ROWS_V2, 5L, 2, Seq(Seq(w.vLong(1), w.vVarchar("ann", 60))))
    w.query(12L, "shop", "ALTER TABLE shop.user ADD COLUMN age tinyint unsigned AFTER id")
    // post-ALTER wire order (id, age, name): new TABLE_MAP, 3 columns
    val cols2 = Seq(TYPE_LONG -> w.mNone, TYPE_TINY -> w.mNone, TYPE_VARCHAR -> w.mLe2(60))
    w.tableMap(13L, 6L, "shop", "user", cols2)
    w.rows(13L, WRITE_ROWS_V2, 6L, 3, Seq(Seq(w.vLong(3), w.vTiny(-6), w.vVarchar("cat", 60))))
    w.rows(14L, UPDATE_ROWS_V2, 6L, 3, Seq(
      Seq(w.vLong(3), w.vTiny(-6), w.vVarchar("cat", 60)),
      Seq(w.vLong(3), w.vTiny(7), w.vVarchar("cat", 60))))
    val binLines = readAll(writeTmp(w.bytes))
    assert(binLines.size === 4)

    // The JSON fixture carrying the same history (the SchemaRegistrySpec style).
    val jsonLines = Seq(
      """{"database":"shop","table":"user","action":"insert","ts":10,"stmt_seq":1,"rows":[["1","ann"]]}""",
      """{"database":"shop","table":"user","action":"alter","ts":12,"stmt_seq":2,"rows":null,"query":"ALTER TABLE shop.user ADD COLUMN age tinyint unsigned AFTER id"}""",
      """{"database":"shop","table":"user","action":"insert","ts":13,"stmt_seq":3,"rows":[["3","-6","cat"]]}""",
      """{"database":"shop","table":"user","action":"update","ts":14,"stmt_seq":4,"rows":[["3","-6","cat"],["3","7","cat"]]}""")

    def envelopesOf(lines: Seq[String]): Seq[(String, String, String, String)] = {
      val raw = lines.toDF("value")
        .select(from_json(col("value"), graft.streaming.CdcStream.rawPositionalSchema).as("r"))
        .select("r.*")
      val reg = new SchemaRegistry
      reg.register("shop", "user",
        Seq(Decode.ColMeta("id", "int"), Decode.ColMeta("name", "varchar(60)")))
      reg.decodeBatch(raw)
        .select(col("stmt_seq"), col("database"), col("table"), col("event_type"), col("event"))
        .orderBy("stmt_seq", "event_type").collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toSeq
    }
    val fromBinary = envelopesOf(binLines.map(_._2))
    val fromJson = envelopesOf(jsonLines)
    assert(fromBinary === fromJson,
      "binary wire and JSON fixture must decode to identical envelopes")
    // and the drifted-in unsigned tinyint fix-up applied on the binary path:
    assert(fromBinary.map(_._4).contains("""{"data":{"age":250,"id":3,"name":"cat"}}"""))
  }

  test("binlog_row_metadata=FULL: TABLE_MAP TLVs alone reconstruct the schema; " +
    "envelopes are identical to registry-driven decode") {
    import spark.implicits._
    val w = new BinlogFixtureWriter(checksum = true)
    w.fde()
    val cols = Seq(
      TYPE_LONG -> w.mNone,               // id   int, signed
      TYPE_LONG -> w.mNone,               // cnt  int unsigned
      TYPE_STRING -> w.mBe2(TYPE_ENUM, 1), // flag enum('ret_a','ret_n')
      TYPE_STRING -> w.mBe2(TYPE_SET, 1),  // tags set('x','y','z')
      TYPE_VARCHAR -> w.mLe2(40))          // name varchar(40)
    w.tableMapFull(200L, 7L, "shop", "acct", cols,
      names = Seq("id", "cnt", "flag", "tags", "name"),
      unsignedNumeric = Seq(false, true),
      enums = Seq(Seq("ret_a", "ret_n")),
      sets = Seq(Seq("x", "y", "z")))
    w.rows(200L, WRITE_ROWS_V2, 7L, 5, Seq(Seq(
      w.vLong(1), w.vLong(-1), w.vEnum(2, 1), w.vSet(5L, 1), w.vVarchar("ann", 40))))

    // 1. the TLVs reconstruct EXACTLY the ColMeta a live SHOW FULL COLUMNS
    //    bootstrap would have registered — no server fetch involved
    val bytes = w.bytes
    var o = 4
    var tm: TableMap = null
    while (o + 19 <= bytes.length && tm == null) {
      val size = MysqlWire.leAt(bytes, o + 9, 4).toInt
      if ((bytes(o + 4) & 0xff) == TABLE_MAP_EVENT) {
        val body = java.util.Arrays.copyOfRange(bytes, o + 19, o + size - 4) // - CRC
        tm = parseTableMap(new Cursor(body, 0))._2
      }
      o += size
    }
    val full = tm.toColMeta.get
    val registryMetas = Seq(
      Decode.ColMeta("id", "int"),
      Decode.ColMeta("cnt", "int unsigned", unsigned = true),
      Decode.ColMeta("flag", "enum('ret_a','ret_n')",
        enumValues = Seq("ret_a", "ret_n")),
      Decode.ColMeta("tags", "set('x','y','z')", setValues = Seq("x", "y", "z")),
      Decode.ColMeta("name", "varchar(40)"))
    assert(full === registryMetas)

    // 2. envelope parity: decode the same rows event under the TLV-derived
    //    metas and the hand-registered ones — byte-identical envelopes,
    //    including the unsigned fix-up and the ENUM/SET label projection
    val lines = readAll(writeTmp(w.bytes)).map(_._2)
    def envelopesWith(metas: Seq[Decode.ColMeta]): Seq[String] = {
      val raw = lines.toDF("value")
        .select(from_json(col("value"),
          graft.streaming.CdcStream.rawPositionalSchema).as("r"))
        .select("r.*")
      val reg = new SchemaRegistry
      reg.register("shop", "acct", metas)
      reg.decodeBatch(raw).orderBy("stmt_seq")
        .select(col("event")).collect().map(_.getString(0)).toSeq
    }
    val viaTlv = envelopesWith(full)
    assert(viaTlv === envelopesWith(registryMetas))
    assert(viaTlv.head.contains("\"cnt\":4294967295"), viaTlv.head)
    assert(viaTlv.head.contains("\"flag\":\"ret_n\""), viaTlv.head)
    assert(viaTlv.head.contains("\"tags\":\"x,z\""), viaTlv.head)
  }

  test("binlog_row_metadata=FULL end-to-end: an EMPTY registry self-registers " +
    "from the stream and versions drift — no SHOW FULL COLUMNS anywhere") {
    import spark.implicits._
    val w = new BinlogFixtureWriter(checksum = true)
    w.fde()
    val cols1 = Seq(TYPE_LONG -> w.mNone, TYPE_VARCHAR -> w.mLe2(40))
    w.tableMapFull(10L, 5L, "shop", "user", cols1,
      names = Seq("id", "name"), unsignedNumeric = Seq(false))
    w.rows(10L, WRITE_ROWS_V2, 5L, 2, Seq(Seq(w.vLong(1), w.vVarchar("ann", 40))))
    // drift: a column appeared upstream (ALTER on the master) — with FULL
    // metadata the NEXT map simply carries the new schema; no DDL line at all
    val cols2 = Seq(TYPE_LONG -> w.mNone, TYPE_TINY -> w.mNone,
      TYPE_VARCHAR -> w.mLe2(40))
    w.tableMapFull(12L, 6L, "shop", "user", cols2,
      names = Seq("id", "age", "name"), unsignedNumeric = Seq(false, true))
    w.rows(12L, WRITE_ROWS_V2, 6L, 3, Seq(Seq(
      w.vLong(2), w.vTiny(-6), w.vVarchar("bob", 40))))
    val lines = readAll(writeTmp(w.bytes)).map(_._2)
    assert(lines.count(_.contains("\"action\":\"schema\"")) === 2,
      s"one observation per distinct schema: $lines")
    val raw = lines.toDF("value")
      .select(from_json(col("value"),
        graft.streaming.CdcStream.rawPositionalSchema).as("r"))
      .select("r.*")
    val reg = new SchemaRegistry // EMPTY: no register() call anywhere
    val out = reg.decodeBatch(raw).orderBy("stmt_seq")
      .select("event_type", "event", "schema_version").collect()
    assert(out.length === 2, "schema observations are control-plane only")
    assert(out(0).getString(1).contains("""{"data":{"id":1,"name":"ann"}}"""),
      out(0).getString(1))
    assert(out(0).getInt(2) === 1)
    // the drifted-in unsigned tinyint decodes under version 2's metadata
    assert(out(1).getString(1).contains("""{"data":{"age":250,"id":2,"name":"bob"}}"""),
      out(1).getString(1))
    assert(out(1).getInt(2) === 2)
    assert(reg.versionsOf("shop", "user").map(_.version) === Vector(1, 2))
    // replaying the batch (at-least-once) re-derives the same versions
    val replay = reg.decodeBatch(raw).orderBy("stmt_seq")
      .select("event").collect().map(_.getString(0))
    assert(replay.toSeq === out.map(_.getString(1)).toSeq)
    assert(reg.versionsOf("shop", "user").size === 2, "idempotent on replay")
  }

  test("MariaDB dialect: MARIADB_GTID (0xa2) / ANNOTATE_ROWS (0xa0) interleaved " +
    "with rows events decode to the SAME lines as a MySQL-flavored stream") {
    // MariaDB ≥10 masters emit their own GTID event before each transaction
    // and (under binlog_annotate_row_events) an ANNOTATE_ROWS event carrying
    // the originating SQL — event types a MySQL-only decoder has never seen
    // (readme claim: /root/reference/readme.md:16-20, MariaDB 5.5–10.2).
    // The framing-only skip must hold exactly: identical statement lines,
    // positions advancing over the extra events, CRC verification intact
    // (MariaDB writes the same CRC32 tail).
    def build(mariadb: Boolean): BinlogFixtureWriter = {
      val w = new BinlogFixtureWriter(checksum = true)
      w.fde(serverVersion =
        if (mariadb) "10.2.44-MariaDB-log" else "5.7.44-graft-fixture")
      if (mariadb) { // GTID 0-1-1: seqno(8) + domain_id(4) + flags(1)
        w.event(90L, 0xa2, MysqlWire.le(1L, 8) ++ MysqlWire.le(0L, 4) ++ Array(0.toByte))
        w.event(91L, 0xa0,
          "INSERT INTO shop.user VALUES (1,'ann')".getBytes(StandardCharsets.UTF_8))
      }
      w.tableMap(100L, 5L, "shop", "user",
        Seq(TYPE_LONG -> w.mNone, TYPE_VARCHAR -> w.mLe2(40)))
      w.rows(100L, WRITE_ROWS_V2, 5L, 2, Seq(Seq(w.vLong(1), w.vVarchar("ann", 40))))
      if (mariadb) // second transaction's GTID
        w.event(92L, 0xa2, MysqlWire.le(2L, 8) ++ MysqlWire.le(0L, 4) ++ Array(0.toByte))
      w.tableMap(101L, 5L, "shop", "user",
        Seq(TYPE_LONG -> w.mNone, TYPE_VARCHAR -> w.mLe2(40)))
      w.rows(101L, UPDATE_ROWS_V2, 5L, 2, Seq(
        Seq(w.vLong(1), w.vVarchar("ann", 40)),
        Seq(w.vLong(1), w.vVarchar("ann2", 40))))
      w
    }
    val mysqlLines = readAll(writeTmp(build(mariadb = false).bytes))
    val mariaLines = readAll(writeTmp(build(mariadb = true).bytes))
    assert(mysqlLines.size === 2, "insert + update statements")
    assert(mariaLines.size === mysqlLines.size,
      s"MariaDB events must not add or eat lines: $mariaLines")
    // content identical modulo stmt_seq (derived from byte offsets, which
    // the interleaved MariaDB events shift)
    def scrub(s: String) = s.replaceAll("\"stmt_seq\":-?\\d+", "\"stmt_seq\":S")
    assert(mariaLines.map(l => scrub(l._2)) === mysqlLines.map(l => scrub(l._2)))
    // positions still strictly increase and reflect the extra bytes
    assert(mariaLines.map(_._1) === mariaLines.map(_._1).sorted)
    assert(mariaLines.head._1 > mysqlLines.head._1,
      "the GTID/ANNOTATE events occupy file bytes before the first statement")
  }

  test("CRC32 is verified: a corrupted event fails loudly") {
    val w = new BinlogFixtureWriter(checksum = true)
    w.fde()
    w.tableMap(10L, 5L, "d", "t", Seq(TYPE_LONG -> w.mNone))
    w.rows(11L, WRITE_ROWS_V2, 5L, 1, Seq(Seq(w.vLong(42))))
    val bytes = w.bytes
    bytes(bytes.length - 10) = (bytes(bytes.length - 10) ^ 0x01).toByte // flip a payload bit
    val p = writeTmp(bytes)
    val ex = intercept[IllegalArgumentException](readAll(p))
    assert(ex.getMessage.contains("CRC mismatch"))
  }

  test("wireFormat=binary: the DSv2 source tails real binlog files end-to-end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_binwire")
    val w = new BinlogFixtureWriter(checksum = true)
    w.fde()
    val cols = Seq(TYPE_LONG -> w.mNone, TYPE_VARCHAR -> w.mLe2(40))
    w.tableMap(10L, 5L, "shop", "user", cols)
    w.rows(11L, WRITE_ROWS_V2, 5L, 2, Seq(Seq(w.vLong(1), w.vVarchar("ann", 40))))
    w.rows(12L, WRITE_ROWS_V2, 5L, 2, Seq(Seq(w.vLong(2), w.vVarchar("bob", 40))))
    w.tableMap(13L, 6L, "other", "t", Seq(TYPE_LONG -> w.mNone))
    w.rows(13L, WRITE_ROWS_V2, 6L, 1, Seq(Seq(w.vLong(9))))
    Files.write(dir.resolve("binlog.000001"), w.bytes)

    // snapshot read incl. source-side table filter (S3 applies pre-decode)
    val snap = spark.read.format("graft-cdc")
      .option("path", dir.toString).option("wireFormat", "binary")
      .option("tableFilter", "^shop\\.").load()
    assert(snap.count() === 2)
    val decoded = snap
      .select(from_json(col("value"), graft.streaming.CdcStream.rawPositionalSchema).as("r"))
      .select("r.*")
    val reg = new SchemaRegistry
    reg.register("shop", "user",
      Seq(Decode.ColMeta("id", "int"), Decode.ColMeta("name", "varchar(40)")))
    val events = reg.decodeBatch(decoded).select("event").as[String].collect().sorted
    assert(events === Array(
      """{"data":{"id":1,"name":"ann"}}""", """{"data":{"id":2,"name":"bob"}}"""))

    // streaming read: same files through the micro-batch planner
    val cp = Files.createTempDirectory("graft_binwire_cp")
    val outRows = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-cdc")
      .option("path", dir.toString).option("wireFormat", "binary").load()
      .writeStream.option("checkpointLocation", cp.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        outRows += b.count(); ()
      }.start()
    q.awaitTermination(120000)
    assert(outRows.sum === 3, "all three statements stream through (no table filter)")
  }

  test("rotation: stmt_seq stays strictly monotone across binlog files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_binrotate")
    def oneFile(name: String, ids: Seq[Int]): Unit = {
      val w = new BinlogFixtureWriter(checksum = false)
      w.fde()
      w.tableMap(10L, 5L, "d", "t", Seq(TYPE_LONG -> w.mNone))
      ids.foreach(i => w.rows(10L + i, WRITE_ROWS_V2, 5L, 1, Seq(Seq(w.vLong(i)))))
      Files.write(dir.resolve(name), w.bytes)
    }
    oneFile("binlog.000001", Seq(1, 2))
    oneFile("binlog.000002", Seq(3, 4)) // post-rotate: same within-file offsets
    val seqs = spark.read.format("graft-cdc")
      .option("path", dir.toString).option("wireFormat", "binary").load()
      .select(from_json(col("value"), graft.streaming.CdcStream.rawPositionalSchema).as("r"))
      .select("r.stmt_seq").as[Long].collect().sorted.toSeq
    assert(seqs.size === 4)
    assert(seqs.distinct.size === 4,
      s"stmt_seq must not repeat across rotated files: $seqs")
    assert(seqs === seqs.sorted && seqs(1) < seqs(2),
      s"file 2's sequences must continue after file 1's: $seqs")
  }

  test("drop-in: BinaryBinlogReader behind CdcReaderFactory, split ownership holds") {
    val w = new BinlogFixtureWriter(checksum = false)
    w.fde()
    w.tableMap(10L, 5L, "d", "t", Seq(TYPE_LONG -> w.mNone))
    val off1 = w.rows(11L, WRITE_ROWS_V2, 5L, 1, Seq(Seq(w.vLong(1))))
    val off2 = w.rows(12L, WRITE_ROWS_V2, 5L, 1, Seq(Seq(w.vLong(2))))
    val p = writeTmp(w.bytes)
    val factory = new CdcReaderFactory(
      mkReader = ip => new BinaryBinlogReader(ip.file, ip.fromByte, ip.untilByte))
    // two splits cut between the two rows events: each event emitted exactly once
    val cut = off2
    val got = Seq((0L, cut), (cut, Long.MaxValue)).flatMap { case (lo, hi) =>
      val r = factory.createReader(CdcInputPartition(p.toString, lo, hi, 1000L, None))
      val buf = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      while (r.next()) { val row = r.get(); buf += ((row.getLong(2), row.getString(3))) }
      r.close(); buf
    }
    assert(got.map(_._1) === Seq(1000L + off1, 1000L + off2),
      "pos = globalBase + event offset; each event owned by exactly one split")
    assert(got.map(_._2).distinct === Seq("d.t"))
  }

  test("ROWS_QUERY provenance: attached rows lines carry the original SQL " +
    "for every rows event of the statement, scope ends at XID, and the " +
    "default decoder's stream is unchanged") {
    val sql = "INSERT INTO orders SELECT * FROM staging WHERE day = '2024-01-01'"
    def fixture(): BinlogFixtureWriter = {
      val w = new BinlogFixtureWriter(checksum = true) // CRC strip must precede the text parse
      w.fde()
      val cols = Seq(TYPE_LONG -> w.mNone)
      w.query(9L, "shop", "BEGIN")
      w.rowsQuery(10L, sql)
      w.tableMap(10L, 7L, "shop", "orders", cols)
      w.rows(11L, WRITE_ROWS_V2, 7L, 1, Seq(Seq(w.vLong(1))))
      w.rows(12L, WRITE_ROWS_V2, 7L, 1, Seq(Seq(w.vLong(2)))) // split statement: 2nd event, same SQL
      w.xid(13L, 1L)
      w.tableMap(14L, 7L, "shop", "orders", cols)
      w.rows(15L, WRITE_ROWS_V2, 7L, 1, Seq(Seq(w.vLong(3)))) // next txn logged without ROWS_QUERY
      w
    }
    val p = writeTmp(fixture().bytes)
    val att = {
      val r = new BinaryBinlogReader(p.toString, 0L, Long.MaxValue, 0L, attachRowsQuery = true)
      try Iterator.continually(r.nextLine()).takeWhile(_ != null).toList finally r.close()
    }
    assert(att.size === 3)
    assert(att(0)._2.contains("\"query\":\"" + BinlogWire.jsonEscape(sql) + "\"") &&
      att(1)._2.contains("\"query\":\"" + BinlogWire.jsonEscape(sql) + "\""),
      s"both rows events of the statement must carry the SQL:\n${att.map(_._2)}")
    assert(!att(2)._2.contains("\"query\""),
      "the post-XID statement has no pending ROWS_QUERY and must not inherit one")
    // default decoder: lines identical except the absent query field
    val off = readAll(p)
    assert(off.size === 3 && off.forall(!_._2.contains("\"query\"")))
    assert(off.map(l => rowsOf(l._2)) === att.map(l => rowsOf(l._2)),
      "attaching provenance must not perturb the decoded row images")
  }
}
