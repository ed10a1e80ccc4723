package graft.source

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Scripted MySQL server: speaks just enough of the public client/server
  * protocol to exercise [[ReplicationClient]] offline — handshake v10 with a
  * FIXED nonce, mysql_native_password verification, OK/ERR, text resultsets
  * for SHOW BINARY LOGS, COM_REGISTER_SLAVE, and COM_BINLOG_DUMP serving
  * crafted [[BinlogFixtureWriter]] bytes (FORMAT_DESCRIPTION always re-sent,
  * then events from the requested position — real-server dump semantics).
  * The same offline-stub trick as KafkaWireSpec's broker. */
final class StubMysqlServer(password: String, authSwitch: Boolean = false)
    extends AutoCloseable {
  import MysqlWire._

  /** Fixed nonce so the auth token is a golden value: bytes 0x01..0x14. */
  val nonce: Array[Byte] = Array.tabulate(20)(i => (i + 1).toByte)
  /** Second nonce for the AuthSwitchRequest path (MySQL 8 servers whose
    * default plugin differs re-challenge with fresh auth data). */
  val nonce2: Array[Byte] = Array.tabulate(20)(i => (41 + i).toByte)
  /** Binlog "files" (name → full fixture bytes incl. magic); test-mutable —
    * grow the last one / append files to simulate writes and rotation. */
  @volatile var files: Seq[(String, Array[Byte])] = Nil
  /** When set, a dump sends its first event then closes the socket WITHOUT
    * the EOF packet — a network drop / killed dump thread. */
  @volatile var truncateDump: Boolean = false
  /** Server-side table catalog for SHOW DATABASES/TABLES/FULL COLUMNS:
    * (db, table) → (columnName, columnType) in order. */
  @volatile var schemas: Map[(String, String), Seq[(String, String)]] = Map.empty
  val dumpRequests = new java.util.concurrent.CopyOnWriteArrayList[(String, Long)]()
  val registeredServerIds = new java.util.concurrent.CopyOnWriteArrayList[Long]()

  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  @volatile private var running = true
  private val thread = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        try serve(s) catch { case _: Exception => () } finally s.close()
      } catch { case _: Exception => () }
    }
  }, "stub-mysql")
  thread.setDaemon(true)
  thread.start()

  private def ok: Array[Byte] = Array[Byte](0, 0, 0, 2, 0, 0, 0)
  private def eofPkt: Array[Byte] = Array[Byte](0xfe.toByte, 0, 0, 2, 0)
  private def errPkt(code: Int, msg: String): Array[Byte] =
    Array(0xff.toByte) ++ le(code, 2) ++ "#HY000".getBytes(UTF_8) ++ msg.getBytes(UTF_8)
  private def lenencStr(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8); require(b.length < 251); Array(b.length.toByte) ++ b
  }

  private def serve(s: Socket): Unit = {
    s.setSoTimeout(20000)
    val in = new BufferedInputStream(s.getInputStream)
    val out = new BufferedOutputStream(s.getOutputStream)

    // ---- initial handshake v10
    val hs = new java.io.ByteArrayOutputStream()
    hs.write(10)
    hs.write("5.7.44-stub".getBytes(UTF_8)); hs.write(0)
    hs.write(le(1, 4))           // thread id
    hs.write(nonce, 0, 8)        // auth-plugin-data part 1
    hs.write(0)                  // filler
    hs.write(le(0x8203, 2))      // caps low: LONG_PASSWORD | PROTOCOL_41 | SECURE
    hs.write(33)                 // charset
    hs.write(le(2, 2))           // status
    hs.write(le(0x0008, 2))      // caps high: PLUGIN_AUTH (0x80000 >> 16)
    hs.write(21)                 // auth data len
    hs.write(new Array[Byte](10))
    hs.write(nonce, 8, 12); hs.write(0) // part 2 (13 bytes incl. trailing NUL)
    hs.write("mysql_native_password".getBytes(UTF_8)); hs.write(0)
    writePacket(out, 0, hs.toByteArray)

    // ---- HandshakeResponse41: verify user's auth token
    val (seq, resp) = readPacket(in)
    var at = 4 + 4 + 1 + 23
    val userStart = at
    while (resp(at) != 0) at += 1
    at += 1
    val authLen = resp(at) & 0xff; at += 1
    val token = java.util.Arrays.copyOfRange(resp, at, at + authLen)
    if (authSwitch) {
      // re-challenge with fresh auth data, like a server whose default
      // plugin differs from the account's
      writePacket(out, seq + 1,
        Array(0xfe.toByte) ++ "mysql_native_password".getBytes(UTF_8) ++
          Array(0.toByte) ++ nonce2 ++ Array(0.toByte))
      val (seq2, switched) = readPacket(in)
      val expected2 = nativePasswordScramble(password, nonce2)
      if (!java.util.Arrays.equals(switched, expected2)) {
        writePacket(out, seq2 + 1, errPkt(1045, "Access denied"))
        return
      }
      writePacket(out, seq2 + 1, ok)
    } else {
      val expected = nativePasswordScramble(password, nonce)
      if (!java.util.Arrays.equals(token, expected)) {
        writePacket(out, seq + 1, errPkt(1045, "Access denied"))
        return
      }
      writePacket(out, seq + 1, ok)
    }

    // ---- command loop
    while (true) {
      val pkt = readPacket(in)
      if (pkt == null) return
      val p = pkt._2
      (p(0) & 0xff) match {
        case COM_QUIT => return
        case COM_QUERY =>
          val sql = new String(p, 1, p.length - 1, UTF_8)
          var sq = 1
          def send(b: Array[Byte]): Unit = { writePacket(out, sq, b); sq += 1 }
          def resultset(cols: Seq[String], rows: Seq[Seq[String]]): Unit = {
            send(Array(cols.size.toByte))
            cols.foreach(c => send(lenencStr(c)))
            send(eofPkt)
            rows.foreach(r => send(r.map(lenencStr).reduce(_ ++ _)))
            send(eofPkt)
          }
          val up = sql.toUpperCase
          val colRe = """(?i)SHOW\s+FULL\s+COLUMNS\s+FROM\s+`?([\w$]+)`?\.`?([\w$]+)`?""".r
          val tblRe = """(?i)SHOW\s+TABLES\s+FROM\s+`?([\w$]+)`?""".r
          if (up.contains("SHOW BINARY LOGS"))
            resultset(Seq("Log_name", "File_size"),
              files.map { case (n, b) => Seq(n, b.length.toString) })
          else if (up.startsWith("SHOW DATABASES"))
            resultset(Seq("Database"),
              (schemas.keys.map(_._1).toSeq.distinct.sorted ++
                Seq("mysql", "information_schema")).map(Seq(_)))
          else tblRe.findFirstMatchIn(sql) match {
            case Some(m) if up.contains("SHOW TABLES") =>
              resultset(Seq(s"Tables_in_${m.group(1)}"),
                schemas.keys.filter(_._1 == m.group(1)).map(_._2).toSeq.sorted.map(Seq(_)))
            case _ => colRe.findFirstMatchIn(sql) match {
              case Some(m) =>
                // real servers send 9 columns; the client reads the first two
                resultset(Seq("Field", "Type", "Collation", "Null", "Key",
                  "Default", "Extra", "Privileges", "Comment"),
                  schemas.getOrElse((m.group(1), m.group(2)), Nil).map { case (n, t) =>
                    Seq(n, t, "", "YES", "", "", "", "", "")
                  })
              case None => writePacket(out, 1, ok)
            }
          }
        case COM_REGISTER_SLAVE =>
          registeredServerIds.add(leAt(p, 1, 4))
          writePacket(out, 1, ok)
        case COM_BINLOG_DUMP =>
          val pos = leAt(p, 1, 4)
          val fname = new String(p, 11, p.length - 11, UTF_8)
          dumpRequests.add((fname, pos))
          var sq = 1
          files.find(_._1 == fname) match {
            case None => writePacket(out, sq, errPkt(1236, s"no such binlog: $fname"))
            case Some((_, bytes)) =>
              // real dump semantics: FORMAT_DESCRIPTION re-sent regardless of
              // pos; other events sent when their start ≥ pos
              var o = 4
              var sent = 0
              while (o + 19 <= bytes.length) {
                val size = leAt(bytes, o + 9, 4).toInt
                val etype = bytes(o + 4) & 0xff
                if (etype == BinlogWire.FORMAT_DESCRIPTION_EVENT || o >= pos) {
                  writePacket(out, sq,
                    Array(0.toByte) ++ java.util.Arrays.copyOfRange(bytes, o, o + size))
                  sq += 1; sent += 1
                  if (truncateDump && sent >= 2) return // drop: no EOF packet
                }
                o += size
              }
              writePacket(out, sq, eofPkt) // BINLOG_DUMP_NON_BLOCK end
          }
        case _ => writePacket(out, 1, errPkt(1047, "unknown command"))
      }
    }
  }

  override def close(): Unit = { running = false; server.close() }
}

/** The live replication-protocol slice of S1: handshake + auth +
  * COM_REGISTER_SLAVE + COM_BINLOG_DUMP against a scripted stub server,
  * the socket reader's drop-in equivalence with the file reader, and the
  * DSv2 stream end-to-end (envelopes, checkpoint resume, rotation).
  * Reference semantics: `/root/reference/src/library/binlog/handler.go:58-71`
  * (canal → go-mysql syncer). */
class ReplicationSpec extends SparkSpec {

  private def tmp(): Path = Files.createTempDirectory("graft_repl")

  /** A small fixture: FDE + one mapped table + inserts/update + an ALTER. */
  private def fixture(): BinlogFixtureWriter = {
    import BinlogWire._
    val w = new BinlogFixtureWriter(checksum = true)
    w.fde()
    w.tableMap(10L, 5L, "shop", "user",
      Seq(TYPE_LONG -> w.mNone, TYPE_VARCHAR -> w.mLe2(40)))
    w.rows(10L, WRITE_ROWS_V2, 5L, 2, Seq(Seq(w.vLong(1), w.vVarchar("ann", 40))))
    w.rows(11L, WRITE_ROWS_V2, 5L, 2, Seq(
      Seq(w.vLong(2), w.vVarchar("bob", 40)), Seq(w.vLong(3), w.vVarchar("cal", 40))))
    w.query(12L, "shop", "ALTER TABLE shop.user ADD COLUMN age int")
    w
  }

  test("mysql_native_password matches the externally computed golden token") {
    // golden value computed independently (python hashlib) for password
    // "secret-pw" and nonce 0x01..0x14
    val nonce = Array.tabulate(20)(i => (i + 1).toByte)
    val got = MysqlWire.nativePasswordScramble("secret-pw", nonce)
      .map(b => f"${b & 0xff}%02x").mkString
    assert(got === "1e58b73f68d9dafb7b3e186a5419a21c9e153b15")
    assert(MysqlWire.nativePasswordScramble("", nonce).isEmpty, "empty password -> empty token")
  }

  test("client handshake: auth accepted, SHOW BINARY LOGS parsed, slave registered") {
    val stub = new StubMysqlServer("secret-pw")
    try {
      stub.files = Seq(("binlog.000001", fixture().bytes))
      val c = new ReplicationClient("127.0.0.1", stub.port, "repl", "secret-pw", 6402L)
      try {
        c.connect()
        assert(c.binaryLogs() === Seq(("binlog.000001", stub.files.head._2.length.toLong)))
        c.registerSlave()
        assert(stub.registeredServerIds.size === 1 && stub.registeredServerIds.get(0) === 6402L)
      } finally c.close()
    } finally stub.close()
  }

  test("AuthSwitchRequest: client re-scrambles against the fresh nonce (MySQL 8 path)") {
    val stub = new StubMysqlServer("secret-pw", authSwitch = true)
    try {
      stub.files = Seq(("binlog.000001", fixture().bytes))
      val c = new ReplicationClient("127.0.0.1", stub.port, "repl", "secret-pw", 7L)
      try {
        c.connect() // fails unless the switched token verifies against nonce2
        assert(c.binaryLogs().nonEmpty, "post-switch session is fully usable")
      } finally c.close()
      // and a wrong password still fails through the switch path
      val bad = new ReplicationClient("127.0.0.1", stub.port, "repl", "nope", 7L)
      val e = intercept[java.io.IOException] { bad.connect() }
      assert(e.getMessage.contains("auth failed"))
      bad.close()
    } finally stub.close()
  }

  test("wrong password is rejected by the server's verification, loudly") {
    val stub = new StubMysqlServer("secret-pw")
    try {
      val c = new ReplicationClient("127.0.0.1", stub.port, "repl", "wrong", 1L)
      val e = intercept[java.io.IOException] { c.connect() }
      assert(e.getMessage.contains("auth failed") && e.getMessage.contains("Access denied"))
      c.close()
    } finally stub.close()
  }

  test("socket reader is a drop-in for the file reader: identical (pos, line) stream") {
    val w = fixture()
    val dir = tmp()
    Files.write(dir.resolve("binlog.000001"), w.bytes)
    val fromFile = {
      val r = new BinaryBinlogReader(dir.resolve("binlog.000001").toString, 0L, Long.MaxValue)
      try Iterator.continually(r.nextLine()).takeWhile(_ != null).toList finally r.close()
    }
    val stub = new StubMysqlServer("pw")
    try {
      stub.files = Seq(("binlog.000001", w.bytes))
      val r = new ReplicationBinlogReader("127.0.0.1", stub.port, "repl", "pw", 6402L,
        "binlog.000001", 0L, Long.MaxValue)
      val fromWire =
        try Iterator.continually(r.nextLine()).takeWhile(_ != null).toList finally r.close()
      assert(fromWire === fromFile, "replication stream must equal the file parse exactly")
      assert(fromFile.size === 3, "two row statements + one alter")
    } finally stub.close()
  }

  test("reader stops at a real ROTATE: next file's events never leak into the partition") {
    import BinlogWire._
    // A real server's non-blocking dump streams PAST the rotation: rotate
    // event, then the next file's events with log_pos restarting small —
    // values that pass an untilByte check. Emulate that wire stream and
    // assert the reader stops at its file's boundary.
    val w = fixture()
    val fileEnd = w.bytes.length.toLong
    w.event(999L, ROTATE_EVENT,
      MysqlWire.le(4L, 8) ++ "binlog.000002".getBytes(UTF_8)) // real rotate: log_pos > 0
    val w2 = new BinlogFixtureWriter(checksum = true)
    w2.fde()
    w2.tableMap(30L, 7L, "shop", "order", Seq(TYPE_LONG -> w2.mNone))
    w2.rows(30L, WRITE_ROWS_V2, 7L, 1, Seq(Seq(w2.vLong(77))))
    val wire = w.bytes ++ w2.bytes.drop(4) // drop file2's magic: one dump stream
    val stub = new StubMysqlServer("pw")
    try {
      stub.files = Seq(("binlog.000001", wire))
      val r = new ReplicationBinlogReader("127.0.0.1", stub.port, "repl", "pw", 6402L,
        "binlog.000001", 0L, fileEnd)
      val got = try Iterator.continually(r.nextLine()).takeWhile(_ != null).toList
        finally r.close()
      assert(got.size === 3, s"exactly file 1's statements: $got")
      assert(!got.exists(_._2.contains("\"77\"")),
        "file 2's row leaked into file 1's partition")
      assert(got.forall(_._1 < fileEnd))
    } finally stub.close()
  }

  test("binaryLogs sorts by numeric suffix across a digit-length rollover") {
    val stub = new StubMysqlServer("pw")
    try {
      // lexicographic order would put 1000000 FIRST; numeric order must win
      stub.files = Seq(("binlog.1000000", Array[Byte](1)), ("binlog.999999", Array[Byte](1, 2)))
      val c = new ReplicationClient("127.0.0.1", stub.port, "repl", "pw", 1L)
      try {
        c.connect()
        assert(c.binaryLogs().map(_._1) === Seq("binlog.999999", "binlog.1000000"))
      } finally c.close()
    } finally stub.close()
  }

  test("DSv2 replication stream: checkpoint resume dumps from the committed offset; " +
    "rotation continues the global sequence") {
    import BinlogWire._
    val stub = new StubMysqlServer("pw")
    val (cp, out) = (tmp(), tmp())
    try {
      val w = fixture()
      stub.files = Seq(("binlog.000001", w.bytes))
      val sizeAfterBatch1 = w.bytes.length.toLong

      def drain(): Seq[(Long, String)] = {
        val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
        val q = spark.readStream.format("graft-cdc")
          .option("wireFormat", "replication")
          .option("host", "127.0.0.1").option("port", stub.port.toString)
          .option("user", "repl").option("password", "pw")
          .load()
          .writeStream
          .option("checkpointLocation", cp.toString)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            rows ++= batch.collect().map(r => (r.getLong(2), r.getString(0))); ()
          }
          .start()
        val finished = q.awaitTermination(120000)
        assert(finished, s"stream did not drain: exception=${q.exception}, " +
          s"dumps=${stub.dumpRequests}")
        rows.toSeq.sortBy(_._1)
      }

      val first = drain()
      assert(first.size === 3, s"fixture statements: $first")
      assert(first.map(_._1) === first.map(_._1).sorted)

      // grow the active file AND rotate to a second one
      w.tableMap(20L, 5L, "shop", "user",
        Seq(TYPE_LONG -> w.mNone, TYPE_VARCHAR -> w.mLe2(40)))
      w.rows(20L, WRITE_ROWS_V2, 5L, 2, Seq(Seq(w.vLong(9), w.vVarchar("dee", 40))))
      val w2 = new BinlogFixtureWriter(checksum = true)
      w2.fde()
      w2.tableMap(30L, 7L, "shop", "order",
        Seq(TYPE_LONG -> w.mNone))
      w2.rows(30L, WRITE_ROWS_V2, 7L, 1, Seq(Seq(w.vLong(77))))
      stub.files = Seq(("binlog.000001", w.bytes), ("binlog.000002", w2.bytes))

      val second = drain()
      assert(second.size === 2, s"only the new statements: $second")
      assert(second.exists(_._2.contains("\"dee\"")) && second.exists(_._2.contains("\"77\"")))
      // global positions continue ACROSS the rotation, strictly after batch 1
      assert(second.forall(_._1 >= sizeAfterBatch1))
      // the resumed dump asked the server for the COMMITTED position, not 4:
      // one request per (batch, file). Batch 2's two partitions run
      // CONCURRENTLY on local[32], so compare arrival-order-insensitively.
      val reqs = {
        import scala.jdk.CollectionConverters._
        stub.dumpRequests.asScala.toSeq
      }
      assert(reqs.size === 3, s"initial + resume + rotated file: $reqs")
      assert(reqs.head === (("binlog.000001", 4L)), "first batch dumps from the start")
      assert(reqs.tail.contains(("binlog.000001", sizeAfterBatch1)),
        s"resume must COM_BINLOG_DUMP from the checkpointed offset: $reqs")
      assert(reqs.tail.exists(r => r._1 == "binlog.000002" && r._2 <= 4),
        s"rotated file starts from its beginning: $reqs")
    } finally stub.close()
  }

  test("ReplOffset json roundtrip pins the file-size sequence") {
    val o = ReplOffset(352L, Seq(("binlog.000001", 352L), ("binlog.000002", 180L)))
    assert(ReplOffset.parse(o.json()) === o)
    // legacy bare-pos offsets still parse (no pinned sizes)
    assert(ReplOffset.parse("""{"pos":42}""") === ReplOffset(42L, Nil))
  }

  test("abrupt socket close mid-dump throws, never truncates the partition silently") {
    val stub = new StubMysqlServer("pw")
    try {
      stub.files = Seq(("binlog.000001", fixture().bytes))
      stub.truncateDump = true
      val r = new ReplicationBinlogReader("127.0.0.1", stub.port, "repl", "pw", 6402L,
        "binlog.000001", 0L, Long.MaxValue)
      val e = intercept[java.io.EOFException] {
        Iterator.continually(r.nextLine()).takeWhile(_ != null).toList
      }
      assert(e.getMessage.contains("closed mid-dump"),
        "a dump ending without the protocol EOF packet must fail the task")
      r.close()
    } finally stub.close()
  }

  test("restart after the server purges binlogs: pinned sizes keep positions stable") {
    import BinlogWire._
    val stub = new StubMysqlServer("pw")
    val (cp, out) = (tmp(), tmp())
    try {
      val w = fixture()
      stub.files = Seq(("binlog.000001", w.bytes))
      val size1 = w.bytes.length.toLong

      def drain(): Seq[(Long, String)] = {
        val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
        val q = spark.readStream.format("graft-cdc")
          .option("wireFormat", "replication")
          .option("host", "127.0.0.1").option("port", stub.port.toString)
          .option("user", "repl").option("password", "pw")
          .load()
          .writeStream
          .option("checkpointLocation", cp.toString)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            rows ++= batch.collect().map(r => (r.getLong(2), r.getString(0))); ()
          }
          .start()
        assert(q.awaitTermination(120000), s"stream did not drain: ${q.exception}")
        rows.toSeq.sortBy(_._1)
      }

      assert(drain().size === 3)

      // the server PURGES file 1 (expire_logs) and has rotated to file 2:
      // the post-purge listing no longer contains the bytes the checkpoint
      // position was measured against
      val w2 = new BinlogFixtureWriter(checksum = true)
      w2.fde()
      w2.tableMap(30L, 7L, "shop", "order", Seq(TYPE_LONG -> w2.mNone))
      w2.rows(30L, WRITE_ROWS_V2, 7L, 1, Seq(Seq(w2.vLong(77))))
      w2.rows(31L, WRITE_ROWS_V2, 7L, 1, Seq(Seq(w2.vLong(78))))
      stub.files = Seq(("binlog.000002", w2.bytes))

      val second = drain()
      assert(second.size === 2, s"exactly file 2's statements, no skip/dup: $second")
      assert(second.exists(_._2.contains("\"77\"")) && second.exists(_._2.contains("\"78\"")))
      // positions continue past the purged file's recorded size: the global
      // sequence did not re-anchor to the post-purge listing
      assert(second.forall(_._1 >= size1),
        s"purge must not re-anchor global positions: $second (size1=$size1)")
    } finally stub.close()
  }

  test("schema bootstrap: SHOW DATABASES/TABLES/FULL COLUMNS -> registered metas") {
    val stub = new StubMysqlServer("pw")
    try {
      stub.schemas = Map(
        ("shop", "user") -> Seq(("id", "int(11)"), ("flag", "enum('a','b,c')"),
          ("n", "bigint(20) unsigned")),
        ("shop", "order") -> Seq(("oid", "int(11)")),
        ("other", "t") -> Seq(("x", "varchar(8)")))
      val reg = new graft.cdc.SchemaRegistry
      val c = new ReplicationClient("127.0.0.1", stub.port, "repl", "pw", 1L)
      try {
        c.connect()
        val got = SchemaBootstrap.fromServer(c, reg)
        assert(got.toSet === Set(("shop", "user"), ("shop", "order"), ("other", "t")),
          "system databases excluded, everything else registered")
      } finally c.close()
      val user = reg.schemaAt("shop", "user", 0L).get.cols
      assert(user.map(_.name) === Seq("id", "flag", "n"))
      assert(user(1).enumValues === Seq("a", "b,c"), "enum values parsed from Type")
      assert(user(2).unsigned, "unsigned marker parsed from Type")
    } finally stub.close()
  }

  test("zero-config capstone: engine bootstraps schemas from the server like canal") {
    // No manual register() call anywhere — the reference's usage model.
    val stub = new StubMysqlServer("pw")
    val (cp, out) = (tmp(), tmp())
    try {
      stub.files = Seq(("binlog.000001", fixture().bytes))
      stub.schemas = Map(("shop", "user") -> Seq(("id", "int(11)"), ("name", "varchar(40)")))
      val handle = graft.app.Engine.start(spark, graft.app.Engine.Config(
        inputDir = "(unused-in-replication-mode)",
        checkpointDir = cp.toString,
        posFile = s"$out/pos.bin",
        sinks = Seq(graft.streaming.CdcStream.SinkConfig("all", s"$out/all")),
        useDsv2Source = true,
        wireFormat = Some("replication"),
        sourceOptions = Map("host" -> "127.0.0.1", "port" -> stub.port.toString,
          "user" -> "repl", "password" -> "pw"),
        schemaRegistry = Some(new graft.cdc.SchemaRegistry))) // EMPTY registry
      try {
        assert(handle.awaitTermination(120000))
        val lines = readSinkLines(s"$out/all")
        assert(lines.size === 4, s"3 row envelopes + 1 alter: $lines")
        assert(lines.exists(_.contains("""{"data":{"id":1,"name":"ann"}}""")),
          "rows decode under the SERVER-fetched schema")
      } finally handle.stop()
    } finally stub.close()
  }

  test("capstone: live replication socket -> DSv2 -> drift decode -> envelopes") {
    // the full reference pipeline (handler.go:58-71): connect as a replica,
    // dump the binlog, decode row images under schema drift, emit envelopes
    val stub = new StubMysqlServer("pw")
    val (cp, out) = (tmp(), tmp())
    try {
      stub.files = Seq(("binlog.000001", fixture().bytes))
      val reg = new graft.cdc.SchemaRegistry
      reg.register("shop", "user", Seq(
        graft.cdc.Decode.ColMeta("id", "int(11)"),
        graft.cdc.Decode.ColMeta("name", "varchar(40)")))
      val handle = graft.app.Engine.start(spark, graft.app.Engine.Config(
        inputDir = "(unused-in-replication-mode)",
        checkpointDir = cp.toString,
        posFile = s"$out/pos.bin",
        sinks = Seq(graft.streaming.CdcStream.SinkConfig("all", s"$out/all")),
        useDsv2Source = true,
        wireFormat = Some("replication"),
        sourceOptions = Map("host" -> "127.0.0.1", "port" -> stub.port.toString,
          "user" -> "repl", "password" -> "pw"),
        schemaRegistry = Some(reg)))
      try {
        assert(handle.awaitTermination(120000))
        val lines = readSinkLines(s"$out/all")
        assert(lines.size === 4, s"3 row envelopes + 1 alter: $lines")
        assert(lines.exists(_.contains("""{"data":{"id":1,"name":"ann"}}""")))
        assert(lines.exists(l => l.contains("\"event_type\":\"alter\"") && !l.contains("\"event\":")))
      } finally handle.stop()
    } finally stub.close()
  }

  private def readSinkLines(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!Files.exists(p)) return Nil
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".txt") && Files.isRegularFile(f))
      .flatMap(f => Files.readAllLines(f).asScala).toSeq
  }
}
