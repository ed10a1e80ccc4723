package graft.streaming

import java.net.Socket
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Wire-level sink tests: TCP pub/sub with SET_PRO registration over real
  * sockets, HTTP POST fan-out against a live server, RESP RPUSH against a
  * fake Redis, control-plane stop/reload/members, frame-codec parity. */
class SinksSpec extends SparkSpec {

  private def envBatch = {
    import spark.implicits._
    Seq(
      ("test.city", """{"database":"test","table":"city","n":1}"""),
      ("shop.orders", """{"database":"shop","table":"orders","n":2}"""),
      ("test.user", """{"database":"test","table":"user","n":3}"""))
      .toDF("topic", "envelope")
  }

  test("frame codec: pack/unpack roundtrip + chunked reassembly (P1)") {
    val f = Frame.pack(Frame.CMD_EVENT, "hello 世界")
    val up = Frame.unpack(f)
    assert(up.exists { case (c, b) => c == Frame.CMD_EVENT && new String(b, "UTF-8") == "hello 世界" })
    // chunked: two frames split at awkward boundaries
    val two = Frame.pack(Frame.CMD_TICK, "ok") ++ Frame.pack(Frame.CMD_EVENT, "x")
    val re = new Frame.Reassembler
    val got = re.feed(two.take(3)) ++ re.feed(two.slice(3, 9)) ++ re.feed(two.drop(9))
    assert(got.map(_._1) === Seq(Frame.CMD_TICK, Frame.CMD_EVENT))
    assert(got.map(g => new String(g._2, "UTF-8")) === Seq("ok", "x"))
    // malformed length prefixes fail loudly instead of desynchronizing the
    // stream (clen < 2 would end a "frame" inside the 6-byte header)
    intercept[IllegalArgumentException] {
      new Frame.Reassembler().feed(Array[Byte](1, 0, 0, 0, 9, 9))
    }
    intercept[IllegalArgumentException] {
      Frame.unpack(Array[Byte](0, 0, 0, 0x80.toByte, 0, 0)) // negative length
    }
    // clen in [Int.MaxValue-3, Int.MaxValue] overflows `clen + 4` to
    // negative, which once returned a bogus "complete" frame with an empty
    // payload (and a negative-count buffer remove) instead of failing
    intercept[IllegalArgumentException] {
      Frame.unpack(Array[Byte](0xfd.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte, 9, 9))
    }
    intercept[IllegalArgumentException] {
      new Frame.Reassembler().feed(
        Array[Byte](0xfd.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte, 9, 9))
    }
  }

  test("kafka sink frame: key = database.table bytes, value = envelope, fixed topic (K4)") {
    val f = envBatch.transform(KafkaSink.frame("wing"))
    assert(f.schema.map(s => (s.name, s.dataType.simpleString)) ===
      Seq(("key", "binary"), ("value", "binary"), ("topic", "string")))
    val rows = f.collect().map(r =>
      (new String(r.getAs[Array[Byte]]("key"), "UTF-8"),
        new String(r.getAs[Array[Byte]]("value"), "UTF-8"), r.getString(2)))
    assert(rows.map(_._3).toSet === Set("wing"))
    assert(rows.map(_._1).toSet === Set("test.city", "shop.orders", "test.user"))
    val opts = KafkaSink.producerOptions("broker:9092")
    assert(opts("kafka.compression.type") === "snappy" && opts("kafka.linger.ms") === "500")
  }

  test("TCP pub/sub: SET_PRO registration, filtered delivery, tick (K1/R2/R3)") {
    val svc = new TcpPubSubService()
    try {
      // Subscriber interested in test.* only
      val sock = new Socket("127.0.0.1", svc.boundPort)
      val out = sock.getOutputStream
      out.write(Frame.pack(Frame.CMD_SET_PRO, Array(Frame.FlagSetPro) ++ " Test\\..* ".getBytes("UTF-8")))
      out.flush()
      val re = new Frame.Reassembler
      val buf = new Array[Byte](1024)
      def readFrames(n: Int): Seq[(Int, String)] = {
        val acc = scala.collection.mutable.ArrayBuffer[(Int, String)]()
        val deadline = System.currentTimeMillis() + 10000
        while (acc.size < n && System.currentTimeMillis() < deadline) {
          val r = sock.getInputStream.read(buf)
          if (r > 0) acc ++= re.feed(buf, r).map { case (c, b) => (c, new String(b, "UTF-8")) }
        }
        acc.toSeq
      }
      assert(readFrames(1) === Seq((Frame.CMD_SET_PRO, "ok")))   // registration ack
      // Publish three envelopes; only test.* should arrive. Server keepalive
      // ticks may interleave — read until two EVENT frames, ignoring ticks.
      Thread.sleep(100)
      envBatch.collect().foreach(r => svc.sendAll(r.getString(0), r.getString(1)))
      val events = {
        val acc = scala.collection.mutable.ArrayBuffer[(Int, String)]()
        while (acc.size < 2) acc ++= readFrames(1).filter(_._1 == Frame.CMD_EVENT)
        acc.toSeq
      }
      assert(events.map(_._1).forall(_ == Frame.CMD_EVENT))
      assert(events.map(_._2).forall(_.contains("\"database\":\"test\"")))
      // keepalive
      out.write(Frame.pack(Frame.CMD_TICK, "")); out.flush()
      assert(readFrames(1) === Seq((Frame.CMD_TICK, "ok")))
      sock.close()
    } finally svc.stop()
  }

  test("HTTP sink: per-group filters, envelopes POSTed to a live server (K2)") {
    val received = new ConcurrentHashMap[String, java.util.List[String]]().asScala
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    Seq("/a", "/b").foreach { path =>
      received(path) = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        received(path).add(body)
        ex.sendResponseHeaders(200, 0)
        ex.close()
      })
    }
    server.start()
    val port = server.getAddress.getPort
    try {
      HttpSink.sendBatch(envBatch, Seq(
        HttpSink.HttpGroup(Seq(s"http://127.0.0.1:$port/a"), Seq("test\\.")),
        HttpSink.HttpGroup(Seq(s"http://127.0.0.1:$port/b"))))
      assert(received("/a").asScala.toSet.size === 2)
      assert(received("/a").asScala.forall(_.contains("\"database\":\"test\"")))
      assert(received("/b").asScala.size === 3)
    } finally server.stop(0)
  }

  test("Redis sink: RESP RPUSH into a list on a fake server (K3)") {
    val lists = new ConcurrentHashMap[String, java.util.List[String]]().asScala
    val server = new java.net.ServerSocket(0, 16, java.net.InetAddress.getByName("127.0.0.1"))
    val acceptor = new Thread(() => {
      try while (true) {
        val s = server.accept()
        new Thread(() => {
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(s.getInputStream))
          val out = s.getOutputStream
          try while (true) {
            val head = in.readLine(); if (head == null) throw new java.io.EOFException
            assert(head.startsWith("*"))
            val nArgs = head.drop(1).toInt
            val args = (0 until nArgs).map { _ => in.readLine(); in.readLine() }
            assert(args.head.equalsIgnoreCase("RPUSH"))
            lists.getOrElseUpdate(args(1),
              java.util.Collections.synchronizedList(new java.util.ArrayList[String]())).add(args(2))
            out.write(s":${lists(args(1)).size}\r\n".getBytes); out.flush()
          } catch { case _: Throwable => scala.util.Try(s.close()) }
        }).start()
      } catch { case _: Throwable => () }
    })
    acceptor.setDaemon(true); acceptor.start()
    try {
      RedisSink.sendBatch(envBatch, "127.0.0.1", server.getLocalPort, "wing", Seq("test\\."))
      assert(lists("wing").asScala.toSet.size === 2)
      assert(lists("wing").asScala.forall(_.contains("\"database\":\"test\"")))
    } finally server.close()
  }

  test("control service: stop/reload/members over the wire (P2)") {
    val stopped = new CountDownLatch(1)
    val reloaded = new ConcurrentHashMap[String, Boolean]()
    val ctl = new ControlService(0,
      onStop = () => stopped.countDown(),
      onReload = name => reloaded.put(name, true),
      members = () => "queries: 2 active")
    try {
      assert(ControlClient.showMembers(ctl.boundPort) === "queries: 2 active")
      assert(ControlClient.reload(ctl.boundPort, "subscribe") === "ok")
      assert(reloaded.containsKey("subscribe"))
      assert(ControlClient.stop(ctl.boundPort) === "ok")
      assert(stopped.await(5, TimeUnit.SECONDS))
    } finally ctl.stop()
  }
}
