package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.zip.CRC32C

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A stub Kafka broker: accepts real wire-protocol connections, decodes
  * ApiVersions v0 and Produce v3 — record batches v2 included (CRC32C check,
  * snappy decompression, varint/zigzag records) — and answers with valid
  * responses. The decoder is written independently of [[KafkaWire]]'s
  * encoder, so the spec proves the bytes, not the code agreeing with
  * itself. */
final class KafkaStubBroker(numPartitions: Int = 1) {
  final case class Batch(topic: String, partition: Int, codec: Int, crcOk: Boolean,
                         records: Seq[(String, String)])
  val received = new ConcurrentLinkedQueue[Batch]()
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    try while (true) {
      val sock = server.accept()
      new Thread(() => handle(sock), "stub-broker-conn").start()
    } catch { case _: Throwable => () }
  }, "stub-broker-accept")
  acceptor.setDaemon(true); acceptor.start()

  private def readVarlong(in: DataInputStream): Long = {
    var v = 0L; var shift = 0; var b = 0
    do { b = in.readUnsignedByte(); v |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
    (v >>> 1) ^ -(v & 1) // zigzag decode
  }

  private def handle(sock: java.net.Socket): Unit = {
    val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream))
    try while (true) {
      val len = in.readInt()
      val frame = new Array[Byte](len); in.readFully(frame)
      val r = new DataInputStream(new ByteArrayInputStream(frame))
      val apiKey = r.readShort(); val apiVersion = r.readShort()
      val correlation = r.readInt()
      val cidLen = r.readShort(); if (cidLen > 0) r.skipBytes(cidLen)
      apiKey match {
        case 18 => // ApiVersions v0
          val resp = new ByteArrayOutputStream()
          val d = new DataOutputStream(resp)
          d.writeInt(correlation); d.writeShort(0)
          d.writeInt(1); d.writeShort(0); d.writeShort(0); d.writeShort(3)
          d.flush()
          out.writeInt(resp.size()); out.write(resp.toByteArray); out.flush()
        case 3 => // Metadata v0: echo every requested topic with our layout
          val nTopics = r.readInt()
          val topics = (0 until nTopics).map { _ =>
            val l = r.readShort(); val b = new Array[Byte](l); r.readFully(b)
            new String(b, StandardCharsets.UTF_8)
          }
          val resp = new ByteArrayOutputStream()
          val d = new DataOutputStream(resp)
          d.writeInt(correlation)
          d.writeInt(1) // one broker: ourselves
          d.writeInt(0); d.writeShort(9); d.writeBytes("127.0.0.1"); d.writeInt(port)
          d.writeInt(topics.size)
          topics.foreach { t =>
            d.writeShort(0) // topic error
            d.writeShort(t.length); d.writeBytes(t)
            d.writeInt(numPartitions)
            (0 until numPartitions).foreach { pid =>
              d.writeShort(0) // partition error
              d.writeInt(pid); d.writeInt(0) // leader: broker 0
              d.writeInt(1); d.writeInt(0)   // replicas [0]
              d.writeInt(1); d.writeInt(0)   // isr [0]
            }
          }
          d.flush()
          out.writeInt(resp.size()); out.write(resp.toByteArray); out.flush()
        case 0 => // Produce
          require(apiVersion == 3, s"stub expects Produce v3, got $apiVersion")
          val txnLen = r.readShort(); if (txnLen > 0) r.skipBytes(txnLen)
          val acks = r.readShort(); r.readInt() // timeout
          val nTopics = r.readInt()
          val resp = new ByteArrayOutputStream()
          val d = new DataOutputStream(resp)
          d.writeInt(correlation)
          d.writeInt(nTopics)
          (0 until nTopics).foreach { _ =>
            val tLen = r.readShort(); val tB = new Array[Byte](tLen); r.readFully(tB)
            val topic = new String(tB, StandardCharsets.UTF_8)
            val nParts = r.readInt()
            d.writeShort(tLen); d.write(tB)
            d.writeInt(nParts)
            (0 until nParts).foreach { _ =>
              val partition = r.readInt()
              val setSize = r.readInt()
              val set = new Array[Byte](setSize); r.readFully(set)
              received.add(decodeBatch(topic, partition, set))
              d.writeInt(partition); d.writeShort(0) // error NONE
              d.writeLong(received.size.toLong)      // base offset
              d.writeLong(-1L)                       // log append time
            }
          }
          d.writeInt(0) // throttle_time_ms
          d.flush()
          if (acks != 0) { out.writeInt(resp.size()); out.write(resp.toByteArray); out.flush() }
        case other => throw new IllegalStateException(s"stub broker: unexpected api key $other")
      }
    } catch { case _: java.io.EOFException | _: java.net.SocketException => () }
    finally sock.close()
  }

  private def decodeBatch(topic: String, partition: Int, set: Array[Byte]): Batch = {
    val r = new DataInputStream(new ByteArrayInputStream(set))
    r.readLong() // baseOffset
    r.readInt()  // batchLength
    r.readInt()  // partitionLeaderEpoch
    val magic = r.readByte(); require(magic == 2, s"expected message format v2, got $magic")
    val crcStored = r.readInt()
    val tail = new Array[Byte](set.length - 8 - 4 - 4 - 1 - 4); r.readFully(tail)
    val crc = new CRC32C(); crc.update(tail)
    val crcOk = crc.getValue.toInt == crcStored
    val t = new DataInputStream(new ByteArrayInputStream(tail))
    val attributes = t.readShort(); val codec = attributes & 7
    t.readInt() // lastOffsetDelta
    t.readLong(); t.readLong() // timestamps
    t.readLong(); t.readShort(); t.readInt() // producer id/epoch/base seq
    val n = t.readInt()
    val recordsBytes = new Array[Byte](tail.length - 2 - 4 - 8 - 8 - 8 - 2 - 4 - 4)
    t.readFully(recordsBytes)
    val recIn = new DataInputStream(
      if (codec == 2) new org.xerial.snappy.SnappyInputStream(new ByteArrayInputStream(recordsBytes))
      else new ByteArrayInputStream(recordsBytes))
    val recs = (0 until n).map { _ =>
      readVarlong(recIn) // record length
      recIn.readByte()   // attributes
      readVarlong(recIn) // timestampDelta
      readVarlong(recIn) // offsetDelta
      val kLen = readVarlong(recIn).toInt
      val k = if (kLen < 0) null else { val b = new Array[Byte](kLen); recIn.readFully(b); new String(b, StandardCharsets.UTF_8) }
      val vLen = readVarlong(recIn).toInt
      val v = if (vLen < 0) null else { val b = new Array[Byte](vLen); recIn.readFully(b); new String(b, StandardCharsets.UTF_8) }
      val nHeaders = readVarlong(recIn)
      require(nHeaders == 0, "fixture records carry no headers")
      (k, v)
    }
    Batch(topic, partition, codec, crcOk, recs)
  }

  def stop(): Unit = server.close()
}

class KafkaWireSpec extends SparkSpec {

  test("handshake + keyed snappy-batched produce accepted by the stub broker") {
    val broker = new KafkaStubBroker
    try {
      val p = new KafkaWire.Producer("127.0.0.1", broker.port)
      try {
        val (min, max) = p.apiVersions()
        assert(min <= 3 && max >= 3, "stub advertises Produce v3")
        val records = Seq(
          "shop.user" -> """{"database":"shop","event_index":1}""",
          "shop.user" -> """{"database":"shop","event_index":2}""",
          "shop.order" -> """{"database":"shop","event_index":3}""")
        p.produce("wing", records.map { case (k, v) =>
          (k.getBytes(StandardCharsets.UTF_8), v.getBytes(StandardCharsets.UTF_8)) })
      } finally p.close()
      val batch = broker.received.poll()
      assert(batch != null, "broker received a produce request")
      assert(batch.topic === "wing" && batch.partition === 0)
      assert(batch.codec === 2, "reference parity: snappy compression (config.go:43-45)")
      assert(batch.crcOk, "record batch CRC32C must verify")
      assert(batch.records.map(_._1) === Seq("shop.user", "shop.user", "shop.order"),
        "keys are database.table (producer.go:66-73) in order")
      assert(batch.records(1)._2.contains("\"event_index\":2"))
    } finally broker.stop()
  }

  test("executor-side fan-out: a multi-partition frame produces every envelope") {
    import spark.implicits._
    val broker = new KafkaStubBroker
    try {
      val frame = (1 to 40)
        .map(i => (s"d.t${i % 4}", s"""{"event_index":$i}"""))
        .toDF("topic", "envelope")
        .repartition(4)
      KafkaWire.produce(frame, "127.0.0.1", broker.port, "wing", batchRecords = 7)
      val batches = broker.received.iterator().asInstanceOf[java.util.Iterator[KafkaStubBroker#Batch]]
      val all = scala.collection.mutable.ArrayBuffer[(String, String)]()
      var crcAll = true; var snappyAll = true
      while (batches.hasNext) {
        val b = batches.next()
        crcAll &= b.crcOk; snappyAll &= (b.codec == 2)
        all ++= b.records
      }
      assert(crcAll && snappyAll)
      assert(all.size === 40, "every record produced exactly once")
      assert(all.map(_._2).sorted === (1 to 40).map(i => s"""{"event_index":$i}""").sorted)
      // per-table ordering within a partition's batches rides the key
      assert(all.map(_._1).toSet === Set("d.t0", "d.t1", "d.t2", "d.t3"))
    } finally broker.stop()
  }

  test("partition hashing spreads tables across >1 partition, preserving per-table order") {
    import spark.implicits._
    val nKafkaParts = 3
    val broker = new KafkaStubBroker(numPartitions = nKafkaParts)
    try {
      val tables = (0 until 8).map(i => s"shop.t$i")
      val layout = tables.map(t =>
        t -> KafkaWire.partitionFor(t.getBytes(StandardCharsets.UTF_8), nKafkaParts)).toMap
      assert(layout.values.toSet.size > 1, s"fixture keys must spread: $layout")

      // 20 sequenced envelopes per table; repartition BY topic so each
      // table's rows ride one task in seq order — the engine frame shape.
      val frame = (1 to 160)
        .map { i => val t = tables(i % 8); (t, s"""{"table":"$t","seq":$i}""", i) }
        .toDF("topic", "envelope", "seq")
        .repartition(4, col("topic"))
        .sortWithinPartitions("seq")
        .select("topic", "envelope")
      KafkaWire.produce(frame, "127.0.0.1", broker.port, "wing", batchRecords = 6)

      val batches = {
        val b = scala.collection.mutable.ArrayBuffer[KafkaStubBroker#Batch]()
        val it = broker.received.iterator()
        while (it.hasNext) b += it.next().asInstanceOf[KafkaStubBroker#Batch]
        b.toSeq
      }
      assert(batches.map(_.partition).toSet.size > 1, "load actually spread over partitions")
      assert(batches.flatMap(_.records).size === 160, "every record produced exactly once")
      // 1) every record sits on the partition murmur2 assigns its key
      batches.foreach { b =>
        b.records.foreach { case (k, _) =>
          assert(b.partition === layout(k), s"key $k landed off its hash partition")
        }
      }
      // 2) per-table order: concatenating one partition's batches in arrival
      //    order, each table's seq numbers are strictly increasing
      val seqRe = """"seq":(\d+)""".r
      tables.foreach { t =>
        val seqs = batches.filter(_.partition == layout(t))
          .flatMap(_.records).filter(_._1 == t)
          .map { case (_, v) => seqRe.findFirstMatchIn(v).get.group(1).toInt }
        assert(seqs.size === 20 && seqs === seqs.sorted,
          s"per-table ordering broken for $t: $seqs")
      }
    } finally broker.stop()
  }

  test("a produce error code from the broker fails the task loudly") {
    // A raw socket that answers ApiVersions then an error-code produce
    // response: the producer must surface the error, not swallow it.
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val s = server.accept()
      val in = new DataInputStream(s.getInputStream)
      val out = new DataOutputStream(s.getOutputStream)
      def frame(): (Short, Int) = {
        val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
        val r = new DataInputStream(new ByteArrayInputStream(b))
        val key = r.readShort(); r.readShort(); val corr = r.readInt()
        (key, corr)
      }
      val (_, c1) = frame() // ApiVersions
      out.writeInt(4 + 2 + 4 + 6); out.writeInt(c1); out.writeShort(0)
      out.writeInt(1); out.writeShort(0); out.writeShort(0); out.writeShort(3); out.flush()
      val (_, c2) = frame() // Produce -> NOT_LEADER_FOR_PARTITION (6)
      val resp = new ByteArrayOutputStream(); val d = new DataOutputStream(resp)
      d.writeInt(c2); d.writeInt(1); d.writeShort(1); d.write('t')
      d.writeInt(1); d.writeInt(0); d.writeShort(6); d.writeLong(-1L); d.writeLong(-1L)
      d.writeInt(0); d.flush()
      out.writeInt(resp.size()); out.write(resp.toByteArray); out.flush()
    })
    t.setDaemon(true); t.start()
    val p = new KafkaWire.Producer("127.0.0.1", server.getLocalPort)
    try {
      p.apiVersions()
      val ex = intercept[IllegalArgumentException](
        p.produce("t", Seq((Array[Byte]('k'), Array[Byte]('v')))))
      assert(ex.getMessage.contains("error code 6"))
    } finally { p.close(); server.close() }
  }
}
