package graft.streaming

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32C

import org.apache.spark.sql.DataFrame

/** A real Kafka PRODUCE path with no connector jar: speaks the public Kafka
  * wire protocol (the same trick [[RedisSink]] uses for RESP) — ApiVersions
  * v0 handshake, Produce v3 requests carrying message-format-v2 record
  * batches (CRC32C, varint/zigzag records, optional snappy via the xerial
  * stream framing Kafka's snappy codec uses).
  *
  * Contract mirrored from the reference producer
  * (`/root/reference/src/services/kafka/producer.go:45-75`,
  * `config.go:43-45`): key = `database.table` (per-table ordering through
  * partition hashing), value = the serialized envelope, snappy batching,
  * acks=1 (WaitForLocal). [[KafkaSink.producerOptions]] still documents the
  * connector-config form for deployments that ship `spark-sql-kafka-0-10`;
  * this class is the self-contained fallback and the testable proof of the
  * byte-level contract.
  *
  * Scale shape: [[KafkaWire.produce]] runs one producer per PARTITION on the
  * executors (foreachPartition), so fan-out bandwidth scales with the
  * cluster, unlike the single-socket TCP push tier.
  */
object KafkaWire {

  val ApiProduce = 0
  val ApiVersionsKey = 18

  // ----------------------------------------------------------- wire helpers

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  private[streaming] def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = zigzag(value)
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def be16(out: ByteArrayOutputStream, v: Int): Unit = { out.write(v >> 8); out.write(v) }
  private def be32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v >> 24); out.write(v >> 16); out.write(v >> 8); out.write(v)
  }
  private def be64(out: ByteArrayOutputStream, v: Long): Unit = {
    be32(out, (v >> 32).toInt); be32(out, v.toInt)
  }
  private def kString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8); be16(out, b.length); out.write(b)
  }

  /** One message-format-v2 record batch (baseOffset 0; the broker assigns). */
  private[streaming] def recordBatch(records: Seq[(Array[Byte], Array[Byte])],
                                     timestamp: Long, snappy: Boolean): Array[Byte] = {
    val recs = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((key, value), i) =>
      val r = new ByteArrayOutputStream()
      r.write(0) // record attributes
      writeVarint(r, 0L) // timestampDelta
      writeVarint(r, i.toLong) // offsetDelta
      if (key == null) writeVarint(r, -1L) else { writeVarint(r, key.length.toLong); r.write(key) }
      if (value == null) writeVarint(r, -1L) else { writeVarint(r, value.length.toLong); r.write(value) }
      writeVarint(r, 0L) // headers
      val rb = r.toByteArray
      writeVarint(recs, rb.length.toLong)
      recs.write(rb)
    }
    val recordsData =
      if (!snappy) recs.toByteArray
      else { // Kafka's snappy codec = xerial stream framing
        val bos = new ByteArrayOutputStream()
        val sn = new org.xerial.snappy.SnappyOutputStream(bos)
        sn.write(recs.toByteArray); sn.close()
        bos.toByteArray
      }
    // bytes covered by the CRC: attributes .. end
    val tail = new ByteArrayOutputStream()
    be16(tail, if (snappy) 2 else 0) // attributes: codec bits
    be32(tail, records.size - 1) // lastOffsetDelta
    be64(tail, timestamp); be64(tail, timestamp)
    be64(tail, -1L); be16(tail, -1); be32(tail, -1) // producerId/Epoch/baseSeq
    be32(tail, records.size)
    tail.write(recordsData)
    val tailBytes = tail.toByteArray
    val crc = new CRC32C(); crc.update(tailBytes)

    val batch = new ByteArrayOutputStream()
    be64(batch, 0L) // baseOffset
    be32(batch, 4 + 1 + 4 + tailBytes.length) // batchLength: epoch+magic+crc+tail
    be32(batch, -1) // partitionLeaderEpoch
    batch.write(2)  // magic v2
    be32(batch, crc.getValue.toInt)
    batch.write(tailBytes)
    batch.toByteArray
  }

  /** Blocking single-connection producer. Not thread-safe; one per task. */
  final class Producer(host: String, port: Int, clientId: String = "graft") extends AutoCloseable {
    private val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    private val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16))
    private val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream, 1 << 16))
    private var correlation = 0

    private def send(apiKey: Int, apiVersion: Int, body: Array[Byte]): Int = {
      correlation += 1
      val head = new ByteArrayOutputStream()
      be16(head, apiKey); be16(head, apiVersion); be32(head, correlation)
      kString(head, clientId)
      val frame = head.toByteArray ++ body
      out.writeInt(frame.length); out.write(frame); out.flush()
      correlation
    }

    private def readResponse(expectCorrelation: Int): DataInputStream = {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val r = new DataInputStream(new java.io.ByteArrayInputStream(buf))
      val corr = r.readInt()
      require(corr == expectCorrelation, s"kafka correlation mismatch: $corr != $expectCorrelation")
      r
    }

    /** ApiVersions v0 handshake: returns (minVersion, maxVersion) for Produce. */
    def apiVersions(): (Int, Int) = {
      val corr = send(ApiVersionsKey, 0, Array.empty)
      val r = readResponse(corr)
      val err = r.readShort()
      require(err == 0, s"kafka ApiVersions error $err")
      val n = r.readInt()
      var produce: (Int, Int) = null
      (0 until n).foreach { _ =>
        val key = r.readShort(); val min = r.readShort(); val max = r.readShort()
        if (key == ApiProduce) produce = (min.toInt, max.toInt)
      }
      require(produce != null, "broker does not advertise Produce")
      produce
    }

    /** Produce v3 to (topic, partition 0). Returns the assigned base offset.
      * acks=1 mirrors the reference's WaitForLocal. */
    def produce(topic: String, records: Seq[(Array[Byte], Array[Byte])],
                acks: Int = 1, timeoutMs: Int = 30000, snappy: Boolean = true,
                timestamp: Long = 0L): Long = {
      require(records.nonEmpty, "empty produce")
      val batch = recordBatch(records, timestamp, snappy)
      val body = new ByteArrayOutputStream()
      be16(body, -1) // transactional_id = null
      be16(body, acks); be32(body, timeoutMs)
      be32(body, 1) // one topic
      kString(body, topic)
      be32(body, 1) // one partition
      be32(body, 0) // partition 0
      be32(body, batch.length)
      body.write(batch)
      val corr = send(ApiProduce, 3, body.toByteArray)
      if (acks == 0) return -1L
      val r = readResponse(corr)
      val nTopics = r.readInt()
      require(nTopics == 1, s"unexpected topic count $nTopics")
      val tLen = r.readShort(); r.skipBytes(tLen)
      val nParts = r.readInt()
      require(nParts == 1, s"unexpected partition count $nParts")
      r.readInt() // partition index
      val err = r.readShort()
      require(err == 0, s"kafka produce error code $err")
      val baseOffset = r.readLong()
      baseOffset
    }

    override def close(): Unit = sock.close()
  }

  /** Executor-side fan-out of a (topic, envelope) frame: one producer and one
    * keyed, snappy-batched Produce request per partition — the wire-protocol
    * realization of [[KafkaSink.frame]]'s contract. */
  def produce(frame: DataFrame, host: String, port: Int, kafkaTopic: String,
              batchRecords: Int = 1000): Unit = {
    frame.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val p = new Producer(host, port)
        try {
          p.apiVersions()
          it.grouped(batchRecords).foreach { group =>
            val recs = group.map(r =>
              (r.getString(0).getBytes(StandardCharsets.UTF_8),
                r.getString(1).getBytes(StandardCharsets.UTF_8)))
            p.produce(kafkaTopic, recs)
          }
        } finally p.close()
      }
    }
  }
}
