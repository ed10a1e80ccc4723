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
  * partition hashing — the DEFAULT Kafka partitioner, murmur2 of the key
  * bytes mod the topic's partition count discovered via a Metadata request,
  * so records interleave with any standard client's), value = the serialized
  * envelope, snappy batching, acks=1 (WaitForLocal).
  * [[KafkaSink.producerOptions]] still documents the connector-config form
  * for deployments that ship `spark-sql-kafka-0-10`; this class is the
  * self-contained fallback and the testable proof of the byte-level
  * contract.
  *
  * Scale shape: [[KafkaWire.produce]] runs one producer per PARTITION on the
  * executors (foreachPartition), so fan-out bandwidth scales with the
  * cluster, unlike the single-socket TCP push tier.
  */
object KafkaWire {

  val ApiProduce = 0
  val ApiMetadata = 3
  val ApiVersionsKey = 18

  // ----------------------------------------------------------- partitioning

  /** Kafka's murmur2 (the default partitioner's hash — a public, stable
    * algorithm every standard client implements, so our records land on the
    * same partitions a Java/Go producer's would for the same keys). */
  private[streaming] def murmur2(data: Array[Byte]): Int = {
    val m = 0x5bd1e995
    var h = 0x9747b28c ^ data.length
    val len4 = data.length & ~3
    var i = 0
    while (i < len4) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m; k ^= k >>> 24; k *= m
      h *= m; h ^= k
      i += 4
    }
    val rem = data.length & 3
    if (rem == 3) h ^= (data(len4 + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(len4 + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(len4) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  /** Default-partitioner placement: all records of one `database.table` key
    * land on ONE partition, which is what makes per-table ordering hold. */
  def partitionFor(key: Array[Byte], numPartitions: Int): Int =
    (murmur2(key) & 0x7fffffff) % numPartitions

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

    /** Metadata v0: the topic's partition count — what the default
      * partitioner hashes keys against. One call per producer lifetime.
      * Retriable broker answers (LEADER_NOT_AVAILABLE=5 while an
      * auto-created topic is being assigned, UNKNOWN_TOPIC_OR_PARTITION=3)
      * are retried with a bounded backoff, the standard client behavior —
      * only a persistent error fails the task. */
    def partitionCount(topic: String, attempts: Int = 5, backoffMs: Long = 200): Int = {
      var attempt = 0
      while (true) {
        attempt += 1
        val (tErr, count) = metadataOnce(topic)
        if (tErr == 0 && count > 0) return count
        val retriable = tErr == 3 || tErr == 5
        if (!retriable || attempt >= attempts)
          throw new IllegalArgumentException(
            s"kafka metadata error $tErr for topic $topic after $attempt attempt(s)")
        Thread.sleep(backoffMs)
      }
      -1 // unreachable
    }

    /** One Metadata round-trip → (topic error code, partition count);
      * error -1 = topic absent from the response. */
    private def metadataOnce(topic: String): (Int, Int) = {
      val body = new ByteArrayOutputStream()
      be32(body, 1); kString(body, topic)
      val r = readResponse(send(ApiMetadata, 0, body.toByteArray))
      val nBrokers = r.readInt()
      (0 until nBrokers).foreach { _ =>
        r.readInt() // nodeId
        val hLen = r.readShort(); r.skipBytes(hLen)
        r.readInt() // port
      }
      val nTopics = r.readInt()
      var res = (-1, -1)
      (0 until nTopics).foreach { _ =>
        val tErr = r.readShort()
        val tLen = r.readShort(); val tB = new Array[Byte](tLen); r.readFully(tB)
        val name = new String(tB, StandardCharsets.UTF_8)
        val nParts = r.readInt()
        (0 until nParts).foreach { _ =>
          r.readShort(); r.readInt(); r.readInt() // err, partition, leader
          r.skipBytes(4 * r.readInt()) // replicas
          r.skipBytes(4 * r.readInt()) // isr
        }
        if (name == topic) res = (tErr.toInt, nParts)
      }
      res
    }

    /** Produce v3 to (topic, partition 0) — the single-partition convenience
      * form. Returns the assigned base offset. */
    def produce(topic: String, records: Seq[(Array[Byte], Array[Byte])],
                acks: Int = 1, timeoutMs: Int = 30000, snappy: Boolean = true,
                timestamp: Long = 0L): Long =
      produceTo(topic, Map(0 -> records), acks, timeoutMs, snappy, timestamp)
        .getOrElse(0, -1L)

    /** Produce v3, one record batch per partition in ONE request — the shape
      * a keyed, default-partitioned producer sends. Returns the assigned base
      * offset per partition. acks=1 mirrors the reference's WaitForLocal. */
    def produceTo(topic: String, byPartition: Map[Int, Seq[(Array[Byte], Array[Byte])]],
                  acks: Int = 1, timeoutMs: Int = 30000, snappy: Boolean = true,
                  timestamp: Long = 0L): Map[Int, Long] = {
      require(byPartition.nonEmpty && byPartition.values.forall(_.nonEmpty), "empty produce")
      val body = new ByteArrayOutputStream()
      be16(body, -1) // transactional_id = null
      be16(body, acks); be32(body, timeoutMs)
      be32(body, 1) // one topic
      kString(body, topic)
      be32(body, byPartition.size)
      byPartition.toSeq.sortBy(_._1).foreach { case (pid, records) =>
        val batch = recordBatch(records, timestamp, snappy)
        be32(body, pid)
        be32(body, batch.length)
        body.write(batch)
      }
      val corr = send(ApiProduce, 3, body.toByteArray)
      if (acks == 0) return byPartition.view.mapValues(_ => -1L).toMap
      val r = readResponse(corr)
      val nTopics = r.readInt()
      require(nTopics == 1, s"unexpected topic count $nTopics")
      val tLen = r.readShort(); r.skipBytes(tLen)
      val nParts = r.readInt()
      require(nParts == byPartition.size, s"unexpected partition count $nParts")
      (0 until nParts).map { _ =>
        val pid = r.readInt()
        val err = r.readShort()
        require(err == 0, s"kafka produce error code $err (partition $pid)")
        val baseOffset = r.readLong()
        r.readLong() // log append time
        pid -> baseOffset
      }.toMap
    }

    override def close(): Unit = sock.close()
  }

  /** Executor-side fan-out of a (topic, envelope) frame: one producer per
    * SPARK partition, each batching records and routing them through the
    * default partitioner (murmur2 of the `database.table` key mod the
    * topic's partition count) — the wire-protocol realization of
    * [[KafkaSink.frame]]'s contract. Within a task, records of one key keep
    * their iterator order and all land on one Kafka partition, so per-table
    * ordering holds end-to-end when the frame co-locates each table's rows
    * (the engine's frames do: one micro-batch, index-sorted). */
  def produce(frame: DataFrame, host: String, port: Int, kafkaTopic: String,
              batchRecords: Int = 1000): Unit = {
    frame.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val p = new Producer(host, port)
        try {
          p.apiVersions()
          val nParts = p.partitionCount(kafkaTopic)
          it.grouped(batchRecords).foreach { group =>
            val recs = group.map(r =>
              (r.getString(0).getBytes(StandardCharsets.UTF_8),
                r.getString(1).getBytes(StandardCharsets.UTF_8)))
            // Seq.groupBy preserves encounter order within each group, so a
            // key's records stay ordered inside its partition's batch.
            // CreateTime = produce wall clock: a 0 timestamp would read as
            // epoch 1970 — instantly past any time-based retention (broker
            // deletes the segment) and garbage for event-time consumers.
            p.produceTo(kafkaTopic, recs.groupBy(r => partitionFor(r._1, nParts)),
              timestamp = System.currentTimeMillis())
          }
        } finally p.close()
      }
    }
  }
}
