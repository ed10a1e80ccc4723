package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket

import graft.cdc.TopicFilter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redis queue sink (operator K3): `RPUSH <list> <json>` for every envelope
  * that passes the sink's filters (`/root/reference/src/services/redis/
  * redis.go:73-91`). Speaks actual RESP over a per-partition connection — no
  * client library needed; works against any Redis-protocol server. */
object RedisSink {

  /** Encode one RESP array command. */
  def respCommand(args: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append('*').append(args.length).append("\r\n")
    args.foreach { a =>
      val b = a.getBytes("UTF-8")
      sb.append('$').append(b.length).append("\r\n").append(a).append("\r\n")
    }
    sb.toString.getBytes("UTF-8")
  }

  /** A minimal RESP connection: write commands, read single-line replies
    * (RPUSH replies `:<n>`). */
  final class Conn(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    private val out = new BufferedOutputStream(sock.getOutputStream)
    private val in = new BufferedInputStream(sock.getInputStream)

    def rpush(list: String, value: String): Unit = {
      out.write(respCommand(Seq("RPUSH", list, value)))
      out.flush()
      readReply()
    }

    private def readReply(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') { sb.append(c.toChar); c = in.read() }
      sb.toString.stripSuffix("\r")
    }

    override def close(): Unit = { scala.util.Try(out.flush()); scala.util.Try(sock.close()) }
  }

  /** RPUSH every filter-matching envelope of a batch into `list`. One
    * connection per partition (executor-side, parallel, no driver funnel). */
  def sendBatch(batch: DataFrame, host: String, port: Int, list: String,
                filters: Seq[String] = Nil): Unit =
    batch.filter(TopicFilter.matchAny(col("topic"), filters))
      .select(col("envelope"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.nonEmpty) {
          val conn = new Conn(host, port)
          try it.foreach(r => conn.rpush(list, r.getString(0)))
          finally conn.close()
        }
      }
}
