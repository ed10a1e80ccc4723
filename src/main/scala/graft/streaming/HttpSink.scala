package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.cdc.TopicFilter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP sink (operator K2): groups of URLs, each group with its own regex
  * filter set; matching envelopes are POSTed as JSON
  * (`/root/reference/src/services/http/http.go:46-52`, `group.go:21-33`,
  * `library/http/http.go:44-93`).
  *
  * Spark shape: the batch is filtered per group (F1 semantics), then POSTed
  * from `foreachPartition` — executors do the I/O in parallel with one shared
  * pooled client per JVM (the reference runs NumCPU+2 workers per node; here
  * task parallelism is the worker pool). Failed posts are counted and
  * reported, not retried — the reference drops after its deadline too. */
object HttpSink {

  final case class HttpGroup(urls: Seq[String], filters: Seq[String] = Nil)

  // One pooled client per executor JVM (connection reuse across partitions).
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(6)).build()

  def post(url: String, body: String): Int = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(6))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  /** Send one envelope batch (columns `topic`, `envelope`) to every group.
    * Returns the number of FAILED posts (connect error or non-2xx), summed
    * via a Spark accumulator across executors — the "counted and reported"
    * half of the contract; no retries, like the reference's deadline drop. */
  def sendBatch(batch: DataFrame, groups: Seq[HttpGroup]): Long = {
    val failures = batch.sparkSession.sparkContext.longAccumulator("http_sink_failures")
    groups.foreach { g =>
      val urls = g.urls
      batch.filter(TopicFilter.matchAny(col("topic"), g.filters))
        .select(col("envelope"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { row =>
            val body = row.getString(0)
            urls.foreach { u =>
              val ok = scala.util.Try(post(u, body)).toOption.exists(c => c >= 200 && c < 300)
              if (!ok) failures.add(1L)
            }
          }
        }
    }
    if (failures.value > 0)
      System.err.println(s"[graft] HttpSink: ${failures.value} failed post(s) this batch")
    failures.value
  }
}
