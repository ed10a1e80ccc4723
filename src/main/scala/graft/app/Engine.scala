package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.{CdcStream, ControlService, SubscriberRegistry, TcpPubSubService}

/** The application wiring (SURVEY §7.1 `app/`): one CDC stream →
  * envelope pipeline → N filtered sinks, plus the control surface — the
  * Spark-shaped equivalent of the reference daemon's `main`
  * (`/root/reference/src/wing-binlog-go/main.go:70-152`):
  * construct sinks, start the tail, expose stop/reload/status.
  *
  * The engine can read either a plain JSON-lines directory (Spark file
  * source) or through the custom `graft-cdc` DSv2 source (admission control +
  * source-side table filter). Recovery: Spark checkpoint (what replays) + the
  * reference-format pos cache (replay-stable event numbering).
  */
object Engine {

  final case class Config(
      inputDir: String,
      checkpointDir: String,
      posFile: String,
      sinks: Seq[CdcStream.SinkConfig] = Nil,
      useDsv2Source: Boolean = false,
      tableFilter: Option[String] = None,      // S3, only with the DSv2 source
      maxStatementsPerTrigger: Option[Long] = None,
      controlPort: Option[Int] = None,         // P2; 0 = ephemeral
      tcpPubSubPort: Option[Int] = None,       // K1; 0 = ephemeral
      trigger: Trigger = Trigger.AvailableNow())

  final class Handle(val query: StreamingQuery,
                     val control: Option[ControlService],
                     val pubsub: Option[TcpPubSubService],
                     val registry: SubscriberRegistry) {
    def awaitTermination(ms: Long): Boolean = query.awaitTermination(ms)
    def stop(): Unit = {
      scala.util.Try(query.stop())
      pubsub.foreach(_.stop())
      control.foreach(_.stop())
    }
  }

  /** Start the engine: stream → envelopes → fan-out to configured sinks +
    * any connected TCP subscribers; control service wired to the query. */
  def start(spark: SparkSession, cfg: Config): Handle = {
    val registry = new SubscriberRegistry
    val pubsub = cfg.tcpPubSubPort.map(p => new TcpPubSubService(p))

    val raw =
      if (cfg.useDsv2Source) {
        var r = spark.readStream.format("graft-cdc").option("path", cfg.inputDir)
        cfg.tableFilter.foreach(f => r = r.option("tableFilter", f))
        cfg.maxStatementsPerTrigger.foreach(n => r = r.option("maxStatementsPerTrigger", n.toString))
        r.load()
          .select(from_json(col("value"), CdcStream.rawSchema).as("r"))
          .select("r.*")
      } else CdcStream.readRaw(spark, cfg.inputDir)

    val query = raw.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(cfg.trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        CdcStream.processBatch(batch, id, cfg.posFile, cfg.sinks)
        // Push tier: re-read what this batch appended is not needed — the
        // pub/sub service receives the same envelopes directly.
        pubsub.foreach { svc =>
          val env = graft.cdc.EnvelopeBuilder.withEventIndex(batch,
            startIndex = CdcStream.PosStore.read(cfg.posFile)._2)
          env.withColumn("envelope", graft.cdc.EnvelopeBuilder.envelopeJson(env))
            .select("topic", "envelope")
            .collect()  // the push tier is driver-side by design (like the reference)
            .foreach(r => svc.sendAll(r.getString(0), r.getString(1)))
        }
      }
      .start()

    val control = cfg.controlPort.map(p => new ControlService(p,
      onStop = () => query.stop(),
      onReload = _ => (), // config re-read hook; queries restart via stop/start
      members = () => spark.streams.active.map(q => s"${q.name} ${q.id}").mkString("\n")))

    new Handle(query, control, pubsub, registry)
  }
}
