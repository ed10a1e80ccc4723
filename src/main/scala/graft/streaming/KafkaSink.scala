package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kafka sink wiring (operator K4). Two produce paths:
  *
  *  1. `spark-sql-kafka-0-10` deployments plug [[frame]] + [[producerOptions]]
  *     straight into `envelopes.transform(KafkaSink.frame("wing"))
  *     .writeStream.format("kafka").options(...).start()`.
  *  2. [[KafkaWire]] — a self-contained wire-protocol producer (ApiVersions +
  *     Produce v3, message-format-v2 record batches, CRC32C, snappy) needing
  *     no connector jar, exercised end-to-end against a stub broker in
  *     `KafkaWireSpec`/`EngineSpec` and wired into the engine via
  *     `Engine.Config.kafkaPush`.
  *
  * Both share the contract: key = `database.table`, value = the one-shot
  * envelope JSON, per-table ordering via the key.
  */
object KafkaSink {

  /** Spark Kafka-sink frame: key/value BINARY + destination topic. The
    * partition key is the routing topic `database.table`, which preserves
    * per-table event ordering exactly like the reference
    * (`/root/reference/src/services/kafka/producer.go:66-73`). */
  def frame(kafkaTopic: String)(envelopes: DataFrame): DataFrame =
    envelopes.select(
      col("topic").cast("binary").as("key"),
      col("envelope").cast("binary").as("value"),
      lit(kafkaTopic).as("topic"))

  /** Producer tuning mirroring the reference's throughput-over-latency
    * choices: snappy compression, 500 ms linger, local-ack
    * (`src/services/kafka/config.go:43-45`). */
  def producerOptions(bootstrapServers: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "kafka.compression.type" -> "snappy",
    "kafka.linger.ms" -> "500",
    "kafka.acks" -> "1")
}
