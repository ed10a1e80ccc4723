package graft.source

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DSv2 source tests: admission control batch sizing, checkpointed restart
  * from the committed offset, source-side table filtering (position still
  * advances), snapshot batch read. */
class CdcSourceSpec extends SparkSpec {

  private def tmp(): Path = Files.createTempDirectory("graft_src")

  private def line(db: String, tbl: String, seq: Long): String =
    s"""{"database":"$db","table":"$tbl","action":"insert","ts":1,"stmt_seq":$seq,"rows":[[{"k":"id","v":"$seq"}]]}"""

  private def write(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), lines.asJava)

  private def drain(in: Path, cp: Path, out: Path,
                    extra: Map[String, String] = Map.empty): Seq[Long] = {
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    val reader = spark.readStream.format("graft-cdc").option("path", in.toString)
    val q = extra.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
      .writeStream
      .option("checkpointLocation", cp.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches += batch.count()
        batch.select("stmt_index").write.mode("append").parquet(s"$out/rows")
      }
      .start()
    q.awaitTermination(120000)
    batches.toSeq
  }

  private def indices(out: Path): Seq[Long] =
    spark.read.parquet(s"$out/rows").collect().map(_.getLong(0)).sorted.toSeq

  test("admission control: maxStatementsPerTrigger bounds every micro-batch") {
    val (in, cp, out) = (tmp(), tmp(), tmp())
    write(in, "bin.0001", (0L until 7L).map(i => line("d", "t", i)))
    val sizes = drain(in, cp, out, Map("maxStatementsPerTrigger" -> "3"))
    assert(sizes.filter(_ > 0).forall(_ <= 3), s"batch sizes: $sizes")
    assert(sizes.sum === 7)
    assert(indices(out) === (0L until 7L))
  }

  test("restart resumes from the committed offset; new files continue the sequence") {
    val (in, cp, out) = (tmp(), tmp(), tmp())
    write(in, "bin.0001", (0L until 4L).map(i => line("d", "t", i)))
    assert(drain(in, cp, out).sum === 4)
    write(in, "bin.0002", (4L until 9L).map(i => line("d", "t", i)))
    val second = drain(in, cp, out)
    assert(second.sum === 5, s"restart must only read the new file, got $second")
    assert(indices(out) === (0L until 9L), "global stmt_index dense across files and restarts")
  }

  test("S3 tableFilter drops before decode but positions still advance") {
    val (in, cp, out) = (tmp(), tmp(), tmp())
    write(in, "bin.0001", Seq(
      line("test", "city", 0), line("shop", "orders", 1),
      line("test", "user", 2), line("other", "x", 3)))
    val sizes = drain(in, cp, out, Map("tableFilter" -> "^test\\."))
    assert(sizes.sum === 2)
    // Filtered statements keep their binlog positions: survivors are 0 and 2.
    assert(indices(out) === Seq(0L, 2L))
  }

  test("S2 snapshot: the same table batch-reads everything") {
    val in = tmp()
    write(in, "bin.0001", (0L until 6L).map(i => line("d", "t", i)))
    val snap = spark.read.format("graft-cdc").option("path", in.toString).load()
    assert(snap.count() === 6)
    assert(snap.select("db_table").distinct().collect().map(_.getString(0)).toSeq === Seq("d.t"))
  }

  test("source composes with the envelope pipeline (from_json on value)") {
    val in = tmp()
    write(in, "bin.0001", Seq(line("test", "city", 1), line("test", "city", 2)))
    val raw = spark.read.format("graft-cdc").option("path", in.toString).load()
      .select(from_json(col("value"), graft.streaming.CdcStream.rawSchema).as("r"))
      .select("r.*")
    val env = graft.cdc.EnvelopeBuilder.withEventIndex(raw)
    assert(env.count() === 2)
    assert(env.select("topic").distinct().collect().map(_.getString(0)).toSeq === Seq("test.city"))
  }
}
