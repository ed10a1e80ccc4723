package graft.source

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DSv2 source tests: admission control batch sizing, checkpointed restart
  * from the committed offset, source-side table filtering (position still
  * advances), snapshot batch read, metadata-only planning, split alignment. */
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
        batch.select("pos", "value").write.mode("append").parquet(s"$out/rows")
      }
      .start()
    q.awaitTermination(120000)
    batches.toSeq
  }

  private def positions(out: Path): Seq[Long] =
    spark.read.parquet(s"$out/rows").collect().map(_.getLong(0)).sorted.toSeq

  /** Expected byte positions of each line start given newline-terminated lines. */
  private def lineStarts(lines: Seq[String], base: Long = 0L): Seq[Long] =
    lines.scanLeft(base)((at, l) => at + l.getBytes("UTF-8").length + 1).init

  test("admission control: maxBytesPerTrigger bounds every micro-batch") {
    val (in, cp, out) = (tmp(), tmp(), tmp())
    val ls = (0L until 7L).map(i => line("d", "t", i))
    write(in, "bin.0001", ls)
    // ~3 lines per byte budget: every batch's row count is bounded and the
    // stream still drains everything exactly once.
    val budget = (ls.take(3).map(_.length + 1).sum).toString
    val sizes = drain(in, cp, out, Map("maxBytesPerTrigger" -> budget))
    assert(sizes.filter(_ > 0).forall(_ <= 3), s"batch sizes: $sizes")
    assert(sizes.sum === 7)
    assert(positions(out) === lineStarts(ls))
  }

  test("a byte budget smaller than one line still advances (0-row batches, no stall)") {
    val (in, cp, out) = (tmp(), tmp(), tmp())
    val ls = (0L until 3L).map(i => line("d", "t", i))
    write(in, "bin.0001", ls)
    val sizes = drain(in, cp, out, Map("maxBytesPerTrigger" -> "10"))
    assert(sizes.sum === 3, s"all lines exactly once, got $sizes")
    assert(positions(out) === lineStarts(ls))
  }

  test("restart resumes from the committed offset; new files continue the sequence") {
    val (in, cp, out) = (tmp(), tmp(), tmp())
    val first = (0L until 4L).map(i => line("d", "t", i))
    write(in, "bin.0001", first)
    assert(drain(in, cp, out).sum === 4)
    val second = (4L until 9L).map(i => line("d", "t", i))
    write(in, "bin.0002", second)
    val sizes = drain(in, cp, out)
    assert(sizes.sum === 5, s"restart must only read the new file, got $sizes")
    val firstBytes = first.map(_.getBytes("UTF-8").length + 1L).sum
    assert(positions(out) === lineStarts(first) ++ lineStarts(second, firstBytes),
      "global byte positions dense across files and restarts")
  }

  test("S3 tableFilter drops before decode but positions still advance") {
    val (in, cp, out) = (tmp(), tmp(), tmp())
    val ls = Seq(
      line("test", "city", 0), line("shop", "orders", 1),
      line("test", "user", 2), line("other", "x", 3))
    write(in, "bin.0001", ls)
    val sizes = drain(in, cp, out, Map("tableFilter" -> "^test\\."))
    assert(sizes.sum === 2)
    // Filtered statements keep their binlog positions: survivors are lines 0 and 2.
    val starts = lineStarts(ls)
    assert(positions(out) === Seq(starts(0), starts(2)))
  }

  test("S2 snapshot: the same table batch-reads everything") {
    val in = tmp()
    write(in, "bin.0001", (0L until 6L).map(i => line("d", "t", i)))
    val snap = spark.read.format("graft-cdc").option("path", in.toString).load()
    assert(snap.count() === 6)
    assert(snap.select("db_table").distinct().collect().map(_.getString(0)).toSeq === Seq("d.t"))
  }

  test("planning is metadata-only: a 1 TB sparse file plans instantly, unread") {
    val in = tmp()
    val huge = in.resolve("bin.0001")
    val raf = new java.io.RandomAccessFile(huge.toFile, "rw")
    try raf.setLength(1L << 40) finally raf.close() // sparse: no blocks written
    val t0 = System.nanoTime()
    val files = CdcSource.listFiles(in.toString)
    val parts = CdcMicroBatchStream.slice(files.map { case (p, s) => (p.toString, s) }, 0L, 1L << 40, None, splitBytes = 1L << 30)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(files.map(_._2).sum === (1L << 40))
    assert(parts.length === 1024, "1 TiB at 1 GiB splits = 1024 partitions")
    // Counting lines of 1 TB would take minutes; metadata planning is instant.
    assert(elapsed < 5.0, s"planning must not open file contents (took ${elapsed}s)")
  }

  test("splits align to line boundaries: every line exactly once, any split size") {
    val in = tmp()
    val ls = (0L until 50L).map(i => line("db", "tbl", i))
    write(in, "bin.0001", ls)
    val files = CdcSource.listFiles(in.toString)
    val starts = lineStarts(ls)
    // Sweep split sizes incl. pathological ones (1 byte ⇒ one split per byte).
    for (split <- Seq(1L, 7L, 64L, 1000L, 1L << 20)) {
      val parts = CdcMicroBatchStream.slice(files.map { case (p, s) => (p.toString, s) }, 0L, Long.MaxValue, None, split)
      val got = parts.flatMap { ip =>
        val r = new CdcReaderFactory().createReader(ip)
        val buf = scala.collection.mutable.ArrayBuffer[Long]()
        while (r.next()) buf += r.get().getLong(2)
        r.close()
        buf
      }.sorted.toSeq
      assert(got === starts, s"split=$split must own each line exactly once")
    }
  }

  test("byte positions are exact under CRLF and an unterminated final line") {
    val in = tmp()
    // Mixed terminators: LF, CRLF, then a final line with NO terminator.
    val raw = line("d", "t", 0) + "\n" + line("d", "t", 1) + "\r\n" + line("d", "t", 2)
    Files.write(in.resolve("bin.0001"), raw.getBytes("UTF-8"))
    val expectStarts = Seq(
      0L,
      line("d", "t", 0).getBytes("UTF-8").length + 1L,
      line("d", "t", 0).getBytes("UTF-8").length + 1L +
        line("d", "t", 1).getBytes("UTF-8").length + 2L)
    // Full read: 3 lines, true offsets, CR stripped from content.
    val r = new FileBinlogReader(in.resolve("bin.0001").toString, 0L, Long.MaxValue)
    val got = Iterator.continually(r.nextLine()).takeWhile(_ != null).toList
    r.close()
    assert(got.map(_._1) === expectStarts)
    assert(got.map(_._2) === Seq(line("d", "t", 0), line("d", "t", 1), line("d", "t", 2)),
      "CR must be stripped from content but counted in position")
    // Split ownership still exact: cut right at the CRLF line's start.
    for (cut <- expectStarts ++ Seq(expectStarts(1) + 1, expectStarts(2) + 1)) {
      val owned = Seq((0L, cut), (cut, Long.MaxValue)).flatMap { case (lo, hi) =>
        val rr = new FileBinlogReader(in.resolve("bin.0001").toString, lo, hi)
        val ls = Iterator.continually(rr.nextLine()).takeWhile(_ != null).map(_._1).toList
        rr.close(); ls
      }
      assert(owned === expectStarts, s"cut=$cut must keep every line exactly once")
    }
  }

  test("legacy statement-index checkpoint offsets fail with an actionable message") {
    val s = new CdcMicroBatchStream("/nonexistent", None, None)
    val ex = intercept[IllegalArgumentException](s.deserializeOffset("""{"stmt":42}"""))
    assert(ex.getMessage.contains("reset the checkpoint"))
    assert(s.deserializeOffset("""{"pos":42}""").asInstanceOf[CdcOffset].pos === 42L)
  }

  test("BinlogReader seam: a synthetic wire reader drops in without DSv2 changes") {
    val scripted = Seq(0L -> """{"database":"d","table":"t","action":"insert","ts":1,"stmt_seq":0,"rows":[]}""",
                       90L -> """{"database":"d","table":"t","action":"insert","ts":2,"stmt_seq":1,"rows":[]}""")
    val factory = new CdcReaderFactory(mkReader = _ => new BinlogReader {
      private val it = scripted.iterator
      override def nextLine(): (Long, String) = if (it.hasNext) it.next() else null
      override def close(): Unit = ()
    })
    val r = factory.createReader(CdcInputPartition("mem", 0L, Long.MaxValue, 1000L, None))
    val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    while (r.next()) { val row = r.get(); out += ((row.getLong(2), row.getString(3))) }
    r.close()
    assert(out.toSeq === Seq((1000L, "d.t"), (1090L, "d.t")),
      "positions = globalBase + wire offsets; routing key decoded from the line")
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
