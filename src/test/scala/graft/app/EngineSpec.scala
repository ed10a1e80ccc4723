package graft.app

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.streaming.{CdcStream, ControlClient}

/** End-to-end engine wiring: DSv2 source → envelopes → file sinks, with the
  * control plane stopping the query over the wire. */
class EngineSpec extends SparkSpec {

  private def tmp(): Path = Files.createTempDirectory("graft_engine")

  private def line(db: String, tbl: String, seq: Long): String =
    s"""{"database":"$db","table":"$tbl","action":"insert","ts":9,"stmt_seq":$seq,"rows":[[{"k":"id","v":"$seq"}]]}"""

  private def readSink(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else Files.walk(p).iterator().asScala
      .filter(f => f.toString.endsWith(".txt") && Files.isRegularFile(f))
      .flatMap(f => Files.readAllLines(f).asScala).toSeq
  }

  test("engine: DSv2 source with table filter -> envelope fan-out -> control stop") {
    val (in, cp, out) = (tmp(), tmp(), tmp())
    Files.write(in.resolve("bin.0001"),
      Seq(line("test", "city", 1), line("skip", "x", 2), line("test", "user", 3)).asJava)

    val handle = Engine.start(spark, Engine.Config(
      inputDir = in.toString,
      checkpointDir = cp.toString,
      posFile = s"$out/pos.bin",
      sinks = Seq(
        CdcStream.SinkConfig("all", s"$out/all"),
        CdcStream.SinkConfig("city_only", s"$out/city", Seq("\\.city$"))),
      useDsv2Source = true,
      tableFilter = Some("^test\\."),
      controlPort = Some(0)))
    try {
      assert(handle.awaitTermination(120000))
      assert(readSink(s"$out/all").size === 2)          // 'skip.x' filtered at the source
      val city = readSink(s"$out/city")
      assert(city.size === 1 && city.head.contains("\"table\":\"city\""))
      // control plane over the wire
      val ctl = handle.control.get
      assert(ControlClient.showMembers(ctl.boundPort) != null)
      assert(ControlClient.stop(ctl.boundPort) === "ok")
    } finally handle.stop()
  }
}
