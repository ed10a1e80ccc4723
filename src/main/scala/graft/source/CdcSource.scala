package graft.source

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util
import java.util.regex.Pattern
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DSv2 streaming source for the CDC fixture "binlog" (operators S1-S3).
  *
  * Models the reference's tail-the-binlog source
  * (`/root/reference/src/library/binlog/handler.go:20-71`, upstream loop
  * `vendor/.../canal/sync.go:44-140`) over a directory of JSON-lines files:
  * the sorted file sequence is the binlog; a statement's (file, line) is its
  * binlog position. The source emits RAW statement lines plus positions —
  * decoding to envelopes happens downstream (graft.cdc), exactly as the
  * reference separates the wire loop from `OnRow`.
  *
  *  - S1: `MicroBatchStream` with offsets = global statement index; restart
  *    resumes from the checkpointed offset (ST2's restore-and-clamp is the
  *    min(checkpoint, available) bound in [[CdcMicroBatchStream.latestOffset]]).
  *  - S2: the same table also supports BATCH_READ — a full snapshot read to
  *    union ahead of the tail (`canal.tryDump`).
  *  - S3: `tableFilter` option — an include regex on `database.table` applied
  *    in the reader BEFORE any decode, mirroring `checkTableMatch`
  *    (`vendor/.../canal/canal.go:243-280`); note the position still advances
  *    past filtered rows, like the reference.
  *  - Admission control: `maxStatementsPerTrigger` bounds each micro-batch
  *    (`SupportsAdmissionControl`), the backpressure analogue of the
  *    reference's bounded queues.
  *
  * Usage: `spark.readStream.format("graft-cdc").option("path", dir).load()`.
  */
class CdcTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CdcSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CdcTable(properties.asScala.toMap)
}

object CdcSource {
  /** Raw wire rows: the JSON line, its binlog position, and the pre-parsed
    * routing key (extracted without a full JSON parse, for S3 filtering). */
  val schema: StructType = StructType(Seq(
    StructField("value", StringType),        // raw statement JSON line
    StructField("file", StringType),         // binlog file name
    StructField("stmt_index", LongType),     // global statement position
    StructField("db_table", StringType)))    // routing key, pre-decode

  private val dbRe = Pattern.compile("\"database\"\\s*:\\s*\"([^\"]*)\"")
  private val tblRe = Pattern.compile("\"table\"\\s*:\\s*\"([^\"]*)\"")

  def dbTableOf(line: String): String = {
    val m1 = dbRe.matcher(line); val m2 = tblRe.matcher(line)
    val db = if (m1.find()) m1.group(1) else ""
    val tb = if (m2.find()) m2.group(1) else ""
    s"$db.$tb"
  }

  /** Sorted (file, lineCount) listing — the "binlog" sequence. */
  def listFiles(dir: String): Seq[(Path, Long)] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) return Seq.empty
    Files.list(d).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("."))
      .toSeq.sortBy(_.getFileName.toString)
      .map(p => p -> Files.lines(p, StandardCharsets.UTF_8).count())
  }
}

class CdcTable(properties: Map[String, String]) extends Table with SupportsRead {
  require(properties.contains("path"), "graft-cdc source requires option 'path'")
  override def name(): String = s"graft-cdc:${properties("path")}"
  override def schema(): StructType = CdcSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new CdcScan(properties ++ options.asScala)
}

class CdcScan(props: Map[String, String]) extends Scan {
  private val dir = props("path")
  private val filter = props.get("tablefilter").orElse(props.get("tableFilter"))
  override def readSchema(): StructType = CdcSource.schema
  override def description(): String =
    s"graft-cdc dir=$dir filter=${filter.getOrElse("(none)")}"

  /** S2: snapshot — all statements currently in the directory, one batch. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      CdcMicroBatchStream.slice(CdcSource.listFiles(dir), 0L, Long.MaxValue, filter)
    override def createReaderFactory(): PartitionReaderFactory = new CdcReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(dir, filter,
      props.get("maxstatementspertrigger").orElse(props.get("maxStatementsPerTrigger")).map(_.toLong))
}

/** Offset = number of statements (lines) consumed from the start of the
  * sorted file sequence. */
case class CdcOffset(stmt: Long) extends Offset {
  override def json(): String = s"""{"stmt":$stmt}"""
}

object CdcMicroBatchStream {
  /** Plan partitions for the global statement range [from, until): one
    * partition per file slice. */
  def slice(files: Seq[(Path, Long)], from: Long, until: Long,
            filter: Option[String]): Array[InputPartition] = {
    var base = 0L
    val parts = Seq.newBuilder[InputPartition]
    files.foreach { case (p, n) =>
      val lo = math.max(from, base)
      val hi = math.min(until, base + n)
      if (lo < hi)
        parts += CdcInputPartition(p.toString, lo - base, hi - base, base, filter)
      base += n
    }
    parts.result().toArray
  }
}

class CdcMicroBatchStream(dir: String, filter: Option[String], maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  // Line counts are cached per file: binlog files are append-only in the
  // reference and immutable-once-written here; only NEW files get counted.
  private val counts = scala.collection.mutable.LinkedHashMap[String, (Path, Long)]()
  private var availableNowTarget: Option[Long] = None

  private def refresh(): Seq[(Path, Long)] = synchronized {
    CdcSource.listFiles(dir).foreach { case (p, n) =>
      val key = p.toString
      if (!counts.contains(key)) counts(key) = (p, n)
    }
    counts.values.toSeq
  }

  private def totalAvailable(): Long = refresh().map(_._2).sum

  override def initialOffset(): Offset = CdcOffset(0L)

  override def deserializeOffset(json: String): Offset =
    CdcOffset("\"stmt\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json")))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CdcOffset].stmt
    // ST2 clamp: never promise beyond what the source actually has.
    val avail = availableNowTarget.getOrElse(totalAvailable())
    val until = limit match {
      case r: ReadMaxRows => math.min(avail, from + r.maxRows())
      case _ => avail
    }
    CdcOffset(math.max(from, until))
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(totalAvailable())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    CdcMicroBatchStream.slice(refresh(),
      start.asInstanceOf[CdcOffset].stmt, end.asInstanceOf[CdcOffset].stmt, filter)

  override def createReaderFactory(): PartitionReaderFactory = new CdcReaderFactory
  override def commit(end: Offset): Unit = () // files are immutable; nothing to ack
  override def stop(): Unit = ()
}

case class CdcInputPartition(file: String, fromLine: Long, untilLine: Long,
                             globalBase: Long, filter: Option[String]) extends InputPartition

class CdcReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcInputPartition]
    new PartitionReader[InternalRow] {
      private val reader = Files.newBufferedReader(Paths.get(p.file), StandardCharsets.UTF_8)
      private val pattern = p.filter.map(Pattern.compile)
      private var line: String = _
      private var lineNo: Long = 0L
      private var emittedAt: Long = -1L
      (0L until p.fromLine).foreach(_ => { reader.readLine(); lineNo += 1 })

      override def next(): Boolean = {
        while (lineNo < p.untilLine) {
          line = reader.readLine()
          if (line == null) return false
          emittedAt = lineNo
          lineNo += 1
          // S3: filter BEFORE decode; the position still advances past
          // filtered statements (canal.go:243-280 semantics).
          val key = CdcSource.dbTableOf(line)
          if (pattern.forall(_.matcher(key).find())) return true
        }
        false
      }

      override def get(): InternalRow =
        InternalRow(
          UTF8String.fromString(line),
          UTF8String.fromString(Paths.get(p.file).getFileName.toString),
          p.globalBase + emittedAt,
          UTF8String.fromString(CdcSource.dbTableOf(line)))

      override def close(): Unit = reader.close()
    }
  }
}
