package graft.source

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming._
import org.apache.spark.unsafe.types.UTF8String

/** Persistent blocking-dump mode for the replication source (option
  * `connection=persistent`) — the ops shape of the reference: canal holds ONE
  * long-lived connection with a BLOCKING `COM_BINLOG_DUMP` and a 30 s
  * heartbeat (`/root/reference/src/config/canal.toml` `heartbeat_period`),
  * where the default non-blocking mode re-dials per micro-batch (correct,
  * but a 1-second trigger means ~2 connections/sec against the primary
  * forever — the first thing a DBA notices).
  *
  * Shape: one driver-side reader thread owns the connection and decodes the
  * event stream into a BOUNDED buffer of (globalPos, file, line); when the
  * buffer is full the thread blocks, TCP backpressure reaches the server —
  * the reference's bounded-queue admission, end to end. Micro-batches drain
  * the buffer: `latestOffset` promises what is buffered, partitions carry
  * their lines, `commit` prunes below the committed offset (until then
  * entries stay buffered, so an uncommitted batch replays identically).
  * The binlog is inherently ONE ordered event sequence — the reference's
  * single canal loop — so a single reader is not a scale compromise;
  * parallelism belongs to the stages above, and the default per-batch
  * mode remains for workloads where re-dialing is cheaper than holding a
  * connection.
  *
  * Offsets are the same global byte positions as [[ReplMicroBatchStream]]
  * (checkpoints are interchangeable between the two modes). ROTATE events
  * advance the (file, base) bookkeeping, so the stream follows rotation
  * without ever re-listing the server; the one `SHOW BINARY LOGS` at reader
  * start anchors the global position of the dump's first file. A dead
  * connection (EOF, timeout past 2× the heartbeat period, server error)
  * fails the stream loudly — Spark's query restart re-dials from the
  * checkpoint, the same recovery path as every other failure. */
object PersistentDump {

  /** Map a global byte position into the pinned file sequence:
    * (file, inFilePos, fileGlobalBase). A position at or past the end of the
    * listing maps into the ACTIVE (last) file — the live tail. */
  def locate(files: Seq[(String, Long)], pos: Long): (String, Long, Long) = {
    require(files.nonEmpty, "empty binlog listing — is the binlog enabled?")
    var base = 0L
    files.foreach { case (name, sz) =>
      if (pos < base + sz) return (name, pos - base, base)
      base += sz
    }
    val (name, sz) = files.last
    (name, pos - (base - sz), base - sz)
  }
}

/** The long-lived reader: one connection, one blocking dump, one bounded
  * buffer. `startPos` is the global offset to dump from; `files0` the
  * listing it is measured against (checkpoint-pinned sizes merged with a
  * fresh `SHOW BINARY LOGS`). */
final class PersistentDumpReader(conf: ReplConfig, startPos: Long,
                                 files0: Seq[(String, Long)], bufferCap: Int,
                                 heartbeatSecs: Int,
                                 /** gtid_executed as of `startPos` (from the
                                   * checkpoint / startGtid option): the base
                                   * the streamed GTID events accumulate onto,
                                   * exactly how a real replica maintains its
                                   * own executed set. */
                                 gtid0: GtidSet = GtidSet.Empty,
                                 /** Transaction open at `startPos` (from the
                                   * checkpoint): its GTID header is BEHIND
                                   * the dump start, so without this seed its
                                   * re-dumped commit marker would fold
                                   * nothing and the id would hole the stamp
                                   * forever. */
                                 pending0: Option[(String, Long)] = None) extends AutoCloseable {

  /** (lineGlobalStartPos, safeEndPosAfterIt, fileName, line). `safe` is a
    * position a future COM_BINLOG_DUMP may start from: the end of this
    * emitted event. */
  private final case class Entry(pos: Long, safe: Long, file: String, line: String)

  private val lock = new Object
  private val buf = new util.ArrayDeque[Entry]()
  /** Largest safe restart position buffered so far (≥ startPos always). */
  private var highWater: Long = startPos
  /** Global position the reader has READ through — advances on every real
    * event, emitting or not. highWater can lag this forever (a tail of
    * FORMAT_DESCRIPTION / PREVIOUS_GTIDS / STOP events emits nothing); the
    * AvailableNow drain bounds its wait on THIS, not on highWater. */
  private var readPos: Long = startPos
  /** Heartbeats received — a heartbeat means the server had nothing pending,
    * i.e. everything below the live tail has been sent. */
  private var beats: Long = 0L
  /** Every file the dump has touched → its size as far as seen (final for
    * rotated-away files, monotone-growing for the active one). Checkpoints
    * carry this, so a restart can map its global position even if the
    * server has since purged files the original listing knew. */
  private val filesSeen = scala.collection.mutable.LinkedHashMap[String, Long](files0: _*)
  /** Executed-set bookkeeping (operator S1's `OnGTID`, made useful): the
    * accumulated set, the in-flight transaction's id (folded in when its
    * commit marker arrives), and per-safe-position snapshots so an offset
    * promised at position P is stamped with EXACTLY the transactions whose
    * commit landed at-or-before P — never a later transaction's id, which a
    * failover resume would then wrongly skip. Snapshots are pruned with the
    * buffer on commit.
    *
    * Each snapshot ALSO records the transaction open at that position
    * (`pending`): promised offsets are emitted-event ends and can land
    * INSIDE a transaction (after a row event, before its XID; after a DDL
    * query, before the next header that folds it). An offset committed
    * there and restarted from would re-dump past the transaction's GTID
    * header — without the carried pending id the commit marker would fold
    * nothing and the id would be missing from every later stamp (a
    * permanent hole that makes a failover resume re-request — or with
    * other holes mis-claim — history). The checkpoint carries the pending
    * id back in ([[ReplOffset.pending]]), `pending0` re-seeds it, and the
    * re-dumped commit marker folds it exactly: binlog transactions never
    * interleave, so the first marker after a mid-transaction start always
    * belongs to the seeded transaction. */
  private var gtidApplied: GtidSet = gtid0
  private var gtidPending: Option[(String, Long)] = pending0
  private final case class Snap(applied: GtidSet, pending: Option[(String, Long)])
  private val gtidSnaps = new java.util.TreeMap[Long, Snap]()
  if (!gtid0.isEmpty || pending0.isDefined)
    gtidSnaps.put(startPos, Snap(gtid0, pending0))
  private var failure: Throwable = _
  @volatile private var closed = false

  private val client = new ReplicationClient(conf.host, conf.port, conf.user,
    conf.password, conf.serverId + 1, // dump id ≠ the metadata connection's id
    conf.tls)

  private val thread = new Thread(() => run(), s"graft-repl-dump-${conf.host}:${conf.port}")
  thread.setDaemon(true)
  thread.start()

  private def run(): Unit =
    try {
      val (file0, inFile0, base0) = PersistentDump.locate(files0, startPos)
      client.connect()
      client.negotiateChecksum()
      client.setHeartbeatPeriod(heartbeatSecs)
      client.registerSlave()
      // idle reads are bounded by the heartbeat: 2 missed beats = dead link
      client.soTimeout(heartbeatSecs * 2000 + 5000)
      client.dump(file0, math.max(4L, inFile0), nonBlocking = false)

      var file = file0
      var base = base0
      var lastEnd = math.max(4L, inFile0)
      var decoder = new BinlogEventDecoder(base, s"${conf.host}:${conf.port}/$file", conf.attachRowsQuery)

      while (!closed) {
        val ev = client.nextEvent()
        if (ev == null) // blocking dumps never EOF; the server ended us
          throw new java.io.EOFException(
            s"${conf.host}:${conf.port} ended the blocking dump (server " +
              "shutdown or a duplicate server_id) — restart the query to re-dial")
        val head = util.Arrays.copyOfRange(ev, 0, 19)
        val body = util.Arrays.copyOfRange(ev, 19, ev.length)
        val etype = head(4) & 0xff
        val eventSize = MysqlWire.leAt(head, 9, 4)
        val logPos = MysqlWire.leAt(head, 13, 4)

        if (etype == BinlogWire.ROTATE_EVENT && logPos > 0) {
          // real rotation: the old file ends at this event's end; the stream
          // continues into the payload's next-file name. No re-listing —
          // the dump itself is the authority on the sequence.
          val window = lastEnd & ~0xffffffffL
          var end = window | logPos
          if (end + 0x80000000L < lastEnd) end += 0x100000000L
          lastEnd = math.max(lastEnd, end)
          record(file, lastEnd) // the old file's FINAL size
          base += lastEnd
          val c = new BinlogWire.Cursor(body, 0)
          c.skip(8) // next-file start pos (always 4)
          val nameLen = body.length - 8 - (if (decoder.isChecksummed) 4 else 0)
          file = c.str(nameLen)
          lastEnd = 4L
          record(file, 4L)
          decoder = new BinlogEventDecoder(base, s"${conf.host}:${conf.port}/$file", conf.attachRowsQuery)
          advance(base + 4) // a file start is a valid dump position
          progressed(base + 4)
        } else if (etype == BinlogWire.HEARTBEAT_EVENT) {
          // liveness only; but a heartbeat is also the server saying "nothing
          // pending" — the AvailableNow drain uses that as exhaustion proof
          beat()
        } else if (logPos != 0) {
          val window = lastEnd & ~0xffffffffL
          var end = window | logPos
          if (etype == BinlogWire.FORMAT_DESCRIPTION_EVENT) {
            // re-sent at dump start with its true (small) log_pos — decode
            // for side effects, don't move the window
            decoder.decode(head, body, math.max(end - eventSize, 0L))
          } else {
            if (end + 0x80000000L < lastEnd) end += 0x100000000L // 4 GiB wrap
            // log_pos < eventSize marks an artificial event ONLY when the
            // reconstructed start stays implausible (before the file magic):
            // an event whose true end lands within eventSize bytes past a
            // 4 GiB multiple wraps into [0, eventSize) too, and must be kept.
            if (end - eventSize < 4L) {
              decoder.decode(head, body, 0L) // artificial: side effects only
            } else {
              lastEnd = math.max(lastEnd, end)
              record(file, lastEnd)
              val eventStart = end - eventSize
              val line = decoder.decode(head, body, math.max(eventStart, 0L))
              val globalStart = base + eventStart
              progressed(base + end) // reader position: advances on EVERY real
              // event, emitting or not (the AvailableNow drain bound)
              if (etype == BinlogWire.GTID_EVENT) {
                // a new transaction header proves the previous one is fully
                // streamed — fold a pending id that had no XID (DDL) here
                gtidFold(base + eventStart)
                lock.synchronized {
                  gtidPending = Some(BinlogWire.parseGtid(body))
                  // snapshot the OPEN transaction at the header's end: any
                  // offset promised inside the transaction body floors here
                  // and carries the pending id to its checkpoint
                  gtidSnaps.put(base + end, Snap(gtidApplied, gtidPending))
                }
              } else if (etype == BinlogWire.PREVIOUS_GTIDS_EVENT) {
                lock.synchronized {
                  gtidApplied = gtidApplied.union(GtidSet.decode(body))
                  gtidSnaps.put(base + end, Snap(gtidApplied, gtidPending))
                }
              } else if (etype == BinlogWire.XID_EVENT) {
                gtidFold(base + end) // commit marker: the txn is applied HERE
              }
              if (line != null && globalStart >= startPos)
                put(Entry(globalStart, base + end, file, line))
              else if (etype == BinlogWire.XID_EVENT)
                advance(base + end) // commit marker: safe even with no line
            }
          }
        } else {
          // artificial event (log_pos 0): side effects only
          decoder.decode(head, body, 0L)
        }
      }
    } catch {
      case _: Exception if closed => () // shutdown races are not failures
      case e: Throwable => lock.synchronized { failure = e; lock.notifyAll() }
    } finally client.close()

  private def put(e: Entry): Unit = lock.synchronized {
    while (buf.size >= bufferCap && !closed) lock.wait(1000)
    if (!closed) { buf.add(e); highWater = math.max(highWater, e.safe); lock.notifyAll() }
  }

  private def advance(safe: Long): Unit = lock.synchronized {
    highWater = math.max(highWater, safe); lock.notifyAll()
  }

  private def progressed(pos: Long): Unit = lock.synchronized {
    readPos = math.max(readPos, pos); lock.notifyAll()
  }

  private def beat(): Unit = lock.synchronized { beats += 1; lock.notifyAll() }

  private def record(name: String, size: Long): Unit = lock.synchronized {
    filesSeen(name) = math.max(size, filesSeen.getOrElse(name, 0L))
  }

  /** Fold the in-flight transaction's id into the executed set, snapshotting
    * at `at` — the position its commit landed. Folding happens at the XID
    * marker (exact) or at the NEXT transaction's GTID header (DDL has no
    * XID; its id lands one header late, which can only make a failover
    * resume REPLAY the DDL, never skip it — the at-least-once direction). */
  private def gtidFold(at: Long): Unit = lock.synchronized {
    gtidPending.foreach { case (sid, gno) =>
      gtidApplied = gtidApplied.add(sid, gno)
      gtidSnaps.put(at, Snap(gtidApplied, None))
    }
    gtidPending = None
  }

  /** (gtid_executed, open transaction) as of global position `pos` — the
    * largest snapshot at or below it (None before any gtid activity when no
    * seed was given). The applied set is None while still empty. */
  def gtidStateAt(pos: Long): Option[(Option[String], Option[(String, Long)])] =
    lock.synchronized {
      Option(gtidSnaps.floorEntry(pos)).map { e =>
        val s = e.getValue
        (if (s.applied.isEmpty) None else Some(s.applied.toString), s.pending)
      }
    }

  /** The dump's view of the file sequence — listing-at-dial plus every file
    * it has streamed through, sizes as far as seen. */
  def fileSizes(): Seq[(String, Long)] = lock.synchronized(filesSeen.toSeq)

  private def throwIfFailed(): Unit = {
    val f = lock.synchronized(failure)
    if (f != null) throw new java.io.IOException("replication dump died", f)
  }

  /** Largest committed-safe offset currently buffered. */
  def buffered(): Long = lock.synchronized { throwIfFailed(); highWater }

  /** Entries with start position in [from, until) — a PEEK: entries stay
    * buffered until [[prune]] so an uncommitted batch replays identically. */
  def slice(from: Long, until: Long): Array[(Long, String, String)] = lock.synchronized {
    throwIfFailed()
    val out = Array.newBuilder[(Long, String, String)]
    buf.forEach { e => if (e.pos >= from && e.pos < until) out += ((e.pos, e.file, e.line)) }
    out.result()
  }

  /** Admission control in SAFE units: the largest buffered safe position
    * whose entry STARTS within [from, from + budget) — always at least one
    * entry ahead when anything is buffered, so an undersized budget cannot
    * stall the stream; `from` when the buffer holds nothing in range. */
  def boundedSafe(from: Long, budget: Long): Long = lock.synchronized {
    throwIfFailed()
    var best = from
    var first = true
    val limit = if (budget >= Long.MaxValue - from) Long.MaxValue else from + budget
    buf.forEach { e =>
      if (e.pos >= from && (first || e.pos < limit)) {
        best = math.max(best, e.safe); first = false
      }
    }
    best
  }

  /** Block until the buffer covers `pos` (restart replay of a batch planned
    * in a previous life: the WAL's end offset must become available again
    * before partitions can be built). */
  def awaitCovered(pos: Long, timeoutMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    lock.synchronized {
      while (highWater < pos) {
        throwIfFailed()
        val left = deadline - System.currentTimeMillis()
        require(left > 0, s"timed out waiting for the dump to reach offset $pos " +
          s"(at $highWater after ${timeoutMs} ms)")
        lock.wait(math.min(left, 1000))
      }
    }
  }

  /** AvailableNow drain wait: block until the dump has buffered something
    * past `from`, OR it is provably exhausted below `readTarget` — the
    * reader has READ through the target (everything below the pin was
    * non-emitting: a freshly rotated file's FORMAT_DESCRIPTION +
    * PREVIOUS_GTIDS, a trailing STOP) or a heartbeat arrived (the server had
    * nothing pending at all). Without the exhaustion exits, a pin landing on
    * a non-emitting tail would block the full timeout and then FAIL a drain
    * that should complete empty. */
  def awaitProgress(from: Long, readTarget: Long, timeoutMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    lock.synchronized {
      val beats0 = beats
      while (highWater <= from && readPos < readTarget && beats == beats0) {
        throwIfFailed()
        val left = deadline - System.currentTimeMillis()
        require(left > 0, s"timed out waiting for the dump to progress past " +
          s"$from (read position $readPos, target $readTarget, " +
          s"after ${timeoutMs} ms)")
        lock.wait(math.min(left, 1000))
      }
    }
  }

  /** Drop entries below the committed offset; the reader unblocks if the
    * buffer was full. */
  def prune(until: Long): Unit = lock.synchronized {
    while (!buf.isEmpty && buf.peekFirst().pos < until) buf.removeFirst()
    // keep the floor snapshot (it stamps future offsets ≥ until); drop older
    val keep = gtidSnaps.floorEntry(until)
    if (keep != null) gtidSnaps.headMap(keep.getKey, false).clear()
    lock.notifyAll()
  }

  override def close(): Unit = {
    closed = true
    lock.synchronized(lock.notifyAll())
    client.close() // unblocks the reader's socket read
  }
}

/** Micro-batch planner over a [[PersistentDumpReader]]. Same offset unit and
  * checkpoint format as [[ReplMicroBatchStream]] — the two modes are
  * interchangeable restarts of the same stream. */
class PersistentReplStream(conf: ReplConfig, filter: Option[String],
                           maxBytesPerTrigger: Option[Long],
                           startOffset: Option[ReplOffset] = None,
                           bufferCap: Int = 10000,
                           heartbeatSecs: Int = 30,
                           /** First-start gtid_executed (option `startGtid`):
                             * locate the start position by GTID instead of
                             * file/pos — the MASTER_AUTO_POSITION shape, and
                             * the only resume unit that survives a failover
                             * to a new primary. Only consulted when no
                             * checkpoint exists. */
                           startGtid: Option[String] = None,
                           /** `gtidLocate=server`: resolve `startGtid` via
                             * the server's own COM_BINLOG_DUMP_GTID walk
                             * instead of client-side prologue probes. */
                           serverLocate: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val sizes = scala.collection.mutable.LinkedHashMap[String, Long]()
  private var reader: PersistentDumpReader = _
  private var availableNowRequested = false
  private var availableNowTarget: Option[Long] = None
  /** Latest known executed set (start option / checkpoint / reader), so an
    * offset is never stamped with LESS than what an earlier one carried. */
  private var lastGtid: Option[String] = None
  /** Transaction open at the latest stamped offset (reader-exact when a
    * snapshot covers the position). */
  private var lastPending: Option[(String, Long)] = None
  /** Restored offsets by position: the reader must be seeded with the gtid
    * state of the offset it dials FROM. Seeding the pending id from a
    * mismatched (later) offset would fold it at the wrong marker and
    * over-claim a still-open transaction — the skip-on-failover direction —
    * so pending is only ever taken position-matched. */
  private val restoredAt =
    scala.collection.mutable.Map[Long, (Option[String], Option[(String, Long)])]()
  /** Last known server identity (checkpoint-carried or observed at dial). */
  private var knownUuid: Option[String] = None

  private def seed(files: Seq[(String, Long)]): Unit = synchronized {
    files.foreach { case (n, s) => sizes(n) = math.max(s, sizes.getOrElse(n, 0L)) }
  }

  /** Dial once, lazily, from the stream's true start: the restored offset
    * reaches us via latestOffset/planInputPartitions after checkpoint
    * restore, never at construction. */
  private def readerFor(startPos: Long): PersistentDumpReader = synchronized {
    if (reader == null) {
      val (liveUuid, live) = conf.listWithUuid()
      // Failover detection ([[BinlogLineage]]): a checkpointed position is
      // measured against a file sequence this server does not have —
      // resuming by pos would re-stream the new primary's retained history
      // in full. Fail with the GTID recovery path, not silent duplication.
      if (startPos > 0)
        BinlogLineage.check(sizes.keySet.toSet, knownUuid, live, liveUuid,
          s"${conf.host}:${conf.port}", startGtidHint = lastGtid)
      knownUuid = liveUuid.orElse(knownUuid)
      seed(live) // ONE metadata listing, at dial time only
      val at = restoredAt.get(startPos)
      reader = new PersistentDumpReader(conf, startPos, sizes.toSeq, bufferCap,
        heartbeatSecs,
        gtid0 = at.flatMap(_._1).orElse(lastGtid)
          .map(GtidSet.parse).getOrElse(GtidSet.Empty),
        pending0 = at.flatMap(_._2))
    }
    reader
  }

  override def initialOffset(): Offset = {
    val o = startOffset.map { o => seed(o.files); o }
      .orElse(startGtid.map { g =>
        // no checkpoint, GTID start: locate against the CURRENT primary
        val set = GtidSet.parse(g)
        val located =
          if (serverLocate) GtidLocator.locateAuto(conf, set)
          else GtidLocator.locate(conf, set)
        seed(located.files)
        located.copy(gtid = Some(set.toString))
      })
      .getOrElse(ReplOffset(0L, Nil))
    synchronized {
      lastGtid = o.gtid.orElse(lastGtid); knownUuid = o.suuid.orElse(knownUuid)
      restoredAt(o.pos) = (o.gtid, o.pendingPair)
    }
    o
  }

  override def deserializeOffset(json: String): Offset = {
    val o = ReplOffset.parse(json)
    seed(o.files)
    synchronized {
      lastGtid = o.gtid.orElse(lastGtid); knownUuid = o.suuid.orElse(knownUuid)
      restoredAt(o.pos) = (o.gtid, o.pendingPair)
    }
    o
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = ReplOffset.posOf(start)
    val r = readerFor(from)
    val target = synchronized {
      if (availableNowRequested && availableNowTarget.isEmpty)
        availableNowTarget = Some(sizes.values.sum) // the dial-time tail
      availableNowTarget
    }
    // what the dump has buffered, bounded by the AvailableNow pin and the
    // byte budget; every promised offset is a buffered SAFE position (an
    // event end a future dump can start from), never an arbitrary byte.
    // Under AvailableNow the wrapper stops as soon as the source reports no
    // progress toward the pinned target — but "no progress" here usually
    // means the dump thread simply hasn't buffered yet (it dials on the
    // FIRST latestOffset call). Returning `from` then would end the drain
    // EMPTY, so block until the dump advances past `from` — or until it is
    // provably exhausted below the pin (the bytes there were non-emitting
    // events, or an idle heartbeat arrived), in which case the drain
    // completes at `from` instead of timing out.
    target.foreach(t => if (t > from && r.buffered() <= from) r.awaitProgress(from, t, 120000))
    var until = target.fold(r.buffered())(t => math.min(r.buffered(), t))
    maxBytesPerTrigger.foreach { b =>
      if (b < until - from) until = math.min(until, r.boundedSafe(from, b))
    }
    seed(r.fileSizes()) // checkpoints carry the dump's own file view
    val end = math.max(from, until)
    val (g, u, p) = synchronized {
      r.gtidStateAt(end) match {
        case Some((applied, pending)) =>
          lastGtid = applied.orElse(lastGtid); lastPending = pending
        case None => // no gtid activity at-or-below end; carry what we know
      }
      (lastGtid, knownUuid, lastPending)
    }
    ReplOffset(end, synchronized(sizes.toSeq), g, u, ReplOffset.encodePending(p))
  }

  override def prepareForTriggerAvailableNow(): Unit =
    synchronized { availableNowRequested = true }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = ReplOffset.posOf(start)
    val until = ReplOffset.posOf(end)
    if (until <= from) return Array.empty
    val r = readerFor(from)
    r.awaitCovered(until, timeoutMs = 120000) // restart replay: re-buffer first
    Array(BufferedLinesPartition(r.slice(from, until), filter))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BufferedLinesReaderFactory

  override def commit(end: Offset): Unit =
    synchronized { if (reader != null) reader.prune(ReplOffset.posOf(end)) }

  override def stop(): Unit = synchronized { if (reader != null) reader.close() }
}

/** Lines ship inside the partition (driver-buffered mode): the blocking dump
  * is a single ordered socket owned by the driver thread, and a micro-batch's
  * slice rides the task like any serialized split. Bounded by `bufferCap` ×
  * line size and `maxBytesPerTrigger` — the low-rate ops mode by design; the
  * per-batch dump mode remains the bulk path. */
case class BufferedLinesPartition(lines: Array[(Long, String, String)],
                                  filter: Option[String]) extends InputPartition

class BufferedLinesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BufferedLinesPartition]
    val pattern = p.filter.map(java.util.regex.Pattern.compile)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = {
        // S3 semantics: filter before decode, positions advance regardless
        i += 1
        while (i < p.lines.length &&
            !pattern.forall(_.matcher(CdcSource.dbTableOf(p.lines(i)._3)).find())) i += 1
        i < p.lines.length
      }
      override def get(): InternalRow = {
        val (pos, file, line) = p.lines(i)
        InternalRow(UTF8String.fromString(line), UTF8String.fromString(file),
          pos, UTF8String.fromString(CdcSource.dbTableOf(line)))
      }
      override def close(): Unit = ()
    }
  }
}
