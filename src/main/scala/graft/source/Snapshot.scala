package graft.source

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** Consistent initial snapshot over the live replication connection — the
  * replication-mode slice of operator S2, the semantics of canal's `tryDump`
  * (`/root/reference/vendor/src/github.com/siddontang/go-mysql/canal/canal.go:169-218`:
  * a mysqldump-style full read before tailing, so stream = snapshot ∪ tail).
  *
  * The mysqldump `--single-transaction --master-data` discipline, speaking
  * only public SQL over the existing [[ReplicationClient]] text-resultset
  * path:
  *
  *  1. `FLUSH TABLES WITH READ LOCK` — writes blocked (milliseconds);
  *  2. `SHOW MASTER STATUS` + `SHOW BINARY LOGS` — pin the exact (file, pos)
  *     and the file-size sequence it maps into (the DSv2 global offset);
  *  3. `START TRANSACTION WITH CONSISTENT SNAPSHOT` under REPEATABLE READ —
  *     an MVCC read view of precisely the pinned moment;
  *  4. table schemas (`SHOW FULL COLUMNS`) — read UNDER the lock, because
  *     DDL is not transactional: a post-unlock ALTER would otherwise be
  *     baked into the base schema AND replayed from the stream;
  *  5. `UNLOCK TABLES` — writes resume while the data is read;
  *  6. `SELECT *` per table inside the transaction, each row spooled as an
  *     `action=insert` positional wire line — the same bytes the decode /
  *     envelope / fan-out pipeline already consumes.
  *
  * The seam is exact by construction: every row committed before the pin is
  * in the snapshot's read view; every row committed after it is in the
  * binlog at a position ≥ the pin, where the stream starts. No duplicates,
  * no gaps.
  *
  * Scale: the dump is one connection, like the reference's mysqldump shell-
  * out — the source database's own bottleneck, not Spark's. Rows stream
  * packet-by-packet ([[ReplicationClient.queryForeach]]) into per-table
  * spool files, so memory stays bounded at one row; Spark then reads the
  * spool as an ordinary parallel batch. (The mydumper-style upgrade — FTWRL
  * held while N worker connections each open their own consistent snapshot,
  * then per-table/PK-range parallel SELECTs — slots in here without touching
  * the pipeline: it only changes how spool files are produced.)
  */
object Snapshot {

  /** Snapshot rows need `stmt_seq`s that decode under the BASE schema version
    * on every (re)play, even after the stream has applied later ALTERs to
    * the registry: sequences from this negative base are below any real
    * binlog position (≥ 0) and any ALTER's `sinceSeq`, while the base
    * version's `Long.MinValue` still covers them. */
  val SeqBase: Long = Long.MinValue / 2

  /** Per-table stmt_seq stride: table i's rows start at SeqBase + i*stride,
    * so the serial and parallel dumps assign IDENTICAL sequences (and the
    * total order — table order, then row order — matches the serial dump's).
    * 2^40 rows per table, ~4M tables before the range touches zero. */
  val TableSeqStride: Long = 1L << 40
  /** Within a table, chunk c starts at tableBase + c*stride: 2^28 rows per
    * chunk, 4096 chunks per table. */
  val ChunkSeqStride: Long = 1L << 28

  /** The pinned stream start: (file, pos) from SHOW MASTER STATUS plus the
    * SHOW BINARY LOGS listing it was measured against. */
  final case class Pinned(file: String, pos: Long, files: Seq[(String, Long)]) {
    /** Global byte position (the DSv2 offset unit): sizes of the files
      * BEFORE the pinned one in sequence order, plus the in-file pos. */
    def globalPos: Long = {
      val idx = files.indexWhere(_._1 == file)
      require(idx >= 0,
        s"pinned binlog $file missing from SHOW BINARY LOGS (${files.map(_._1)})")
      files.take(idx).map(_._2).sum + pos
    }

    /** The stream's initial offset: start at the pin, with the listing the
      * position was measured against carried for restart stability. */
    def offset: ReplOffset = ReplOffset(globalPos, files)
  }

  /** Steps 1–5: pin the position and register every table's base schema
    * under the same write-blocked moment. Returns the pin and the tables
    * registered. `withDataTxn` additionally opens the consistent-snapshot
    * transaction (step 3) so a subsequent [[dumpToSpool]] on the SAME
    * connection reads the pinned read view.
    *
    * FTWRL needs the RELOAD privilege; if the server refuses, the bootstrap
    * proceeds UNLOCKED — correct unless DDL executes during the metadata
    * reads themselves (the reference's canal accepts the same race on its
    * on-demand schema fetch). */
  /** `FLUSH TABLES WITH READ LOCK`. Only a server-side privilege refusal may
    * degrade to the unlocked path (1227 ER_SPECIFIC_ACCESS_DENIED / 1045
    * ER_ACCESS_DENIED). Anything else — a dead connection, a timeout, an
    * unrelated server error — must surface HERE, not as a misleading failure
    * from the SHOW MASTER STATUS that follows. Returns whether the lock is
    * held; shared by [[pin]] and [[pinParallel]] so the privilege whitelist
    * cannot diverge between the serial and parallel bootstrap paths. */
  private def acquireFtwrl(c: ReplicationClient): Boolean =
    try { c.query("FLUSH TABLES WITH READ LOCK"); true }
    catch {
      case e: MysqlWire.MysqlServerError if e.code == 1227 || e.code == 1045 =>
        false
    }

  /** SHOW MASTER STATUS + SHOW BINARY LOGS → the pin; fails loudly when the
    * binlog is off or the status row is unparsable. */
  private def readPin(c: ReplicationClient): Pinned = {
    val status = c.query("SHOW MASTER STATUS")
    require(status.nonEmpty && status.head.size >= 2 && status.head(0).isDefined,
      "SHOW MASTER STATUS returned nothing — is the binlog enabled " +
        "(log_bin) on this server?")
    Pinned(status.head(0).get, status.head(1).flatMap(_.toLongOption)
      .getOrElse(throw new IllegalStateException(
        s"unparsable SHOW MASTER STATUS position: ${status.head}")), c.binaryLogs())
  }

  def pin(c: ReplicationClient, registry: graft.cdc.SchemaRegistry,
          withDataTxn: Boolean,
          includeDb: String => Boolean = db => !SchemaBootstrap.SystemDbs.contains(db))
      : (Pinned, Seq[(String, String)]) = {
    val locked = acquireFtwrl(c)
    try {
      val pinned = readPin(c)
      if (withDataTxn) {
        c.query("SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ")
        c.query("START TRANSACTION WITH CONSISTENT SNAPSHOT")
      }
      val tables = SchemaBootstrap.fromServer(c, registry, includeDb)
      (pinned, tables)
    } finally if (locked) {
      // best-effort: if the pin itself failed on a dead connection, the
      // UNLOCK fails too — surfacing THAT would mask the original error
      // (and the server drops the lock with the session anyway)
      scala.util.Try(c.query("UNLOCK TABLES"))
      ()
    }
  }

  /** mydumper-style parallel bootstrap: [[pin]]'s discipline with `workers`
    * EXTRA connections, each opening its OWN consistent-snapshot transaction
    * while the FTWRL is still held — writes are blocked, so every worker's
    * MVCC read view is the same pinned moment, and after UNLOCK they drain
    * tables (and PK ranges) in parallel. This is how a 100 GB-per-table
    * bootstrap stops being bottlenecked on one connection: the source
    * server's parallel read capacity becomes the limit, not the protocol.
    *
    * Returns the pin, the registered tables, and the worker connections
    * (transactions OPEN — hand them to [[dumpToSpoolParallel]], which
    * commits and closes them). */
  def pinParallel(c: ReplicationClient, mkWorker: () => ReplicationClient,
                  registry: graft.cdc.SchemaRegistry, workers: Int,
                  includeDb: String => Boolean = db => !SchemaBootstrap.SystemDbs.contains(db))
      : (Pinned, Seq[(String, String)], Seq[ReplicationClient]) = {
    require(workers >= 1, s"workers must be >= 1, got $workers")
    val locked = acquireFtwrl(c)
    // The parallel dump's consistency PROOF is the FTWRL: all N worker read
    // views open while writes are blocked, so they are the same moment. With
    // the lock refused, N>1 views would open at DIFFERENT moments while
    // writes continue — an internally inconsistent dump with no warning.
    // Degrade to ONE worker transaction: a single MVCC read view is
    // self-consistent (the same guarantee the serial unlocked fallback
    // gives), it just loses the parallelism.
    val effectiveWorkers =
      if (locked || workers == 1) workers
      else {
        System.err.println(
          s"[graft-snapshot] FTWRL refused (no RELOAD privilege): degrading " +
            s"parallel bootstrap from $workers workers to 1 single-view " +
            "transaction; grant RELOAD to restore parallel dump consistency")
        1
      }
    val opened = scala.collection.mutable.ArrayBuffer[ReplicationClient]()
    try {
      val pinned = readPin(c)
      (1 to effectiveWorkers).foreach { _ =>
        val w = mkWorker()
        opened += w
        w.query("SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ")
        w.query("START TRANSACTION WITH CONSISTENT SNAPSHOT")
      }
      val tables = SchemaBootstrap.fromServer(c, registry, includeDb)
      (pinned, tables, opened.toSeq)
    } catch {
      case e: Throwable =>
        opened.foreach(w => scala.util.Try(w.close()))
        throw e
    } finally if (locked) {
      scala.util.Try(c.query("UNLOCK TABLES"))
      ()
    }
  }

  /** A unit of parallel dump work: one table, or one PK range of it.
    * `where` is empty for whole-table units; `file` is the spool file the
    * unit owns exclusively. */
  private final case class DumpUnit(db: String, table: String, where: String,
                                    file: String, seqBase: Long)

  /** The first column of the table's PRIMARY KEY when it is a single
    * integer column — the chunkable case. `SHOW FULL COLUMNS` carries the
    * Key marker in its 5th column. */
  private def integerPk(c: ReplicationClient, db: String, table: String): Option[String] = {
    val cols = c.query(s"SHOW FULL COLUMNS FROM `$db`.`$table`")
    val pri = cols.filter(_.lift(4).flatten.contains("PRI"))
    pri match {
      case Seq(only) if only.headOption.flatten.isDefined &&
        only.lift(1).flatten.exists(t =>
          Seq("int", "bigint", "mediumint", "smallint", "tinyint")
            .exists(t.toLowerCase.startsWith)) => only.head
      case _ => None // composite or non-integer PK: dump whole-table
    }
  }

  /** Step 6, parallel: drain the tables over the worker connections
    * [[pinParallel]] opened. Tables with a single integer-PK column and a
    * key span wider than `chunkRows` are split into PK ranges (mydumper's
    * chunking), each range an independent unit any worker may execute —
    * every worker sees the same pinned read view, so placement is free.
    * Commits and closes the workers. Returns rows spooled. */
  /** Remove any *.jsonl / *.tmp left by a PREVIOUS dump attempt. A crash
    * before the pin marker re-runs the whole bootstrap, and the new dump's
    * file-name set can differ (chunk count depends on the key span and
    * worker/chunk settings) — stale files from the failed attempt would
    * otherwise survive and be fed to the sinks as ghost rows by the engine's
    * spool listing. */
  private def clearSpool(spoolDir: Path): Unit = {
    if (!Files.exists(spoolDir)) return
    import scala.jdk.CollectionConverters._
    val s = Files.list(spoolDir)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".jsonl") || p.toString.endsWith(".tmp"))
      .foreach(p => Files.deleteIfExists(p))
    finally s.close()
  }

  /** For a PIN-ONLY bootstrap (no data dump): remove any dump artifacts a
    * previous snapshot attempt left in the directory — spool files AND the
    * `_spooled` marker. The new pin invalidates an older dump's read view;
    * leaving its files behind would let a later snapshot-enabled run replay
    * them against this pin as ghost rows from a different moment. */
  def clearStaleDump(spoolDir: Path): Unit = {
    clearSpool(spoolDir)
    if (Files.exists(spoolDir)) Files.deleteIfExists(spoolDir.resolve("_spooled"))
    ()
  }

  def dumpToSpoolParallel(tables: Seq[(String, String)],
                          workerConns: Seq[ReplicationClient],
                          spoolDir: Path, ts: Long,
                          chunkRows: Long = 1L << 20): Long = {
    Files.createDirectories(spoolDir)
    clearSpool(spoolDir)
    require(tables.size < (SeqBase.abs / TableSeqStride),
      s"too many tables for the snapshot seq range: ${tables.size}")
    require(chunkRows > 0 && chunkRows <= ChunkSeqStride,
      s"chunkRows must be in (0, $ChunkSeqStride], got $chunkRows")
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()

    // Phase 1 (parallel over tables): discover chunkable PKs + key spans,
    // emit units. MIN/MAX run inside the snapshot txns — consistent.
    val tableQueue = new java.util.concurrent.ConcurrentLinkedQueue[((String, String), Int)]()
    tables.zipWithIndex.foreach(tableQueue.add)
    val units = new java.util.concurrent.ConcurrentLinkedQueue[DumpUnit]()
    def discover(c: ReplicationClient): Unit = {
      var t = tableQueue.poll()
      while (t != null && failure.get() == null) {
        val ((db, table), idx) = t
        val base = SeqBase + idx * TableSeqStride
        integerPk(c, db, table) match {
          case Some(pk) =>
            val mm = c.query(
              s"SELECT MIN(`$pk`), MAX(`$pk`) FROM `$db`.`$table`").headOption
            val lo = mm.flatMap(_.headOption.flatten).flatMap(_.toLongOption)
            val hi = mm.flatMap(_.lift(1).flatten).flatMap(_.toLongOption)
            (lo, hi) match {
              case (Some(l), Some(h)) if h - l + 1 > chunkRows =>
                val nChunks = math.min(((h - l) / chunkRows) + 1,
                  TableSeqStride / ChunkSeqStride)
                val span = (h - l) / nChunks + 1
                // A chunk holds at most `span` distinct integer keys, so
                // span <= ChunkSeqStride proves its row count fits the seq
                // range. A sparser key span than 4096 chunks can cover
                // (> 2^40 keys) could pack more than 2^28 rows into one
                // chunk if the keys cluster — dump such a table as a single
                // unit (bounded by the documented 2^40-rows-per-table range)
                // instead of risking seq collision with the next chunk.
                if (span > ChunkSeqStride)
                  units.add(DumpUnit(db, table, "", s"$db.$table.jsonl", base))
                else (0L until nChunks).foreach { ci =>
                  val clo = l + ci * span
                  val chi = math.min(h, clo + span - 1)
                  units.add(DumpUnit(db, table,
                    s" WHERE `$pk` >= $clo AND `$pk` <= $chi",
                    f"$db.$table.c$ci%04d.jsonl", base + ci * ChunkSeqStride))
                }
              case _ => // empty table or narrow key span: one unit
                units.add(DumpUnit(db, table, "", s"$db.$table.jsonl", base))
            }
          case None =>
            units.add(DumpUnit(db, table, "", s"$db.$table.jsonl", base))
        }
        t = tableQueue.poll()
      }
    }

    // Threads still inside discover(): drain must not EXIT on an empty unit
    // queue while any discovery is in flight — with one large table, every
    // other worker would otherwise see both queues empty (the one discoverer
    // is still running MIN/MAX) and terminate, collapsing the parallel dump
    // back to a single connection.
    val discovering = new java.util.concurrent.atomic.AtomicInteger(workerConns.size)

    // Phase 2 (parallel over units): spool. A unit owns its file; tmp+move
    // keeps partial files invisible, same as the serial path.
    def drain(c: ReplicationClient): Unit = {
      var u = units.poll()
      while ((u != null || discovering.get() > 0) && failure.get() == null) {
        if (u == null) { Thread.sleep(5); u = units.poll() }
        else {
          var seq = u.seqBase
          // Belt-and-braces for the creation-time span<=ChunkSeqStride proof:
          // a unit whose row count exceeds its seq allotment would silently
          // collide with the next chunk's (or table's) range — fail loudly.
          val seqLimit = u.seqBase + (if (u.where.nonEmpty) ChunkSeqStride else TableSeqStride)
          val tmp = spoolDir.resolve(u.file + ".tmp")
          val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
          try {
            c.queryForeach(s"SELECT * FROM `${u.db}`.`${u.table}`${u.where}") { row =>
              if (seq >= seqLimit) throw new IllegalStateException(
                s"snapshot unit ${u.file} overflowed its stmt_seq range " +
                  s"(${if (u.where.nonEmpty) ChunkSeqStride else TableSeqStride} rows)")
              val img = row.map(_.orNull).toArray
              w.write(BinlogWire.positionalLine(u.db, u.table, "insert", ts, seq,
                Seq(img), null))
              w.write("\n")
              seq += 1
              total.addAndGet(1L)
              ()
            }
          } finally w.close()
          Files.move(tmp, spoolDir.resolve(u.file),
            StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
          u = units.poll()
        }
      }
    }

    val threads = workerConns.map { c =>
      val th = new Thread(() => {
        try {
          try discover(c) finally discovering.decrementAndGet()
          drain(c)
        }
        catch { case e: Throwable => failure.compareAndSet(null, e) }
      }, "graft-snapshot-worker")
      th.setDaemon(true); th.start(); th
    }
    // No table-level barrier is needed beyond the discovering counter: unit
    // execution is placement-free (every worker shares the pinned read
    // view), so a fast thread draining early only ever executes
    // fully-formed units — it just may briefly wait for more.
    threads.foreach(_.join())
    workerConns.foreach { c =>
      scala.util.Try(c.query("COMMIT"))
      scala.util.Try(c.close())
    }
    if (failure.get() != null) throw new java.io.IOException(
      "parallel snapshot dump failed", failure.get())
    total.get()
  }

  /** Step 6: `SELECT *` each table inside the consistent-snapshot
    * transaction [[pin]] opened, spooling every row as an `action=insert`
    * positional wire line (one JSON-lines file per table, written atomically
    * via tmp+move). `SELECT *` returns columns in table-definition order —
    * the same order `SHOW FULL COLUMNS` registered, so positional decode
    * lines up by construction. Returns the number of rows spooled.
    *
    * `spoolDir` is written by the process running this call (the driver);
    * the Spark batch that later reads it runs on executors — on a
    * multi-node cluster the directory must be on a shared filesystem, the
    * same requirement Spark places on its checkpoint location. */
  def dumpToSpool(c: ReplicationClient, tables: Seq[(String, String)],
                  spoolDir: Path, ts: Long): Long = {
    Files.createDirectories(spoolDir)
    clearSpool(spoolDir)
    require(tables.size < (SeqBase.abs / TableSeqStride),
      s"too many tables for the snapshot seq range: ${tables.size}")
    var count = 0L
    tables.zipWithIndex.foreach { case ((db, table), idx) =>
      var seq = SeqBase + idx * TableSeqStride
      val tmp = spoolDir.resolve(s"$db.$table.jsonl.tmp")
      val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
      try {
        c.queryForeach(s"SELECT * FROM `$db`.`$table`") { row =>
          val img = row.map(_.orNull).toArray
          w.write(BinlogWire.positionalLine(db, table, "insert", ts, seq,
            Seq(img), null))
          w.write("\n")
          seq += 1
          count += 1
        }
      } finally w.close()
      Files.move(tmp, spoolDir.resolve(s"$db.$table.jsonl"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    c.query("COMMIT")
    count
  }
}
