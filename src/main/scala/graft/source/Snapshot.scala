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
  def pin(c: ReplicationClient, registry: graft.cdc.SchemaRegistry,
          withDataTxn: Boolean,
          includeDb: String => Boolean = db => !SchemaBootstrap.SystemDbs.contains(db))
      : (Pinned, Seq[(String, String)]) = {
    val locked =
      try { c.query("FLUSH TABLES WITH READ LOCK"); true }
      catch {
        // Only a server-side privilege refusal may degrade to the unlocked
        // path (1227 ER_SPECIFIC_ACCESS_DENIED / 1045 ER_ACCESS_DENIED).
        // Anything else — a dead connection, a timeout, an unrelated server
        // error — must surface HERE, not as a misleading failure from the
        // SHOW MASTER STATUS that follows.
        case e: MysqlWire.MysqlServerError if e.code == 1227 || e.code == 1045 =>
          false
      }
    try {
      val status = c.query("SHOW MASTER STATUS")
      require(status.nonEmpty && status.head.size >= 2 && status.head(0).isDefined,
        "SHOW MASTER STATUS returned nothing — is the binlog enabled " +
          "(log_bin) on this server?")
      val pinned = Pinned(status.head(0).get, status.head(1).flatMap(_.toLongOption)
        .getOrElse(throw new IllegalStateException(
          s"unparsable SHOW MASTER STATUS position: ${status.head}")), c.binaryLogs())
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
    var seq = SeqBase
    var count = 0L
    tables.foreach { case (db, table) =>
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
