package graft.source

/** GTID bookkeeping for the replication source — the modern MySQL failover
  * story the reference stops short of (`/root/reference/src/library/binlog/
  * handler.go:73-76` logs `OnGTID` and drops it; file/pos is canal's only
  * resume unit). After a failover the new primary's binlog FILE NAMES and
  * byte positions mean nothing — only the set of executed transaction ids
  * (`gtid_executed`) carries across servers, which is why
  * `MASTER_AUTO_POSITION` replaced file/pos in every modern topology.
  *
  * A GTID is `source_uuid:transaction_number`; an executed set is the union
  * of per-uuid interval lists (`3e11fa47-…:1-5:11,859d2f3e-…:1-3`). This is
  * all public protocol: the textual form is SHOW MASTER STATUS's
  * `Executed_Gtid_Set`; the binary form (n_sids, then per sid 16 raw uuid
  * bytes + interval pairs with EXCLUSIVE ends) is the PREVIOUS_GTIDS event
  * body and the COM_BINLOG_DUMP_GTID payload.
  *
  * Immutable value class: interval lists are sorted, disjoint, coalesced,
  * ends INCLUSIVE internally (the textual convention); [[encode]] converts
  * to the wire's exclusive ends.
  */
final case class GtidSet(intervals: Map[String, Vector[(Long, Long)]]) {

  def isEmpty: Boolean = intervals.isEmpty

  def contains(sid: String, gno: Long): Boolean =
    intervals.getOrElse(GtidSet.norm(sid), Vector.empty)
      .exists { case (lo, hi) => gno >= lo && gno <= hi }

  /** Add one transaction id, coalescing adjacent/overlapping intervals. */
  def add(sid: String, gno: Long): GtidSet = {
    require(gno > 0, s"GTID transaction numbers are positive, got $gno")
    val key = GtidSet.norm(sid)
    val merged = GtidSet.coalesce(intervals.getOrElse(key, Vector.empty) :+ (gno, gno))
    GtidSet(intervals.updated(key, merged))
  }

  def union(other: GtidSet): GtidSet =
    GtidSet((intervals.keySet ++ other.intervals.keySet).map { k =>
      k -> GtidSet.coalesce(
        intervals.getOrElse(k, Vector.empty) ++ other.intervals.getOrElse(k, Vector.empty))
    }.toMap)

  /** True when every transaction in this set is also in `other` — the
    * server-side dump-start test: a binlog file is skippable iff its
    * PREVIOUS_GTIDS ⊆ the replica's executed set. */
  def subsetOf(other: GtidSet): Boolean =
    intervals.forall { case (sid, ivs) =>
      val theirs = other.intervals.getOrElse(sid, Vector.empty)
      ivs.forall { case (lo, hi) =>
        // coalesced+sorted: containment must come from a single interval
        theirs.exists { case (tlo, thi) => tlo <= lo && hi <= thi }
      }
    }

  /** Canonical text: uuids sorted, intervals ascending, `lo-hi` / bare `lo`. */
  override def toString: String =
    intervals.toSeq.sortBy(_._1).map { case (sid, ivs) =>
      sid + ivs.map { case (lo, hi) => if (lo == hi) s":$lo" else s":$lo-$hi" }.mkString
    }.mkString(",")

  /** Wire encoding (PREVIOUS_GTIDS body / COM_BINLOG_DUMP_GTID data): all
    * integers little-endian, interval ends EXCLUSIVE. */
  def encode: Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    def le64(v: Long): Unit = (0 until 8).foreach(i => b.write(((v >> (8 * i)) & 0xff).toInt))
    le64(intervals.size.toLong)
    intervals.toSeq.sortBy(_._1).foreach { case (sid, ivs) =>
      b.write(GtidSet.sidBytes(sid))
      le64(ivs.size.toLong)
      ivs.foreach { case (lo, hi) => le64(lo); le64(hi + 1) }
    }
    b.toByteArray
  }
}

object GtidSet {

  val Empty: GtidSet = GtidSet(Map.empty)

  /** Uuids compare case-insensitively; canonical form is lowercase. */
  def norm(sid: String): String = sid.toLowerCase

  /** Sort + merge overlapping/adjacent inclusive intervals. */
  def coalesce(ivs: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    if (ivs.isEmpty) return ivs
    val sorted = ivs.sorted
    val out = Vector.newBuilder[(Long, Long)]
    var (lo, hi) = sorted.head
    sorted.tail.foreach { case (l, h) =>
      if (l <= hi + 1) hi = math.max(hi, h)
      else { out += ((lo, hi)); lo = l; hi = h }
    }
    out += ((lo, hi))
    out.result()
  }

  /** Parse the textual form (`uuid:1-5:7,uuid:...`); empty/blank → Empty.
    * Tolerates whitespace and MySQL's occasional newlines inside
    * Executed_Gtid_Set. */
  def parse(s: String): GtidSet = {
    val trimmed = s.replaceAll("\\s", "")
    if (trimmed.isEmpty) return Empty
    val perSid = trimmed.split(',').filter(_.nonEmpty).map { part =>
      val pieces = part.split(':')
      require(pieces.length >= 2, s"malformed GTID set element: $part")
      val sid = norm(pieces.head)
      val ivs = pieces.tail.toVector.map { r =>
        r.split('-') match {
          case Array(a) => (a.toLong, a.toLong)
          case Array(a, b) =>
            val (lo, hi) = (a.toLong, b.toLong)
            require(lo <= hi, s"descending GTID interval: $r")
            (lo, hi)
          case _ => throw new IllegalArgumentException(s"malformed GTID interval: $r")
        }
      }
      sid -> ivs
    }
    GtidSet(perSid.groupBy(_._1).map { case (sid, parts) =>
      sid -> coalesce(parts.flatMap(_._2).toVector)
    })
  }

  /** Wire decoding — inverse of [[GtidSet.encode]]. Ignores trailing bytes
    * (a checksummed event body carries its CRC32 after the set). */
  def decode(bytes: Array[Byte], at0: Int = 0): GtidSet = {
    var at = at0
    def le64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (bytes(at + i) & 0xffL) << (8 * i); i += 1 }
      at += 8; v
    }
    val nSids = le64()
    require(nSids >= 0 && nSids < 1000000, s"implausible GTID sid count $nSids")
    val sets = (0L until nSids).map { _ =>
      val sid = sidHex(java.util.Arrays.copyOfRange(bytes, at, at + 16)); at += 16
      val n = le64()
      require(n >= 0 && n < 1000000, s"implausible GTID interval count $n")
      sid -> coalesce((0L until n).map { _ =>
        val lo = le64(); val hiExcl = le64(); (lo, hiExcl - 1)
      }.toVector)
    }.toMap
    GtidSet(sets)
  }

  /** `3e11fa47-71ca-11e1-9e33-c80aa9429562` → its 16 raw bytes. */
  def sidBytes(sid: String): Array[Byte] = {
    val hex = sid.replace("-", "")
    require(hex.length == 32, s"malformed server uuid: $sid")
    Array.tabulate(16)(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  def sidHex(b: Array[Byte]): String = {
    val h = b.map(x => f"${x & 0xff}%02x").mkString
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20)}"
  }
}

/** Client-side GTID → (file, position) location — what a master does
  * internally for `COM_BINLOG_DUMP_GTID`: walk the binlog index newest to
  * oldest comparing each file's PREVIOUS_GTIDS against the replica's
  * executed set, then scan forward inside the chosen file to the first
  * unexecuted transaction.
  *
  * Done CLIENT-side (bounded probe dumps) rather than via
  * COM_BINLOG_DUMP_GTID because this engine's planner must CHECKPOINT
  * positions: the server-side command locates internally and streams, but
  * never tells the client WHERE it started — useless to a micro-batch
  * planner whose offsets are (file, byte) ranges that every future dump must
  * be able to re-request. The probe reads only each candidate file's first
  * events (FORMAT_DESCRIPTION + PREVIOUS_GTIDS, the mandatory file prologue
  * since gtid_mode=ON), so locating is O(#files) tiny dumps + one scan of
  * the resume file — metadata-scale, like every other planning path here. */
object GtidLocator {

  /** The global byte position of the first transaction NOT in `executed`,
    * measured against the server's current listing — plus that listing, i.e.
    * exactly the [[ReplOffset]] a stream should start from. */
  def locate(conf: ReplConfig, executed: GtidSet): ReplOffset = {
    val files = conf.listLogs()
    require(files.nonEmpty, "empty binlog listing — is the binlog enabled?")
    val bases = files.scanLeft(0L)(_ + _._2)

    // newest→oldest: first file whose prologue PREVIOUS_GTIDS ⊆ executed can
    // serve as the scan start (everything before it is already applied).
    // No such file means even the OLDEST retained file's prologue contains
    // transactions this replica has not executed — the server PURGED binlogs
    // the replica still needs. Resuming from the oldest retained file would
    // silently skip the purged transactions; MySQL itself refuses this
    // (ER_MASTER_HAS_PURGED_REQUIRED_GTIDS), and so do we. (Pre-GTID files
    // have no prologue = the empty set, always a subset, so a fresh server's
    // history is never mistaken for a purge.)
    val startIdx = (files.indices.reverse.find { i =>
      previousGtids(conf, files(i)._1).subsetOf(executed)
    }).getOrElse(throw new IllegalStateException(
      s"GTID resume impossible: the oldest retained binlog on ${conf.host}:" +
        s"${conf.port} (${files.head._1}) already requires transactions " +
        s"beyond startGtid=$executed — the server has purged binlogs this " +
        "position still needs. Re-bootstrap with a fresh snapshot instead " +
        "of resuming."))

    // forward scan from the chosen file: the first GTID event whose id is
    // not yet executed marks the resume position (the event START, so the
    // transaction replays whole)
    var idx = startIdx
    while (idx < files.length) {
      firstUnexecuted(conf, files(idx)._1, executed) match {
        case Some(inFilePos) =>
          return ReplOffset(bases(idx) + inFilePos, files)
        case None => idx += 1
      }
    }
    ReplOffset(bases.last, files) // everything executed: resume at the tail
  }

  /** Server-side auto-position locate (option `gtidLocate=server`): ONE
    * `COM_BINLOG_DUMP_GTID` connection asks the PRIMARY to choose the
    * dump-start file for `executed` — replacing the newest→oldest prologue
    * probing (O(#files) bounded dumps) with the server's own walk of its
    * binlog index, including its `gtid_purged` bookkeeping: where the
    * client-side probe diagnoses a purge by reading prologues, the server
    * simply refuses with 1236 (ER_MASTER_FATAL_ERROR_READING_BINLOG), which
    * surfaces here with the re-bootstrap instruction. The in-file refinement
    * still runs client-side ([[firstUnexecuted]]): the server skips executed
    * transactions while STREAMING, but this planner needs an exact (file,
    * byte) offset every future dump can re-request — the chosen file's start
    * would re-stream executed transactions. */
  def locateAuto(conf: ReplConfig, executed: GtidSet): ReplOffset = {
    val files = conf.listLogs()
    require(files.nonEmpty, "empty binlog listing — is the binlog enabled?")
    val bases = files.scanLeft(0L)(_ + _._2)
    val chosen = serverChosenFile(conf, executed)
    val startIdx = files.indexWhere(_._1 == chosen)
    require(startIdx >= 0,
      s"server chose dump file $chosen which its own listing lacks " +
        s"(${files.map(_._1)}) — listing raced a purge; retry")
    var idx = startIdx
    while (idx < files.length) {
      firstUnexecuted(conf, files(idx)._1, executed) match {
        case Some(inFilePos) =>
          return ReplOffset(bases(idx) + inFilePos, files,
            gtid = Some(executed.toString))
        case None => idx += 1
      }
    }
    ReplOffset(bases.last, files, gtid = Some(executed.toString))
  }

  /** The file the server's auto-position walk picks for `executed`: issue a
    * non-blocking GTID dump and read the artificial ROTATE (log_pos 0) that
    * prefixes every dump — its body is pos(8) + file name. */
  private def serverChosenFile(conf: ReplConfig, executed: GtidSet): String = {
    val c = new ReplicationClient(conf.host, conf.port, conf.user, conf.password,
      conf.serverId + 200002, // its own probe slot, never a live dump's id
      conf.tls)
    try {
      c.connect()
      // artificial events carry the negotiated checksum too — learn the
      // server's format BEFORE dumping so the rotate's name length is exact
      val checksummed = c.query("SELECT @@global.binlog_checksum").headOption
        .flatMap(_.headOption.flatten).exists(_.equalsIgnoreCase("CRC32"))
      c.negotiateChecksum()
      c.registerSlave()
      c.dumpGtid(executed, nonBlocking = true)
      var ev = c.nextEvent()
      while (ev != null) {
        val etype = ev(4) & 0xff
        if (etype == BinlogWire.ROTATE_EVENT && MysqlWire.leAt(ev, 13, 4) == 0) {
          val nameLen = ev.length - 19 - 8 - (if (checksummed) 4 else 0)
          require(nameLen > 0, s"malformed artificial rotate (${ev.length} bytes)")
          return new String(ev, 19 + 8, nameLen, java.nio.charset.StandardCharsets.UTF_8)
        }
        ev = c.nextEvent()
      }
      throw new IllegalStateException(
        s"GTID dump from ${conf.host}:${conf.port} ended without the " +
          "artificial rotate naming its start file — cannot auto-position")
    } catch {
      case e: MysqlWire.MysqlServerError
        if e.code == MysqlWire.ER_MASTER_FATAL_ERROR_READING_BINLOG =>
        throw new IllegalStateException(
          s"GTID auto-position resume impossible: ${conf.host}:${conf.port} " +
            s"requires binlogs purged beyond startGtid=$executed (server: " +
            s"${e.getMessage}). Re-bootstrap with a fresh snapshot instead " +
            "of resuming.", e)
    } finally c.close()
  }

  /** One bounded probe dump: read the file's prologue up to its
    * PREVIOUS_GTIDS event. Files written before gtid_mode have none —
    * treated as the empty set (always a subset, matching MySQL's own
    * semantics for pre-GTID logs). */
  private def previousGtids(conf: ReplConfig, file: String): GtidSet = {
    var found = GtidSet.Empty
    probe(conf, file) { (etype, raw) =>
      if (etype == BinlogWire.PREVIOUS_GTIDS_EVENT) {
        found = GtidSet.decode(raw, at0 = 19) // skip the event header
        false
      } else etype == BinlogWire.FORMAT_DESCRIPTION_EVENT ||
        // the dump-start ARTIFICIAL rotate (log_pos 0) precedes the prologue;
        // a REAL rotate means this file ENDED without one (pre-GTID file) —
        // stop, or the dump streams into the NEXT file and its prologue
        // would be mis-attributed to this one
        (etype == BinlogWire.ROTATE_EVENT && MysqlWire.leAt(raw, 13, 4) == 0)
    }
    found
  }

  /** Scan one file's GTID events; the START position of the first whose id
    * is not in `executed`, if any. */
  private def firstUnexecuted(conf: ReplConfig, file: String,
                              executed: GtidSet): Option[Long] = {
    var hit: Option[Long] = None
    var lastEnd = 4L
    probe(conf, file) { (etype, raw) =>
      val logPos = MysqlWire.leAt(raw, 13, 4)
      // a REAL rotate ends the requested file: a live server's non-blocking
      // dump keeps streaming into the next file, whose positions restart
      // small — scanning on would return a NEXT-file position under THIS
      // file's base (the same stop [[ReplicationBinlogReader]] applies)
      if (etype == BinlogWire.ROTATE_EVENT && logPos > 0) false
      else if (etype == BinlogWire.GTID_EVENT && logPos > 0) {
        val eventSize = MysqlWire.leAt(raw, 9, 4)
        val window = lastEnd & ~0xffffffffL
        var end = window | logPos
        if (end + 0x80000000L < lastEnd) end += 0x100000000L
        lastEnd = math.max(lastEnd, end)
        val (sid, gno) = BinlogWire.parseGtid(
          java.util.Arrays.copyOfRange(raw, 19, raw.length))
        if (!executed.contains(sid, gno)) { hit = Some(end - eventSize); false }
        else true
      } else {
        if (logPos > 0 && etype != BinlogWire.FORMAT_DESCRIPTION_EVENT &&
            etype != BinlogWire.ROTATE_EVENT) {
          val window = lastEnd & ~0xffffffffL
          var end = window | logPos
          if (end + 0x80000000L < lastEnd) end += 0x100000000L
          lastEnd = math.max(lastEnd, end)
        }
        true
      }
    }
    hit
  }

  /** Non-blocking dump of `file` from its start, feeding each event to `f`
    * as (type, rawEventBytes) for [[firstUnexecuted]] / raw body for the
    * prologue probe — `f` returns false to stop early (the connection is
    * simply closed; each probe owns its own connection and server_id slot,
    * offset from the metadata id so probes can never kill a live dump). */
  private def probe(conf: ReplConfig, file: String)(f: (Int, Array[Byte]) => Boolean): Unit = {
    val c = new ReplicationClient(conf.host, conf.port, conf.user, conf.password,
      conf.serverId + 200001, // outside the dump-ordinal range (serverId+1..+100000)
      conf.tls)
    try {
      c.connect()
      c.negotiateChecksum()
      c.registerSlave()
      c.dump(file, 4L)
      var ev = c.nextEvent()
      var go = true
      while (go && ev != null) {
        val etype = ev(4) & 0xff
        go = f(etype, ev)
        if (go) ev = c.nextEvent()
      }
    } finally c.close()
  }
}
