package graft.app

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.{CdcStream, ControlService, EngineMetrics, GraftQueryListener, SubscriberRegistry, TcpPubSubService}

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

  /** Batch id of the snapshot's one pipeline pass — distinct from every
    * Spark micro-batch id (those start at 0), so the PosStore replay tag
    * gives a replayed snapshot the same index range. */
  val SnapshotBatchId: Long = -1L

  final case class Config(
      inputDir: String,
      checkpointDir: String,
      posFile: String,
      sinks: Seq[CdcStream.SinkConfig] = Nil,
      useDsv2Source: Boolean = false,
      tableFilter: Option[String] = None,      // S3, only with the DSv2 source
      maxBytesPerTrigger: Option[Long] = None,  // admission control, DSv2 source
      /** DSv2 source wire format: `binary` tails REAL MySQL binlog files
        * ([[graft.source.BinaryBinlogReader]]); default tails JSON lines.
        * The binary reader emits the positional wire form, so it pairs with
        * `schemaRegistry` for the full real-user pipeline: binlog bytes →
        * drift-aware decode → envelopes → sinks. `replication` dials a LIVE
        * MySQL server over the public replication protocol
        * ([[graft.source.ReplicationBinlogReader]]) — supply host/port/user/
        * password/serverId via `sourceOptions`; `inputDir` is ignored by the
        * source in that mode. */
      wireFormat: Option[String] = None,
      /** Extra DSv2 source options passed through verbatim (e.g. replication
        * mode's connection coordinates). */
      sourceOptions: Map[String, String] = Map.empty,
      controlPort: Option[Int] = None,         // P2; 0 = ephemeral
      tcpPubSubPort: Option[Int] = None,       // K1; 0 = ephemeral
      trigger: Trigger = Trigger.AvailableNow(),
      /** P2 hot reload: given the CTRL_RELOAD payload (the service name in the
        * reference), re-read the config source and return the new sink set —
        * the analogue of the daemon re-reading TOML and restarting the service
        * (`main.go:169-187`, `subscribe/tcp.go:211-228`). Sinks are resolved
        * per micro-batch, so the swap takes effect on the next batch without
        * restarting the query. None ⇒ reload acks but changes nothing. */
      reloadSinks: Option[String => Seq[CdcStream.SinkConfig]] = None,
      /** Positional-wire mode with live schema drift: when set, the input is
        * read in the POSITIONAL form (`CdcStream.rawPositionalSchema` — row
        * images as string arrays + ALTER DDL text) and each batch decodes
        * through this registry, row-by-row under the schema version live at
        * its sequence. The registry outlives batches, so an ALTER seen in
        * batch N governs batch N+1 — the drift behavior the reference warns
        * it lacks (`readme.md:54`). Composes with `useDsv2Source`: the DSv2
        * source's raw `value` lines are parsed with the positional wire
        * schema when a registry is configured. */
      schemaRegistry: Option[graft.cdc.SchemaRegistry] = None,
      /** K4 scale tier: (host, port, kafkaTopic) produced to via the wire
        * protocol ([[graft.streaming.KafkaWire]]) — keyed `database.table`,
        * snappy record batches, acks=1, per-partition executor fan-out. */
      kafkaPush: Option[CdcStream.KafkaPush] = None,
      /** Replication-mode consistent initial snapshot (S2's live slice, canal
        * `tryDump` semantics): on first start, pin (file, pos) under FTWRL,
        * dump every registered table inside a consistent-snapshot transaction
        * as `insert` envelopes THROUGH the normal pipeline, then start the
        * stream from the pin — snapshot ∪ tail = full state, no seam
        * duplicates. Requires `wireFormat=replication` + `schemaRegistry`.
        * Restart-safe: the dump runs once (spool + marker beside `posFile`);
        * replays re-emit the same envelopes with the same indices. */
      snapshotOnBootstrap: Boolean = false)

  final class Handle(val query: StreamingQuery,
                     val control: Option[ControlService],
                     val pubsub: Option[TcpPubSubService],
                     val registry: SubscriberRegistry,
                     sinksRef: AtomicReference[Seq[CdcStream.SinkConfig]],
                     /** Live counters (envelopes, per-sink sends, rates) —
                       * the reference's events/sec instrumentation
                       * (tcp.go:436-443), engine-wide. */
                     val metrics: EngineMetrics = new EngineMetrics,
                     teardown: () => Unit = () => ()) {
    def awaitTermination(ms: Long): Boolean = query.awaitTermination(ms)
    def currentSinks: Seq[CdcStream.SinkConfig] = sinksRef.get()
    def stop(): Unit = {
      scala.util.Try(query.stop())
      pubsub.foreach(_.stop())
      control.foreach(_.stop())
      teardown()
    }
  }

  /** The analytics-tier counterpart of [[start]]: the SAME input wiring
    * (DSv2 source with admission control / source-side table filter, or the
    * plain file stream) but the query body is a caller-supplied STATEFUL
    * streaming transform — e.g. [[graft.streaming.Analytics.replicaStream]]
    * (SCD1 replica) or [[graft.streaming.Analytics.runningAggregates]]
    * (continuous IVM) — running as ONE streaming query with its own
    * checkpoint. Stateful operators cannot live inside the delivery query's
    * `foreachBatch`; in Spark's model they are their own query. Run a
    * delivery query ([[start]]) and any number of analytics queries over
    * the same input directory, each with its own checkpoint.
    *
    * Returns the transformed STREAMING frame; attach the sink with
    * `writeStream` (Update mode for the Apply-tier operators). For
    * O(#keys)-beyond-heap state, set the RocksDB state-store provider on
    * the session before starting — see `ApplySpec`/`EngineSpec`. */
  def analyticsStream(spark: SparkSession, cfg: Config)
                     (transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    require(cfg.wireFormat.isEmpty && cfg.schemaRegistry.isEmpty,
      "Engine.analyticsStream reads the generic entries wire form — the " +
        "positional/binary forms decode through the delivery engine " +
        "(Config.schemaRegistry); point analytics at its sink or use " +
        "entries-form input")
    val raw =
      if (cfg.useDsv2Source) {
        var r = spark.readStream.format("graft-cdc").option("path", cfg.inputDir)
        cfg.tableFilter.foreach(f => r = r.option("tableFilter", f))
        cfg.maxBytesPerTrigger.foreach(n => r = r.option("maxBytesPerTrigger", n.toString))
        cfg.sourceOptions.foreach { case (k, v) => r = r.option(k, v) }
        r.load()
          .select(from_json(col("value"), CdcStream.rawSchema).as("r"))
          .select("r.*")
          .filter(col("database").isNotNull && col("table").isNotNull &&
            col("action").isNotNull)
      } else CdcStream.readRaw(spark, cfg.inputDir)
    transform(raw)
  }

  /** Start the engine: stream → envelopes → fan-out to configured sinks +
    * any connected TCP subscribers; control service wired to the query. */
  def start(spark: SparkSession, cfg: Config): Handle = {
    // Fail-fast config cross-checks: the binary/replication wire formats emit
    // POSITIONAL row images (ARRAY<ARRAY<STRING>>), which only the drift
    // registry decodes — without one, from_json against the entries schema
    // nulls every `rows` field and the stream runs "successfully" while
    // delivering nothing. Likewise wireFormat is a DSv2-source option; on the
    // plain file source it would be silently ignored.
    val positionalWire = cfg.wireFormat.exists(w =>
      w.equalsIgnoreCase("binary") || w.equalsIgnoreCase("replication"))
    require(!positionalWire || cfg.schemaRegistry.isDefined,
      "Engine: wireFormat=binary/replication emits positional row images — " +
        "configure Config.schemaRegistry to decode them (or drop wireFormat " +
        "for the JSON-lines entries form)")
    require(cfg.wireFormat.isEmpty || cfg.useDsv2Source,
      "Engine: wireFormat is an option of the graft-cdc DSv2 source — set " +
        "useDsv2Source=true (the plain file source would silently ignore it)")
    require(!cfg.snapshotOnBootstrap ||
        cfg.wireFormat.exists(_.equalsIgnoreCase("replication")),
      "Engine: snapshotOnBootstrap dumps tables over the live replication " +
        "connection — it requires wireFormat=replication (file modes read " +
        "a directory that IS the snapshot)")
    require(!cfg.snapshotOnBootstrap || cfg.schemaRegistry.exists(r =>
        r.registeredTables.isEmpty ||
          java.nio.file.Files.exists(
            java.nio.file.Paths.get(cfg.posFile + ".snapshot/_pinned.json"))),
      "Engine: snapshotOnBootstrap belongs to the zero-config bootstrap " +
        "(empty registry on first start) — a manually-registered registry " +
        "would silently skip the dump; register nothing and let the pinned " +
        "bootstrap fetch schemas, or drop snapshotOnBootstrap")

    val registry = new SubscriberRegistry
    val metrics = new EngineMetrics
    val pubsub = cfg.tcpPubSubPort.map(p => new TcpPubSubService(p))
    // Executors stream each batch's envelopes straight into the pub/sub
    // service's publish ingress — the driver never holds a batch of envelopes
    // (the reference's push tier is likewise its own process fed by a queue,
    // not the coordinator; `binlog/handler.go:81-98`). The ingress address
    // must be the DRIVER'S routable host (the service binds driver-side and
    // the connects happen on executors): loopback only works in local mode.
    val driverHost = spark.sparkContext.getConf.get("spark.driver.host", "127.0.0.1")
    val pushTo = pubsub.map(svc => (driverHost, svc.boundPort))
    val sinksRef = new AtomicReference[Seq[CdcStream.SinkConfig]](cfg.sinks)

    // Drift durability: registry state is derived from the stream (base
    // schemas + every ALTER), and Spark does not replay committed batches —
    // so versions are snapshotted beside the pos cache after each batch and
    // restored here on restart. Without this, a post-recovery batch would
    // decode rows written under an ALTERed column order with the stale base
    // schema (the mis-slotted-JSON failure the registry exists to prevent).
    val schemaFile = cfg.posFile + ".schema"
    cfg.schemaRegistry.foreach(_.loadFrom(schemaFile))

    // Replication-mode zero-config bootstrap, the reference's behavior (canal
    // fetches SHOW FULL COLUMNS itself; no manual registration step): if the
    // registry is still empty after the snapshot restore, walk the server's
    // schema over the metadata connection — PINNED: the binlog position is
    // captured under the same FTWRL moment the schemas are read
    // ([[graft.source.Snapshot.pin]]) and the stream starts THERE, not at the
    // oldest retained binlog. Replay-from-earliest under a current-state
    // schema would decode pre-DDL row events against the post-DDL column
    // list and re-apply already-applied ALTERs onto it — the exact
    // mis-slotting the registry exists to prevent. The pin (an honest
    // ReplOffset json) is persisted as a marker, so a restart that lost the
    // Spark checkpoint but kept the state dir still starts at the pin; a
    // normal restart resumes from the checkpoint (initialOffset is only
    // consulted when none exists). With `snapshotOnBootstrap` the same pin
    // also anchors a consistent-snapshot data dump (S2's replication slice),
    // spooled then fed through the ordinary batch pipeline below.
    val snapDir = java.nio.file.Paths.get(cfg.posFile + ".snapshot")
    val pinMarker = snapDir.resolve("_pinned.json")
    val startOffsetJson: Option[String] = cfg.schemaRegistry.flatMap { reg =>
      if (!cfg.wireFormat.exists(_.equalsIgnoreCase("replication"))) None
      else if (java.nio.file.Files.exists(pinMarker))
        Some(new String(java.nio.file.Files.readAllBytes(pinMarker), "UTF-8"))
      else if (reg.registeredTables.nonEmpty) None // manually registered: no pin
      else {
        val host = cfg.sourceOptions.getOrElse("host",
          throw new IllegalArgumentException("replication mode requires sourceOptions host"))
        def mkClient() = new graft.source.ReplicationClient(host,
          cfg.sourceOptions.getOrElse("port", "3306").toInt,
          cfg.sourceOptions.getOrElse("user", "root"),
          cfg.sourceOptions.getOrElse("password", ""),
          cfg.sourceOptions.getOrElse("serverId", "6402").toLong)
        // mydumper-style parallel bootstrap: `snapshotWorkers` > 1 opens that
        // many extra connections under the FTWRL moment, each with its own
        // consistent-snapshot transaction, and drains tables / integer-PK
        // ranges in parallel — the single-connection dump stops being the
        // bottleneck for a 100 GB-per-table bootstrap.
        val snapWorkers =
          cfg.sourceOptions.get("snapshotWorkers").map(_.trim.toInt).getOrElse(1)
        // `schemaFromStream=true`: skip the lock-window SHOW FULL COLUMNS
        // walk entirely — the stream's binlog_row_metadata=FULL TABLE_MAPs
        // register every table on first contact (SchemaRegistry.applySchema).
        // The pin itself (FTWRL + SHOW MASTER STATUS) still runs: the stream
        // must start at a write-blocked moment regardless of where schemas
        // come from. Incompatible with a data snapshot: the spool's
        // positional rows carry no TABLE_MAP, so they would have no schema
        // to decode under.
        val schemaFromStream = cfg.sourceOptions.get("schemaFromStream")
          .exists(_.equalsIgnoreCase("true"))
        require(!(schemaFromStream && cfg.snapshotOnBootstrap),
          "schemaFromStream is incompatible with snapshotOnBootstrap: the " +
            "snapshot spool decodes under registry schemas, which " +
            "schemaFromStream defers to the live stream's TABLE_MAPs")
        val c = mkClient()
        try {
          c.connect()
          val ts = System.currentTimeMillis() / 1000
          val pinned =
            if (cfg.snapshotOnBootstrap && snapWorkers > 1) {
              val (p, tables, conns) = graft.source.Snapshot.pinParallel(
                c, () => { val w = mkClient(); w.connect(); w }, reg, snapWorkers)
              graft.source.Snapshot.dumpToSpoolParallel(tables, conns, snapDir, ts,
                chunkRows = cfg.sourceOptions.get("snapshotChunkRows")
                  .map(_.trim.toLong).getOrElse(1L << 20))
              p
            } else {
              val (p, dumpTables) = graft.source.Snapshot.pin(
                c, reg, withDataTxn = cfg.snapshotOnBootstrap,
                includeDb =
                  if (schemaFromStream) _ => false
                  else db => !graft.source.SchemaBootstrap.SystemDbs.contains(db))
              if (cfg.snapshotOnBootstrap)
                graft.source.Snapshot.dumpToSpool(c, dumpTables, snapDir, ts)
              p
            }
          if (cfg.snapshotOnBootstrap) {
            // records "this pin CAME WITH a data dump" — a later run with
            // snapshotOnBootstrap set can distinguish an empty dump (fine)
            // from a pin-only bootstrap's missing dump (an error)
            java.nio.file.Files.createDirectories(snapDir)
            java.nio.file.Files.write(snapDir.resolve("_spooled"),
              Array.emptyByteArray)
          } else {
            // PIN-ONLY bootstrap: a previous snapshot attempt (crashed before
            // its pin marker) may have left spool files / _spooled here. They
            // belong to a DIFFERENT read-view moment than the pin being
            // written below — scrub them so a later snapshot-enabled run
            // cannot replay them as ghost rows.
            graft.source.Snapshot.clearStaleDump(snapDir)
          }
          reg.saveTo(schemaFile)
          // marker written LAST, atomically: its existence == bootstrap done
          java.nio.file.Files.createDirectories(snapDir)
          val tmp = snapDir.resolve("_pinned.json.tmp")
          java.nio.file.Files.write(tmp, pinned.offset.json().getBytes("UTF-8"))
          java.nio.file.Files.move(tmp, pinMarker,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          Some(pinned.offset.json())
        } finally c.close()
      }
    }

    // Feed the spooled snapshot through the NORMAL batch pipeline (decode →
    // envelopes → indices → sinks) exactly once, BEFORE the stream's first
    // micro-batch: snapshot rows take the first event_index range, the tail
    // continues it — dense across the seam. The done-marker commits the
    // processing; a crash between the batch and the marker replays it with
    // the SAME indices (tag-matched PosStore start), the engine-wide
    // at-least-once contract.
    val snapDone = snapDir.resolve("_done")
    if (cfg.snapshotOnBootstrap && java.nio.file.Files.exists(pinMarker) &&
        !java.nio.file.Files.exists(snapDone)) {
      val reg = cfg.schemaRegistry.get
      val spool = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(snapDir)
        try s.iterator().asScala.filter(_.toString.endsWith(".jsonl")).map(_.toString).toSeq
        finally s.close()
      }
      // A pin written by an earlier PIN-ONLY bootstrap has no data dump
      // behind it — feeding "the spool" would silently deliver nothing and
      // then commit _done over the omission. Refuse loudly instead: the
      // operator asked for a snapshot and there isn't one to give. The
      // _spooled marker is the primary evidence, but actual spool files
      // count too: a dump written by a build that predates the marker (crash
      // between spooling and _done) is a VALID snapshot whose pin moment is
      // unrecoverable — failing it would discard a consistent dump.
      if (!java.nio.file.Files.exists(snapDir.resolve("_spooled")) && spool.isEmpty)
        throw new IllegalStateException(
          s"snapshotOnBootstrap is set but the existing bootstrap pin at " +
            s"$pinMarker was created without a data snapshot (pin-only " +
            s"bootstrap). Delete $snapDir to re-bootstrap with a snapshot, " +
            "or unset snapshotOnBootstrap to keep the existing pin.")
      if (spool.nonEmpty) {
        // NOTE (cluster deployments): the spool lives beside posFile, written
        // by the DRIVER — spark.read.json here means executor tasks must see
        // the same paths. Like the checkpoint dir, posFile/spool must be on a
        // shared filesystem (NFS, DBFS, a fuse mount) when executors are
        // remote; on a single node (this engine's ops tier, the reference's
        // deployment shape) any local path works.
        val batch = spark.read.schema(CdcStream.rawPositionalSchema)
          .json(spool: _*)
          .filter(col("database").isNotNull && col("table").isNotNull &&
            col("action").isNotNull)
        CdcStream.processPositionalBatch(batch, SnapshotBatchId, cfg.posFile,
          sinksRef.get(), reg, pushTo, cfg.kafkaPush, Some(metrics))
        reg.saveTo(schemaFile)
      }
      java.nio.file.Files.write(snapDone, Array.emptyByteArray)
    }

    // Wire form: positional (string-array row images + DDL) when a drift
    // registry is configured, entries form otherwise — orthogonal to WHICH
    // source tails the directory (DSv2 byte-planned source vs file stream).
    val wireSchema =
      if (cfg.schemaRegistry.isDefined) CdcStream.rawPositionalSchema else CdcStream.rawSchema
    val raw =
      if (cfg.useDsv2Source) {
        var r = spark.readStream.format("graft-cdc").option("path", cfg.inputDir)
        cfg.tableFilter.foreach(f => r = r.option("tableFilter", f))
        cfg.maxBytesPerTrigger.foreach(n => r = r.option("maxBytesPerTrigger", n.toString))
        cfg.wireFormat.foreach(w => r = r.option("wireFormat", w))
        cfg.sourceOptions.foreach { case (k, v) => r = r.option(k, v) }
        startOffsetJson.foreach(j => r = r.option("startOffset", j))
        r.load()
          .select(from_json(col("value"), wireSchema).as("r"))
          .select("r.*")
          // same malformed-line tolerance as readRaw/readRawPositional: a bad
          // line parses to an all-null row (PERMISSIVE) and is dropped here —
          // never fed to the decode/registry path (sync.go error tolerance)
          .filter(col("database").isNotNull && col("table").isNotNull &&
            col("action").isNotNull)
      } else if (cfg.schemaRegistry.isDefined) CdcStream.readRawPositional(spark, cfg.inputDir)
      else CdcStream.readRaw(spark, cfg.inputDir)

    // One progress line per micro-batch (rows/s from Spark's own progress,
    // engine counters appended) — registered before start so no batch's
    // event is missed, scoped by a pre-assigned unique query NAME (known
    // before start, so no startup window admits a foreign query's events),
    // removed on stop.
    val queryName = s"graft-engine-${java.util.UUID.randomUUID()}"
    val listener = new GraftQueryListener(metrics, queryName)
    spark.streams.addListener(listener)

    val query = raw.writeStream
      .queryName(queryName)
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(cfg.trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        cfg.schemaRegistry match {
          case Some(reg) =>
            CdcStream.processPositionalBatch(batch, id, cfg.posFile, sinksRef.get(), reg,
              pushTo, cfg.kafkaPush, Some(metrics))
            reg.saveTo(schemaFile)
          case None =>
            CdcStream.processBatch(batch, id, cfg.posFile, sinksRef.get(), pushTo,
              cfg.kafkaPush, Some(metrics))
        }
      }
      .start()

    val control = cfg.controlPort.map(p => new ControlService(p,
      onStop = () => query.stop(),
      onReload = payload => cfg.reloadSinks.foreach(f => sinksRef.set(f(payload))),
      // CTRL_STATUS: active queries plus the live counters — the reference's
      // status surface never had rates; ours is the tcp.go:436 counter
      // rendered engine-wide — plus gtid_executed from the engine query's
      // last committed source offset (replication mode): the exact failover
      // recovery value (`startGtid=`), surfaced where an operator looks
      // first instead of buried in the checkpoint offset json.
      members = () => {
        val gtid = Option(query.lastProgress).toSeq
          .flatMap(_.sources.toSeq).flatMap(s => Option(s.endOffset))
          .flatMap(j => """"gtid"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(j).map(_.group(1)))
          .lastOption
        (spark.streams.active.map(q => s"${q.name} ${q.id}") :+
          (metrics.render + gtid.fold("")(g => s" gtid_executed=$g"))).mkString("\n")
      }))

    new Handle(query, control, pubsub, registry, sinksRef, metrics,
      teardown = () => spark.streams.removeListener(listener))
  }
}
