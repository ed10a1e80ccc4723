package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** The realtime-analytics tier: the engine's wire stream declared as ONE
  * Spark streaming query — raw statements → per-row typed change records →
  * a stateful operator ([[graft.cdc.Apply.latestStateStream]] replica or
  * [[graft.cdc.Apply.deltaAggregate]] running aggregates) — instead of the
  * delivery tier's foreachBatch fan-out. This is the "realtime analytics"
  * story the reference sells (`/root/reference/readme.md:3-43` — "real-time
  * data analysis ... cache refresh ... index maintenance") but leaves
  * entirely to the consumer of its pushed JSON; here it is a first-class
  * streaming pipeline with RocksDB-backed state and its own checkpoint,
  * independent of (and composable with) the delivery query over the same
  * input.
  *
  * Scale shape: the envelope explode is partition-local; the only shuffle is
  * the stateful operator's own hash exchange on the key/group columns —
  * state is O(#live keys) (replica) or O(#groups) (IVM), never O(#changes).
  */
object Analytics {

  /** Per-row typed change records for ONE table, from the generic entries
    * wire stream (the [[CdcStream.rawSchema]] form): explode statements to
    * row changes, parse the row images against the caller's column schema.
    *
    * Output columns:
    *  - `seq` LONG — `(stmt_seq << 20) + pair_pos`: statement order from the
    *    binlog, row order within the statement. Unique per change row (the
    *    Apply-tier contract) for statements under 2^20 row images and
    *    stmt_seq under 2^43 — binlog byte positions fit with headroom.
    *  - `deleted` BOOLEAN — true for delete changes.
    *  - `before`, `after` STRUCT(`imageSchema`) — old/new row images; null
    *    on insert/delete respectively (exactly [[graft.cdc.Apply
    *    .deltaAggregate]]'s input contract).
    *
    * Streaming-safe: narrow expressions only (the envelope explode never
    * shuffles), so it composes under any downstream stateful operator. */
  def tableChanges(raw: DataFrame, database: String, table: String,
                   imageSchema: StructType): DataFrame = {
    // new_data/old_data are reserved too: the merged from_json schema below
    // appends both as nested-image fields, so an image field with either name
    // would produce a duplicate-field struct and ambiguous getField resolution
    for (reserved <- Seq("seq", "deleted", "before", "after", "__img",
        "new_data", "old_data"))
      require(!imageSchema.fieldNames.contains(reserved),
        s"tableChanges reserves output/scratch column name '$reserved' — " +
          s"rename the image field (have: ${imageSchema.fieldNames.mkString(", ")})")
    val env = graft.cdc.EnvelopeBuilder.envelopes(raw)
      // only these two columns reach the filter, so Catalyst pushes it below
      // the event-JSON projection: other tables' statements are never rendered
      .filter(col("database") === database && col("table") === table)
      .filter(col("event_type").isin("insert", "update", "delete"))
    // ONE json parse per change: the `data` object is the image itself for
    // insert/delete and {new_data, old_data} for update — a merged schema
    // (image fields + both nested images; absent fields parse to null) reads
    // both shapes in a single from_json, where the per-shape get_json_object
    // + from_json formulation parsed the same event four times (measured ~2×
    // the whole operator's cost at sf0.1).
    import org.apache.spark.sql.types.StructField
    val dataSchema = StructType(imageSchema.fields ++
      Seq(StructField("new_data", imageSchema), StructField("old_data", imageSchema)))
    val parsed = from_json(col("event"), StructType(Seq(StructField("data", dataSchema))))
      .getField("data")
    // NOTE: rebuilding the image struct from parsed top-level fields yields
    // a struct of nulls (not a null struct) if the event JSON failed to
    // parse — impossible for engine-rendered envelopes (which this stream
    // is), and harmless downstream (Apply's operators treat the fields
    // individually); documented for auditability.
    def topImage(p: Column): Column =
      struct(imageSchema.fieldNames.toSeq.map(f => p.getField(f).as(f)): _*)
    // the packed seq must stay injective: stmt_seq beyond 2^43 or a
    // statement beyond 2^20 row images would silently collide seqs — the
    // Apply tier's uniqueness contract — so both wrap cases fail loudly
    env.select(
      packedSeq.as("seq"),
      (col("event_type") === "delete").as("deleted"),
      col("event_type"), parsed.as("__d"))
      .select(
        col("seq"), col("deleted"),
        when(col("event_type") === "update", col("__d.old_data"))
          .when(col("event_type") === "delete", topImage(col("__d"))).as("before"),
        when(col("event_type") === "update", col("__d.new_data"))
          .when(col("event_type") === "insert", topImage(col("__d"))).as("after"))
  }

  /** One replicated table for the multi-table plan: identity, row-image
    * schema, and primary-key columns (all must be image fields). */
  final case class TableSpec(database: String, table: String,
                             imageSchema: StructType, keyCols: Seq[String]) {
    require(keyCols.nonEmpty, s"$database.$table: keyCols must be non-empty")
    private val fields = imageSchema.fieldNames.toSeq
    require(keyCols.forall(fields.contains),
      s"$database.$table: keyCols not in imageSchema: " +
        keyCols.filterNot(fields.contains).mkString(", "))
  }

  /** Deterministic, balanced sharding of a replicated table set across `n`
    * [[multiReplicaStream]] queries — the callable form of the scaladoc
    * advice there ("past a few hundred tables prefer sharding the spec set
    * across a few queries"). Specs are dealt round-robin in (database,
    * table) order, so the assignment is a pure function of the spec SET —
    * stable across restarts, config reorderings and process boundaries
    * (each shard's checkpoint keeps meaning what it meant) — and shard
    * sizes differ by at most one table. Empty shards are not emitted
    * (n > specs.size just yields one shard per spec). */
  def shardSpecs(specs: Seq[TableSpec], n: Int): Seq[Seq[TableSpec]] = {
    require(n >= 1, s"shardSpecs: n must be >= 1, got $n")
    val ids = specs.map(sp => (sp.database, sp.table))
    require(ids.distinct.size == ids.size,
      s"shardSpecs: duplicate (database, table) in spec set: " +
        ids.diff(ids.distinct).distinct.mkString(", "))
    specs.sortBy(sp => (sp.database, sp.table))
      .zipWithIndex
      .groupBy(_._2 % n).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
  }

  /** Typed change records for MANY tables from ONE pass over the wire
    * stream — the multi-table answer to the reference's router, which fans
    * one binlog stream to every consumer (`handler.go:91-97`) instead of
    * re-reading it per table. N independent [[tableChanges]] queries read
    * and explode the source N times and keep N checkpoints; this plan runs
    * the envelope explode ONCE, filters to the replicated table set (one
    * hash-set membership probe over the two routing columns), and parses every
    * event exactly once against the MERGED image schema — the union of all
    * tables' fields (absent fields parse to null; a field name claimed by
    * two tables at different types is refused loudly, since one merged
    * from_json column can only carry one type).
    *
    * Output: (`database`, `table`, `seq`, `deleted`, `before`, `after`)
    * where before/after are merged-schema structs — a consumer selects its
    * table's fields; fields of other tables are null there. Narrow
    * expressions only, exactly like the single-table form. */
  def multiTableChanges(raw: DataFrame, specs: Seq[TableSpec]): DataFrame = {
    require(specs.nonEmpty, "multiTableChanges: at least one TableSpec")
    val ids = specs.map(sp => (sp.database, sp.table))
    require(ids.distinct.size == ids.size,
      s"multiTableChanges: duplicate (database, table): " +
        ids.diff(ids.distinct).mkString(", "))
    // merged image schema: first-seen field order, loud type-conflict refusal
    import org.apache.spark.sql.types.StructField
    val merged = scala.collection.mutable.LinkedHashMap[String, StructField]()
    for (sp <- specs; f <- sp.imageSchema.fields) merged.get(f.name) match {
      case None => merged(f.name) = f.copy(nullable = true)
      case Some(prev) => require(prev.dataType == f.dataType,
        s"multiTableChanges: field '${f.name}' is ${prev.dataType} in one " +
          s"table and ${f.dataType} in ${sp.database}.${sp.table} — the merged " +
          "from_json schema can carry one type per name; rename one field")
    }
    val mergedSchema = StructType(merged.values.toSeq)
    for (reserved <- Seq("seq", "deleted", "before", "after", "__img", "__key",
        "new_data", "old_data", "database", "table"))
      require(!mergedSchema.fieldNames.contains(reserved),
        s"multiTableChanges reserves output/scratch column name '$reserved' — " +
          s"rename the image field (have: ${mergedSchema.fieldNames.mkString(", ")})")

    // Table-set membership as ONE hash-set probe per row, not a T-term
    // disjunction (T string-compares per row hurts at hundreds of replicated
    // tables; isin over >10 literals compiles to InSet). The pair is encoded
    // NUL-separated — injective because MySQL identifiers cannot contain
    // NUL, so ("a.b","c") never collides with ("a","b.c") the way the
    // dotted topic key would. Still references only the two routing columns,
    // so Catalyst pushes the filter below the envelope-JSON projection.
    specs.foreach(sp => require(
      !sp.database.contains('\u0000') && !sp.table.contains('\u0000'),
      s"multiTableChanges: NUL in identifier '${sp.database}'.'${sp.table}'"))
    val pairKeys = specs.map(sp => sp.database + "\u0000" + sp.table)
    val tableMatch = concat(col("database"), lit("\u0000"), col("table"))
      .isin(pairKeys: _*)
    val env = graft.cdc.EnvelopeBuilder.envelopes(raw)
      .filter(tableMatch)
      .filter(col("event_type").isin("insert", "update", "delete"))
    val dataSchema = StructType(mergedSchema.fields ++
      Seq(StructField("new_data", mergedSchema), StructField("old_data", mergedSchema)))
    val parsed = from_json(col("event"), StructType(Seq(StructField("data", dataSchema))))
      .getField("data")
    def topImage(p: Column): Column =
      struct(mergedSchema.fieldNames.toSeq.map(f => p.getField(f).as(f)): _*)
    env.select(
      col("database"), col("table"),
      packedSeq.as("seq"),
      (col("event_type") === "delete").as("deleted"),
      col("event_type"), parsed.as("__d"))
      .select(
        col("database"), col("table"), col("seq"), col("deleted"),
        when(col("event_type") === "update", col("__d.old_data"))
          .when(col("event_type") === "delete", topImage(col("__d"))).as("before"),
        when(col("event_type") === "update", col("__d.new_data"))
          .when(col("event_type") === "insert", topImage(col("__d"))).as("after"))
  }

  /** Streaming SCD1 replicas of MANY tables in ONE stateful query:
    * [[multiTableChanges]] → [[graft.cdc.Apply.latestStateStream]] keyed by
    * `(database, table, __key)`, where `__key` is the table's primary-key
    * tuple rendered as JSON (`to_json` with `ignoreNullFields=false`, so a
    * null key field stays distinct from an absent one) — per-table key
    * WIDTHS and names may differ freely because the key travels as one
    * value column. One source scan, one checkpoint, one state store holding
    * every table's live keys; output rows carry (database, table, __key,
    * seq, merged payload, _deleted) — split by `table` at the sink.
    *
    * Trade-off vs N single-table queries (documented in COVERAGE.md): one
    * query cannot be rate-limited or restarted per table, and the merged
    * payload widens state-output rows by the other tables' (null) fields;
    * in exchange the wire stream is read and parsed once instead of N
    * times and there is exactly one stateful shuffle. The per-table key
    * projection is a T-branch when-chain evaluated only on matched rows;
    * Spark splits oversized codegen automatically, but past a few hundred
    * tables prefer sharding the spec set across a few queries via
    * [[shardSpecs]] (which also restores per-shard restart isolation). */
  def multiReplicaStream(raw: DataFrame, specs: Seq[TableSpec]): Dataset[Row] = {
    val changes = multiTableChanges(raw, specs)
      .withColumn("__img", coalesce(col("after"), col("before")))
    val keyJson = specs.map { sp =>
      (col("database") === sp.database && col("table") === sp.table,
        to_json(struct(sp.keyCols.map(k => col(s"__img.$k").as(k)): _*),
          Map("ignoreNullFields" -> "false").asJava))
    }.foldRight(lit(null).cast("string")) { case ((cond, json), tail) =>
      when(cond, json).otherwise(tail)
    }
    val mergedFields = changes.schema("before").dataType
      .asInstanceOf[StructType].fieldNames.toSeq
    val keyed = changes
      .withColumn("__key", keyJson)
      .select(Seq(col("database"), col("table"), col("__key"),
        col("seq"), col("deleted")) ++
        mergedFields.map(f => col(s"__img.$f").as(f)): _*)
    graft.cdc.Apply.latestStateStream(keyed,
      Seq("database", "table", "__key"), "seq", "deleted")
  }

  /** The shared `(stmt_seq << 20) + pair_pos` packing with its loud
    * range guard (see [[tableChanges]]'s column docs). */
  private def packedSeq: Column =
    when(col("stmt_seq").between(0L, (1L << 43) - 1) &&
        col("pair_pos") < (1 << 20),
        shiftleft(col("stmt_seq"), 20) + col("pair_pos"))
      .otherwise(raise_error(format_string(
        "Analytics: seq packing out of range (stmt_seq=%s, pair_pos=%s) — " +
          "the (stmt_seq << 20) + pair_pos encoding holds stmt_seq < 2^43 and " +
          "< 2^20 row images per statement",
        col("stmt_seq").cast("string"), col("pair_pos").cast("string"))).cast("long"))

  /** Streaming SCD1 replica of one table: [[tableChanges]] →
    * [[graft.cdc.Apply.latestStateStream]]. Emits, per micro-batch, each
    * key whose current state changed (new current row, or a tombstone with
    * `_deleted = true`); write with `OutputMode.Update`. State per key is
    * one (seq, deleted) record in the state store — RocksDB-sized, not
    * heap-sized, when the session configures the RocksDB provider. */
  def replicaStream(raw: DataFrame, database: String, table: String,
                    imageSchema: StructType, keyCols: Seq[String]): Dataset[Row] = {
    val fields = imageSchema.fieldNames.toSeq
    val missing = keyCols.filterNot(fields.contains)
    require(missing.isEmpty, s"keyCols not in imageSchema: ${missing.mkString(", ")}")
    val changes = tableChanges(raw, database, table, imageSchema)
      // current image: the after for upserts, the before for deletes (keys
      // must come from SOMEWHERE on a delete — its after is null)
      .withColumn("__img", coalesce(col("after"), col("before")))
      .select(Seq(col("seq"), col("deleted")) ++
        fields.map(f => col(s"__img.$f").as(f)): _*)
    graft.cdc.Apply.latestStateStream(changes, keyCols, "seq", "deleted")
  }

  /** Running IVM aggregates over one table's change stream:
    * [[tableChanges]] → [[graft.cdc.Apply.deltaAggregate]] on an unbounded
    * frame — per-group `(rows_delta, <value>_delta)` NET totals maintained
    * continuously from the binlog, exactly once per change under Spark's
    * checkpoint (a replayed micro-batch replaces its own prior update; the
    * aggregation state carries the running sums across restarts). Write
    * with `OutputMode.Update`; state is O(#groups). */
  def runningAggregates(raw: DataFrame, database: String, table: String,
                        imageSchema: StructType, groupCols: Seq[String],
                        valueCol: String): DataFrame = {
    val fields = imageSchema.fieldNames.toSeq
    val missing = (groupCols :+ valueCol).filterNot(fields.contains)
    require(missing.isEmpty, s"columns not in imageSchema: ${missing.mkString(", ")}")
    graft.cdc.Apply.deltaAggregate(
      tableChanges(raw, database, table, imageSchema),
      groupCols, valueCol)
  }
}
