package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CDC apply: turn the delivered change stream back into tables.
  *
  * The reference delivers "insert, update and delete with the original data"
  * to downstream consumers (`/root/reference/readme.md:3-4`); the canonical
  * consumer maintains a replica — latest row per primary key (SCD Type 1) or
  * the full change history with validity intervals (SCD Type 2). The
  * reference leaves that half to the user; here it is a first-class operator.
  *
  * Scale posture (100 TB of changes):
  *  - [[latestState]] is ONE hash shuffle on the PK with a map-side-combined
  *    `max_by` partial aggregate — each map task reduces its input to at most
  *    one row per key before the exchange, and nothing is ever sorted. This
  *    beats the row_number-window formulation, which must shuffle EVERY
  *    change row and sort each key's history just to pick one row.
  *  - [[history]] needs each key's changes in sequence order, so it is the
  *    honest window shape: hash-partition by key, in-partition sort — never a
  *    global sort, parallelism = #keys.
  *  - [[latestStateStream]] holds one (seq, row) pair per key in the state
  *    store — O(#live keys), not O(#changes) — and conflates within a batch.
  *
  * Sequence numbers must be unique per key (binlog positions are globally
  * unique, so any CDC-derived `seqCol` satisfies this); ties would make the
  * winner nondeterministic and are the caller's bug, not silently resolved.
  */
object Apply {

  /** SCD1 replica materialization: the latest change per key wins; a winning
    * delete tombstones the key out of the result. Output columns: the keys,
    * then `seqCol` (the winning change's sequence), then the remaining payload
    * columns of `changes`, in input order. */
  def latestState(changes: DataFrame, keyCols: Seq[String], seqCol: String,
                  isDelete: Column): DataFrame = {
    requireCols(changes, keyCols :+ seqCol)
    require(!changes.columns.contains("_is_delete") && !changes.columns.contains("_last"),
      "latestState reserves column names _is_delete and _last")
    val payload = changes.columns.filterNot(c => keyCols.contains(c) || c == seqCol)
    val tagged = changes.withColumn("_is_delete", isDelete)
    val packed = struct((seqCol +: "_is_delete" +: payload).map(col): _*)
    tagged
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(packed, col(seqCol)).as("_last"))
      .filter(!col("_last._is_delete"))
      .select(keyCols.map(col) ++ (seqCol +: payload).map(c => col(s"_last.$c").as(c)): _*)
  }

  /** SCD2 change history: every upsert becomes a version row valid from its
    * own sequence until the key's NEXT change of any kind (a later upsert
    * supersedes it; a later delete closes it). `valid_to` is NULL — and
    * `is_current` true — only for a key's final change when that change is an
    * upsert. Deletes emit no row of their own. */
  def history(changes: DataFrame, keyCols: Seq[String], seqCol: String,
              isDelete: Column): DataFrame = {
    requireCols(changes, keyCols :+ seqCol)
    require(!changes.columns.exists(Set("valid_from", "valid_to", "is_current")),
      "history reserves column names valid_from/valid_to/is_current")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(!isDelete)
      .withColumnRenamed(seqCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental aggregate maintenance (IVM deltas): the net effect of a
    * change batch on per-group (count, sum) aggregates, WITHOUT scanning the
    * replica. Each change contributes signed rows — its before-image at −1,
    * its after-image at +1 — so inserts add, deletes subtract, and an update
    * that moves a row between groups debits one group and credits the other.
    * `beforeCol`/`afterCol` are struct columns (null on insert/delete
    * respectively) carrying `groupCols` and `valueCol` fields.
    *
    * One shuffle on the group keys with map-side-combined sums; the ≤2×
    * contribution explode collapses in the partial aggregate before the
    * exchange. On an unbounded frame the same fragment is a running net
    * aggregate in Update mode — continuous stat maintenance from the binlog,
    * state O(#groups). */
  def deltaAggregate(changes: DataFrame, groupCols: Seq[String], valueCol: String,
                     beforeCol: String = "before", afterCol: String = "after"): DataFrame = {
    requireCols(changes, Seq(beforeCol, afterCol))
    for (c <- Seq(beforeCol, afterCol)) changes.schema(c).dataType match {
      case s: org.apache.spark.sql.types.StructType =>
        val missing = (groupCols :+ valueCol).filterNot(s.fieldNames.contains)
        require(missing.isEmpty, s"image struct '$c' lacks fields: ${missing.mkString(", ")}")
      case other => throw new IllegalArgumentException(
        s"deltaAggregate: '$c' must be a STRUCT image column, got $other")
    }
    val contrib = changes.select(explode(filter(array(
        struct(lit(-1L).as("sign"), col(beforeCol).as("img")),
        struct(lit(1L).as("sign"), col(afterCol).as("img"))),
      x => x.getField("img").isNotNull)).as("c"))
    contrib
      .groupBy(groupCols.map(g => col("c.img").getField(g).as(g)): _*)
      .agg(sum(col("c.sign")).as("rows_delta"),
        sum(col("c.sign") * col("c.img").getField(valueCol)).as(s"${valueCol}_delta"))
  }

  /** Streaming SCD1: per micro-batch, emit each key whose current state
    * changed — the new current row, or a tombstone row (`_deleted = true`,
    * payload nulled) when a delete won. Out-of-order and replayed changes are
    * ignored when the stored sequence is already newer (at-least-once safe).
    *
    * Input must carry: the key columns, a Long `seqCol`, a Boolean
    * `deleteCol`, and the payload. State per key is the one latest (seq,
    * deleted, payload-json) triple. Use `OutputMode.Update` downstream.
    */
  def latestStateStream(changes: DataFrame, keyCols: Seq[String], seqCol: String,
                        deleteCol: String): Dataset[Row] = {
    import org.apache.spark.sql.Encoders
    requireCols(changes, keyCols ++ Seq(seqCol, deleteCol))
    require(changes.schema(seqCol).dataType == org.apache.spark.sql.types.LongType,
      s"latestStateStream: '$seqCol' must be BIGINT (binlog positions), got " +
        changes.schema(seqCol).dataType)
    require(changes.schema(deleteCol).dataType == org.apache.spark.sql.types.BooleanType,
      s"latestStateStream: '$deleteCol' must be BOOLEAN, got " +
        changes.schema(deleteCol).dataType)
    // The grouping key is built from each key field's JVM rendering
    // (encodeKey). That is only value-based for atomic types — an
    // ArrayType/MapType/StructType key field surfaces as a JVM object whose
    // toString may be identity-based, which would fragment state per row
    // object (equal keys land in different groups; tombstones never suppress).
    // BinaryType is the one non-toString-safe atomic we support: encodeKey
    // hex-encodes it. Everything else non-atomic is refused loudly.
    keyCols.foreach { k =>
      import org.apache.spark.sql.types._
      val ok = changes.schema(k).dataType match {
        case StringType | BooleanType | ByteType | ShortType | IntegerType |
             LongType | FloatType | DoubleType | DateType | TimestampType |
             TimestampNTZType | BinaryType => true
        case _: DecimalType => true
        case _ => false // Array/Map/Struct, intervals, …
      }
      require(ok,
        s"latestStateStream: key column '$k' has non-atomic type " +
          s"${changes.schema(k).dataType} — its JVM rendering is not " +
          "value-based, so equal keys would fragment into distinct state " +
          "entries. Project the key to an atomic type (e.g. to_json for " +
          "structs, hex for nested binary) before applying.")
    }
    val spark = changes.sparkSession
    val payload = changes.columns.filterNot(c => keyCols.contains(c) || c == seqCol || c == deleteCol)
    val outSchema = org.apache.spark.sql.types.StructType(
      keyCols.map(changes.schema(_)) ++
        Seq(changes.schema(seqCol)) ++
        // payload fields forced nullable: tombstone rows null them out
        payload.map(c => changes.schema(c).copy(nullable = true)) :+
        org.apache.spark.sql.types.StructField("_deleted", org.apache.spark.sql.types.BooleanType, nullable = false))
    val rowEnc = Encoders.row(outSchema)
    val n = keyCols.length

    // Key string, then (seq, deleted, payload values) as a stable tuple row.
    // The grouping key must be INJECTIVE over the composite key: a plain
    // separator-join collides whenever a value embeds the separator byte, and
    // String.valueOf renders null as "null", colliding with that literal
    // string. encodeKey length-prefixes each part (prefix-free, so no
    // concatenation ambiguity) and gives null a marker no prefixed part can
    // start with.
    val keyed = changes
      .select((keyCols.map(col) :+ col(seqCol) :+ col(deleteCol)) ++ payload.map(col): _*)
      .groupByKey((r: Row) => encodeKey(r, n))(Encoders.STRING)

    keyed.flatMapGroupsWithState[ApplyState, Row](
      OutputMode.Update, GroupStateTimeout.NoTimeout) {
      (_: String, rows: Iterator[Row], state: GroupState[ApplyState]) =>
        // conflate the batch: only the max-seq change for this key can matter
        val best = rows.maxBy(_.getLong(n))
        val seq = best.getLong(n)
        val prior = state.getOption
        if (prior.exists(_.seq >= seq)) Iterator.empty
        else {
          val deleted = best.getBoolean(n + 1)
          state.update(ApplyState(seq, deleted))
          val keys = (0 until n).map(best.get)
          val pay =
            if (deleted) payload.indices.map(_ => null)
            else payload.indices.map(i => best.get(n + 2 + i))
          Iterator(Row.fromSeq(keys ++ (seq +: pay) :+ deleted))
        }
    }(Encoders.product[ApplyState], rowEnc)
  }

  /** Injective string encoding of the first `n` fields of a row, used as the
    * streaming state-store grouping key. Each non-null part is emitted as
    * "<len>:<chars>" over its String.valueOf rendering; null parts emit the
    * single marker "N"; binary parts (Array[Byte] — e.g. a MySQL BINARY(16)
    * UUID PK, whose JVM toString is identity-based and would fragment state
    * per row object) emit "B<hexlen>:<hex>" over their value-based hex
    * rendering. The encoding is prefix-free — every part's extent is declared
    * by its own length, and the three part shapes start with disjoint
    * characters (digit / 'N' / 'B') — so distinct composite keys can never
    * concatenate to the same string, null never collides with the string
    * "null" (which encodes as "4:null"), binary 0x31 never collides with the
    * string "1", and embedded separators/spaces in values are harmless.
    *
    * Float/double key caveat: -0.0 and 0.0 (and distinct NaN payloads)
    * encode DISTINCTLY here, while SQL grouping normalizes them equal — a
    * float PK is pathological, but if you have one, normalize it (or cast
    * to string) upstream; prefer integer/string/binary keys. */
  private[cdc] def encodeKey(r: Row, n: Int): String = {
    val sb = new java.lang.StringBuilder(16 * n)
    var i = 0
    while (i < n) {
      r.get(i) match {
        case null => sb.append('N')
        case b: Array[Byte] =>
          sb.append('B').append(b.length * 2).append(':')
          var j = 0
          while (j < b.length) {
            sb.append(Character.forDigit((b(j) >> 4) & 0xF, 16))
              .append(Character.forDigit(b(j) & 0xF, 16))
            j += 1
          }
        case v =>
          val s = String.valueOf(v)
          sb.append(s.length).append(':').append(s)
      }
      i += 1
    }
    sb.toString
  }

  private def requireCols(df: DataFrame, cols: Seq[String]): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"missing column(s): ${missing.mkString(", ")} (have: ${df.columns.mkString(", ")})")
  }
}

/** Per-key streaming state: the latest applied sequence and whether it was a
  * delete (payload need not be retained — emission happens on transition). */
final case class ApplyState(seq: Long, deleted: Boolean)
