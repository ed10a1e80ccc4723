package graft.cdc

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema registry for drift handling (SURVEY §7.4).
  *
  * The reference keeps ONE live schema per table (go-mysql's canal re-fetches
  * `SHOW FULL COLUMNS` on DDL, `vendor/.../canal/canal.go:282-305`) and its
  * readme warns that envelopes decoded around an ALTER can be wrong
  * (`/root/reference/readme.md:54`). This registry does better: every ALTER
  * creates a new immutable VERSION effective from its binlog sequence, so a
  * micro-batch that straddles one or more ALTERs decodes every row with the
  * schema that was live AT THAT ROW's position — including replays (versions
  * are keyed by sequence, so re-applying a batch is idempotent).
  *
  * Registry state is driver-side metadata (tables × versions — control-plane
  * scale, like the reference's `schema.Table` cache); the row decode itself is
  * plan-time specialized per version ([[EnvelopeBuilder.envelopesStatic]]) and
  * runs fully codegen'd on the executors. At 1000 executors the registry adds
  * NO distributed state: each version slice is an ordinary filtered projection.
  */
final class SchemaRegistry {
  import SchemaRegistry._

  // (db, table) -> versions sorted by sinceSeq. Guarded by `this`: mutation is
  // a between-batches control-plane event, never on the executor hot path.
  private var tables = Map.empty[(String, String), Vector[Version]]

  /** Register a table's base schema, effective for every sequence (v1). */
  def register(db: String, table: String, cols: Seq[Decode.ColMeta]): Unit = synchronized {
    tables += (db, table) -> Vector(Version(1, Long.MinValue, cols))
  }

  /** Apply an ALTER effective from `sinceSeq` (the DDL statement's binlog
    * sequence: the row images that FOLLOW it were written under the new
    * schema). Idempotent on (db, table, sinceSeq): replaying the batch that
    * carried the ALTER re-derives the same version instead of stacking a new
    * one — the registry analogue of replay-stable event numbering. */
  def applyAlter(db: String, table: String, sinceSeq: Long, ddl: String): Unit = synchronized {
    val key = (db, table)
    tables.get(key).foreach { vs =>
      val base = vs.takeWhile(_.sinceSeq < sinceSeq)
      if (base.isEmpty) () // ALTER before the base schema's range: ignore
      else {
        val cols = parseAlter(ddl).foldLeft(base.last.cols)(applyOp)
        tables += key -> (base :+ Version(base.size + 1, sinceSeq, cols))
      }
    }
  }

  /** The schema live at `seq`, or None for an unregistered table. */
  def schemaAt(db: String, table: String, seq: Long): Option[Version] =
    synchronized(tables.get((db, table))).flatMap(_.reverseIterator.find(_.sinceSeq <= seq))

  def versionsOf(db: String, table: String): Vector[Version] =
    synchronized(tables.getOrElse((db, table), Vector.empty))

  def registeredTables: Seq[(String, String)] = synchronized(tables.keys.toSeq.sorted)

  /** Decode one positional micro-batch under drift. Input columns are the raw
    * statement mirror with POSITIONAL row images and the DDL text on alters:
    * `database, table, action, ts, stmt_seq, rows ARRAY<ARRAY<STRING>>,
    * query STRING` (`query` is null except on `action='alter'`, like
    * canal's `OnDDL` carrying the statement).
    *
    * Steps:
    *  1. Collect the batch's ALTER statements (control-plane events — rare by
    *     nature; this collect is O(#DDL), the same driver-side shape as the
    *     reference's OnDDL callback) and fold them into the registry in
    *     sequence order.
    *  2. For every registered table, plan one [[EnvelopeBuilder.envelopesStatic]]
    *     slice per version interval overlapping the batch and union the
    *     slices: each row decodes under the schema live at its position, every
    *     slice is a codegen'd filtered projection, and the union introduces no
    *     shuffle. Unregistered tables' rows are dropped (the caller either
    *     registers schemas up front or routes those tables to the
    *     schema-agnostic [[EnvelopeBuilder.fromPositional]] path).
    */
  def decodeBatch(batch: DataFrame): DataFrame = {
    val alters = batch
      .filter(col("action") === "alter" && col("query").isNotNull)
      .select(col("database"), col("table"), col("stmt_seq"), col("query"))
      .collect()
      .sortBy(_.getLong(2))
    alters.foreach(r => applyAlter(r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))

    val base = batch.drop("query")
    val slices = for {
      (db, tbl) <- registeredTables
      vs = versionsOf(db, tbl)
      (v, i) <- vs.zipWithIndex
    } yield {
      val untilSeq = if (i + 1 < vs.size) vs(i + 1).sinceSeq else Long.MaxValue
      val slice = base.filter(
        col("database") === db && col("table") === tbl &&
          col("stmt_seq") >= v.sinceSeq && col("stmt_seq") < untilSeq)
      EnvelopeBuilder.envelopesStatic(slice, v.cols)
        .withColumn("schema_version", lit(v.version))
    }
    require(slices.nonEmpty, "SchemaRegistry.decodeBatch: no registered tables")
    slices.reduceLeft(_.unionAll(_))
  }
}

object SchemaRegistry {

  /** One immutable schema version: live for sequences in
    * `[sinceSeq, nextVersion.sinceSeq)`. */
  final case class Version(version: Int, sinceSeq: Long, cols: Seq[Decode.ColMeta])

  sealed trait AlterOp
  /** `pos`: None = append (MySQL default), Some(None) = FIRST,
    * Some(Some(c)) = AFTER c. */
  final case class AddColumn(meta: Decode.ColMeta, pos: Option[Option[String]]) extends AlterOp
  final case class DropColumn(name: String) extends AlterOp
  final case class ModifyColumn(meta: Decode.ColMeta) extends AlterOp
  final case class ChangeColumn(oldName: String, meta: Decode.ColMeta) extends AlterOp

  /** Column order is POSITIONAL TRUTH: binlog row images are arrays in table
    * column order, so FIRST/AFTER placement decides which array slot a column
    * reads — getting this wrong is exactly the reference's "incorrect json"
    * failure mode. Unknown ops/columns are ignored (canal's tolerance). */
  private[cdc] def applyOp(cols: Seq[Decode.ColMeta], op: AlterOp): Seq[Decode.ColMeta] = op match {
    case AddColumn(m, pos) =>
      val without = cols.filterNot(_.name == m.name)
      pos match {
        case None             => without :+ m
        case Some(None)       => m +: without
        case Some(Some(after)) =>
          val i = without.indexWhere(_.name == after)
          if (i < 0) without :+ m
          else (without.take(i + 1) :+ m) ++ without.drop(i + 1)
      }
    case DropColumn(n)     => cols.filterNot(_.name == n)
    case ModifyColumn(m)   => cols.map(c => if (c.name == m.name) m else c)
    case ChangeColumn(o, m) => cols.map(c => if (c.name == o) m else c)
  }

  private val alterRe = Pattern.compile(
    """(?is)^\s*ALTER\s+TABLE\s+(?:`?[\w$]+`?\s*\.\s*)?`?[\w$]+`?\s+(.*)$""")
  private val addRe = Pattern.compile(
    """(?is)^ADD\s+(?:COLUMN\s+)?(?!(?:INDEX|KEY|CONSTRAINT|PRIMARY|UNIQUE|FULLTEXT|SPATIAL|FOREIGN|PARTITION)\b)`?([\w$]+)`?\s+(.+?)(?:\s+(FIRST)|\s+AFTER\s+`?([\w$]+)`?)?$""")
  private val dropRe = Pattern.compile("""(?is)^DROP\s+(?:COLUMN\s+)?`?([\w$]+)`?\s*$""")
  private val modifyRe = Pattern.compile(
    """(?is)^MODIFY\s+(?:COLUMN\s+)?`?([\w$]+)`?\s+(.+?)(?:\s+FIRST|\s+AFTER\s+`?[\w$]+`?)?$""")
  private val changeRe = Pattern.compile(
    """(?is)^CHANGE\s+(?:COLUMN\s+)?`?([\w$]+)`?\s+`?([\w$]+)`?\s+(.+?)(?:\s+FIRST|\s+AFTER\s+`?[\w$]+`?)?$""")

  /** Parse the MySQL ALTER TABLE subset that affects row-image decode:
    * ADD/DROP/MODIFY/CHANGE COLUMN, comma-separated, with FIRST/AFTER
    * placement. The same regex-over-DDL approach as canal (go-mysql parses
    * DDL with regexes before falling back to a full parser); clauses we don't
    * model (indexes, partitioning, table options) parse to nothing — they
    * don't change the row image. */
  def parseAlter(ddl: String): Seq[AlterOp] = {
    val m = alterRe.matcher(ddl)
    if (!m.matches()) return Nil
    splitClauses(m.group(1)).flatMap { clause =>
      val add = addRe.matcher(clause)
      val drop = dropRe.matcher(clause)
      val mod = modifyRe.matcher(clause)
      val chg = changeRe.matcher(clause)
      if (add.matches()) {
        val pos =
          if (add.group(3) != null) Some(None)
          else if (add.group(4) != null) Some(Some(add.group(4)))
          else None
        Some(AddColumn(colMetaOf(add.group(1), add.group(2)), pos))
      }
      else if (drop.matches()) Some(DropColumn(drop.group(1)))
      else if (mod.matches()) Some(ModifyColumn(colMetaOf(mod.group(1), mod.group(2))))
      else if (chg.matches()) Some(ChangeColumn(chg.group(1), colMetaOf(chg.group(2), chg.group(3))))
      else None
    }
  }

  /** Split an ALTER body on top-level commas (commas inside `enum('a','b')`
    * parens or quoted strings don't split). */
  private def splitClauses(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    body.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' | '`' => quote = ch; cur += ch
        case '('  => depth += 1; cur += ch
        case ')'  => depth -= 1; cur += ch
        case ',' if depth == 0 => out += cur.result().trim; cur.clear()
        case _    => cur += ch
      }
    }
    if (cur.nonEmpty) out += cur.result().trim
    out.result().filter(_.nonEmpty)
  }

  private val enumValsRe = Pattern.compile("""(?is)^(enum|set)\s*\((.*)\)""")

  /** Build [[Decode.ColMeta]] from a MySQL column type spec: the type string
    * itself is the decode dispatch key (`Decode` switches on its prefix,
    * mirroring `util.go:61-146`'s RawType switch); `unsigned` and enum/set
    * value lists are extracted here once, at DDL time. Column-level clauses
    * after the type (NOT NULL, DEFAULT …, COMMENT …) don't affect decode. */
  def colMetaOf(name: String, typeSpec: String): Decode.ColMeta = {
    val spec = typeSpec.trim
    val lower = spec.toLowerCase
    val unsigned = lower.matches("""(?s).*\bunsigned\b.*""")
    val em = enumValsRe.matcher(spec)
    val (enumVals, setVals) =
      if (em.find()) {
        val vals = splitClauses(em.group(2)).map(_.trim.stripPrefix("'").stripSuffix("'"))
        if (em.group(1).equalsIgnoreCase("enum")) (vals, Nil) else (Nil, vals)
      } else (Nil, Nil)
    // Keep only the type token (first word + its parenthesized args) plus the
    // unsigned marker as the rawType — decode dispatches on prefix.
    val typeTok = {
      val t = lower.takeWhile(c => !c.isWhitespace)
      if (unsigned) t + " unsigned" else t
    }
    Decode.ColMeta(name, typeTok, unsigned, enumVals, setVals)
  }
}
