package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.MatchAnyRegex

/** SQL-surface registration for graft's native expressions via the public
  * `SparkSessionExtensions` API (enable with
  * `spark.sql.extensions=graft.GraftExtensions`, wired in [[GraftSession]]).
  *
  * `match_any_regex(topic, 'p1', 'p2', ...)` or
  * `match_any_regex(topic, array('p1', 'p2'))` — the F1 topic filter with
  * reference semantics (empty set ⇒ true, unanchored, invalid pattern never
  * matches), patterns folded at plan time into the precompiled expression. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def asStrings(e: Expression): Seq[String] = e match {
    case Literal(null, _) => Seq.empty
    case Literal(s: UTF8String, StringType) => Seq(s.toString)
    case l @ Literal(a: ArrayData, ArrayType(StringType, _)) =>
      a.toArray[UTF8String](StringType).map(_.toString).toSeq
    case other if other.foldable => other.eval() match {
      case null => Seq.empty
      case s: UTF8String => Seq(s.toString)
      case a: ArrayData => a.toArray[UTF8String](StringType).map(_.toString).toSeq
      case x => throw new IllegalArgumentException(s"match_any_regex: bad pattern arg $x")
    }
    case other =>
      throw new IllegalArgumentException(
        s"match_any_regex patterns must be foldable literals, got: ${other.sql}")
  }

  /** Register a Column-composition operator as a SQL function: the builder
    * wraps the parsed child expressions as Columns, applies the same
    * composition the Scala API uses, and unwraps the resulting expression
    * tree — so the SQL form IS the Scala form (identical plan, full codegen),
    * not a UDF shadow of it. */
  private def columnFn(ext: SparkSessionExtensions, name: String, arity: Int,
                       f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo("graft.GraftExtensions", name),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name expects $arity argument(s)")
        // Eager conversion: the parser may wrap this call in ExtractValue
        // (`graft_repetition(t).top_word_pm`) before analysis runs, and the
        // lazy ColumnNodeExpression wrapper reports VOID until then.
        org.apache.spark.sql.graft.Bridge.eagerExpression(
          f(children.map(org.apache.spark.sql.graft.Bridge.column)))
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("match_any_regex"),
      new ExpressionInfo(classOf[MatchAnyRegex].getName, "match_any_regex"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty, "match_any_regex(topic, patterns...)")
        MatchAnyRegex(children.head, children.tail.flatMap(asStrings))
      }))
    // Text-analysis / curation scalar surface (SURVEY §2.1b + LLM ops).
    import graft.llm.TextAnalysis
    import graft.functions.StringFns
    columnFn(ext, "graft_scrub", 1, a => TextAnalysis.scrub(a.head))
    columnFn(ext, "graft_fingerprint", 1, a => TextAnalysis.fingerprintCol(a.head))
    columnFn(ext, "graft_lang_id", 1, a => TextAnalysis.langId(a.head))
    columnFn(ext, "graft_ws_tokens", 1, a => TextAnalysis.wsTokens(a.head))
    columnFn(ext, "graft_subword_tokens", 1, a => TextAnalysis.subwordTokens(a.head))
    columnFn(ext, "graft_repetition", 1, a => TextAnalysis.repetitionSignals(a.head))
    columnFn(ext, "graft_to_int", 1, a => StringFns.toIntDigitRun(a.head))
    columnFn(ext, "graft_to_float", 1, a => StringFns.toFloatDigitRun(a.head))
  }
}
