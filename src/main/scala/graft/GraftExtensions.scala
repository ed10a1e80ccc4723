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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("match_any_regex"),
      new ExpressionInfo(classOf[MatchAnyRegex].getName, "match_any_regex"),
      (children: Seq[Expression]) => {
        require(children.nonEmpty, "match_any_regex(topic, patterns...)")
        MatchAnyRegex(children.head, children.tail.flatMap(asStrings))
      }))
  }
}
