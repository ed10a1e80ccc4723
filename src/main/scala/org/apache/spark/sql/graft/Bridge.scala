package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Minimal bridge into Spark's `private[sql]` Column ⇄ Expression converters,
  * so graft's native Catalyst expressions (e.g. [[graft.cdc.MatchAnyRegex]])
  * can be used through the public Column API. Lives under
  * `org.apache.spark.sql` purely for access; contains no Spark-internal logic. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Lazy wrapper (ColumnNodeExpression): fine when the expression is handed
    * straight to a Dataset operation, which converts during analysis. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER conversion to a real Catalyst expression tree. Required when the
    * caller inspects or wraps the result at PARSE time — e.g. a SQL
    * FunctionBuilder whose output feeds field extraction (`f(x).field`): the
    * lazy wrapper reports VOID until analysis, so ExtractValue rejects it. */
  def eagerExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
