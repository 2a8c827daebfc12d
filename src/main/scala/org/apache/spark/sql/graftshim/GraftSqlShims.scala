package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedAggregator}

/** Minimal accessors for `private[sql]` Spark internals the function
  * registry needs (the standard extension-library shim pattern — the
  * file lives under the `org.apache.spark.sql` package namespace
  * solely to satisfy the access modifier; it contains no Spark code).
  *
  * Used by graft.functions.SketchSqlFunctions to (a) route a
  * SQL-registered scalar through the SAME Column-level implementation
  * the Scala API uses, and (b) wrap a typed Aggregator as the
  * aggregate expression `spark.udf.register(name, udaf(...))` would
  * produce — but session-independent, at extension-injection time.
  */
object GraftSqlShims {

  /** Column view of a Catalyst expression (function-builder input). */
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Catalyst expression of a Column (function-builder output). The
    * EAGER default converter, not ExpressionUtils' lazy wrapper — a
    * function builder's output is spliced into a plan mid-analysis,
    * where a deferred ColumnNode wrapper would survive to execution
    * as an Unevaluable node.
    */
  def toExpression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** The aggregate-function expression for a typed Aggregator — what
    * the analyzer wraps into an AggregateExpression when the builder
    * returns it (same path as session-level udaf registration).
    */
  def aggregatorExpression[IN, BUF, OUT](
      name: String,
      agg: Aggregator[IN, BUF, OUT],
      inputEncoder: Encoder[IN],
      children: Seq[Expression]): Expression =
    ScalaAggregator(
      UserDefinedAggregator(agg, inputEncoder, givenName = Some(name)),
      children.toIndexedSeq)
}
