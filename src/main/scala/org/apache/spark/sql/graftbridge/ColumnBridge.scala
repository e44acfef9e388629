package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The ONE place graft touches Spark-internal (non-public) API. Everything
  * else in the engine builds on the stable public surface; the two escape
  * hatches here each have a pinned contract that must be re-verified on a
  * Spark upgrade (written against Spark 4.1.x):
  *
  *  1. Column <-> Expression conversion. `ExpressionUtils.column/expression`
  *     became `private[sql]` in the Spark 4 Connect refactor, so this
  *     object lives in a subpackage of org.apache.spark.sql solely to reach
  *     it. Contract relied on: a classic-session Column wraps exactly one
  *     catalyst Expression and the two casts are inverses.
  *
  *  2. `CollectTopK` (o.a.s.sql.catalyst.expressions.aggregate, private —
  *     the engine behind pandas-API `nlargest`). Contract relied on:
  *     constructor `(child, num, reverse)`; with reverse=true it keeps the
  *     `num` SMALLEST values by the child type's ordering in a bounded
  *     heap; it is a TypedImperativeAggregate, so map-side partial merge
  *     applies and a per-key ranking shuffles at most k rows per key per
  *     map partition; output array is sorted ascending (rank = position).
  *     If an upgrade breaks it, the fallback is a window row_number <= k
  *     (correct, but shuffles every candidate row) — swap inside
  *     [[collectBottomK]] only, callers are insulated.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column → Expression conversion for FunctionRegistry builders.
    * `expression` wraps the Column in a lazy ColumnNodeExpression whose
    * dataType reports VOID until session resolution — field extraction on
    * a composed struct result (`pii_counts(x).emails`) then fails at
    * analysis. `ColumnNodeToExpressionConverter` (same contract family as
    * escape hatch #1: classic-session singleton, default parser/conf)
    * converts the node tree to real catalyst expressions up front, which
    * the analyzer resolves like any parsed SQL.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Bounded top-k aggregate: the k smallest values of `c`, sorted
    * ascending, with map-side partial merge (see contract #2 above).
    */
  def collectBottomK(c: Column, k: Int): Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
      expression(c), k, true).toAggregateExpression())
}
