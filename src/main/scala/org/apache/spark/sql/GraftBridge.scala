package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for the `private[sql]` Column ⇄ Expression converters,
  * so graft's native codegen expressions (e.g.
  * `graft.sql.expressions.HyperplaneSignature`) can be used as `Column`s
  * without registering a function in every session.
  *
  * This is the ONLY graft file living under `org.apache.spark`; everything
  * else uses public APIs (unlike the reference, which placed all its code
  * in Spark-internal packages).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The session's table-function registry — lets graft register its SQL
    * table functions (asof_join/range_join) into an EXISTING session,
    * where `SparkSessionExtensions` can no longer apply (getOrCreate only
    * runs extensions when it CREATES the session).
    */
  def tableFunctionRegistry(
      spark: SparkSession): org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
}
