package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` plumbing for graft's native Catalyst
  * expressions — the standard pattern for third-party Spark extension
  * libraries (a Column cannot be built from an Expression through public
  * API in Spark 4's unified Column).
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register an expression builder so it is callable from SQL text. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Apply the function injections collected in `ext` to a live session's
    * registry — lets a test prove a SparkSessionExtensions entry point
    * (normally applied only at session construction from
    * `spark.sql.extensions`) registers what it claims, without tearing
    * down the shared test session. `registerFunctions` is private[sql].
    */
  def applyInjectedFunctions(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
