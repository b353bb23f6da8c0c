package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Column ↔ catalyst Expression conversion, which is
  * `private[sql]` in Spark 4 (org.apache.spark.sql.classic.ExpressionUtils).
  * This is the standard third-party-library pattern for registering
  * custom native expressions from the public DataFrame API.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a NATIVE expression builder under a SQL function name on
    * this session (the runtime equivalent of
    * SparkSessionExtensions.injectFunction — usable on an already-built
    * session, e.g. the driver-owned ones in Verify/Bench). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "internal")
}
