package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

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

  /** Register a TABLE-VALUED function: `SELECT * FROM name(args...)`.
    * The builder receives the (literal) argument expressions during
    * analysis and returns the logical plan the call stands for — the
    * runtime equivalent of SparkSessionExtensions.injectTableFunction. */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "internal")

  /** The analyzed logical plan of a DataFrame — what a table-function
    * builder returns so the composed outer query analyzes against the
    * operator's real output schema. */
  def analyzedPlan(df: Dataset[Row]): LogicalPlan = df.queryExecution.analyzed
}
