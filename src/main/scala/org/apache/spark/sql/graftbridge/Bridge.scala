package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for Spark's private[sql] Column <-> Expression
  * conversions (Spark 4 moved them behind the classic module). Lives in
  * an org.apache.spark.sql subpackage solely to satisfy the access
  * modifier; nothing else of Spark's internals is touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom expression as a SQL-callable function on an
    * existing session (the builder-time alternative is
    * `SparkSessionExtensions.injectFunction`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Apply a SparkSessionExtensions' injected functions to an existing
    * session's registry — what the session builder does at construction;
    * exposed (private[sql]) so tests can exercise the extensions hook
    * without tearing down the shared session. */
  def applyExtensionFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
                              spark: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
