package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and catalyst Expressions.
  *
  * Spark 4 Columns wrap ColumnNodes, not Expressions, and the converter
  * (`ExpressionUtils`) is `private[sql]` — so this one file lives under the
  * `org.apache.spark.sql` namespace to reach it. Everything else in the
  * engine stays in `graft.*` against public API only.
  */
object bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Per-session function registration (`SparkSession.sessionState` is
    * `private[sql]` too) — the live-session form of the extensions hook.
    */
  def registerFunction(spark: SparkSession, id: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)

  /** `SerializableConfiguration` is `private[spark]`; sources broadcast ONE
    * copy of the Hadoop conf instead of shipping it inside every partition.
    */
  type SerConf = org.apache.spark.util.SerializableConfiguration
  def serializableConf(c: org.apache.hadoop.conf.Configuration): SerConf =
    new org.apache.spark.util.SerializableConfiguration(c)
}
