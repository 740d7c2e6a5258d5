package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.bridge

/** Column ⇄ catalyst Expression helpers (Spark 4 Columns wrap ColumnNodes,
  * not Expressions directly — see [[org.apache.spark.sql.graftbridge.bridge]]).
  */
package object expressions {
  private[graft] def expr(c: Column): Expression = bridge.toExpression(c)
  private[graft] def col(e: Expression): Column = bridge.toColumn(e)
}
