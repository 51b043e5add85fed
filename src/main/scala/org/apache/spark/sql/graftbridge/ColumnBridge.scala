package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. Spark 4 made these conversions
  * `private[sql]` (Connect refactor); extension libraries reach them from
  * a subpackage of org.apache.spark.sql — the standard technique for
  * Catalyst-level extensions.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Register a SQL temp function backed by a Column-expression rewrite
    * (inlines into the plan — not a UDF). The session's converter turns
    * the Column tree into a fully-converted catalyst Expression (the
    * bare ExpressionUtils wrapper would leave an unconvertible
    * ColumnNodeExpression in the plan). */
  def registerExprFunction(spark: SparkSession, name: String,
      f: Seq[Column] => Column): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, es => classic.expression(f(es.map(column))), "internal")
  }
}
