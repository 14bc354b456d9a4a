package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made the Column↔Expression converters `private[sql]`
  * (`classic.ExpressionUtils`); extension libraries that ship native
  * Catalyst expressions (our `StaticInvoke`-based codegen functions)
  * need exactly these two calls, so this one-file shim lives in an
  * `org.apache.spark.sql` subpackage — the conventional pattern for
  * Spark-native extension libraries. No other Spark internals are
  * touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
