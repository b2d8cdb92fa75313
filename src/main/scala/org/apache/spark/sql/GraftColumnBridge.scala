package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge.
  *
  * Spark 4's `Column` wraps a `ColumnNode` rather than an `Expression`, and
  * the converters (`org.apache.spark.sql.classic.ExpressionUtils`) are
  * `private[sql]` — so, like other Spark-native extension libraries, graft
  * hosts this one-file shim inside the `org.apache.spark.sql` package to
  * expose its custom codegen'd expressions (graft.functions.*) through the
  * public Column API. No Spark behavior is modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test hook: run a session-extensions injector and flush its function
    * registrations into `registry` — `SparkSessionExtensions
    * .registerFunctions` is `private[sql]`, so the only other way to observe
    * injection is building a whole new SparkSession in a fresh JVM.
    */
  def applyExtensions(
      f: SparkSessionExtensions => Unit,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit = {
    val ext = new SparkSessionExtensions
    f(ext)
    ext.registerFunctions(registry)
  }
}
