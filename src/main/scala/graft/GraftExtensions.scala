package graft

import graft.functions.expressions.LongDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring: makes the engine's catalyst-level additions
  * available by config instead of imperative registration —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * Currently injects `long_dot_product` (the codegen'd similarity kernel)
  * as a SQL function. Play-parser SQL functions remain per-session
  * (`PlayFunctions.registerSql`) because they are expression rewrites
  * bound to a session's function registry, not standalone expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("long_dot_product"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "long_dot_product"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"long_dot_product requires exactly 2 arguments, got ${children.size}")
        LongDotProduct(children(0), children(1))
      }))
  }
}
