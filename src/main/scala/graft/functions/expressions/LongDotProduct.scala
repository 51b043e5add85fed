package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd dot product of two `array<bigint>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` — is
  * correct but runs on the interpreted higher-order-function path: one
  * lambda dispatch and two boxed array allocations per row. In the
  * similarity hot loops (brute-force top-k, LSH verify) the dot product
  * IS the inner loop over candidates × dimensions, which makes this the
  * one place in the engine where a custom `Expression` with `doGenCode`
  * is justified (SURVEY.md §4 preference ladder: compose built-ins →
  * custom Expression → custom operator). Semantics are identical to the
  * fold: null if either side is null OR the lengths differ (zip_with
  * null-pads the shorter array, poisoning the fold), sequential
  * accumulation otherwise.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot_product"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    if (xs.numElements() != ys.numElements()) null
    else {
      val n = xs.numElements()
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += xs.getLong(i) * ys.getLong(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  /** Column-API entry point over column references (the hot-loop shape).
    * Children are plain UnresolvedAttributes so the analyzer resolves
    * them on the standard path — no ColumnNode wrappers in the tree.
    */
  def longDot(aCol: String, bCol: String): Column =
    ColumnBridge.column(LongDotProduct(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quotedString(aCol),
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quotedString(bCol)))
}
