package graft

import graft.functions.expressions.{LongDotProduct, RabinKarpHashes, WinnowFingerprints, WordNgrams}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring: makes the engine's catalyst-level additions
  * available by config instead of imperative registration —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * Injects the codegen'd custom expressions as SQL functions:
  * `long_dot_product` (the similarity kernel), `rolling_hashes` (the
  * O(n) Rabin-Karp k-gram hasher) and `winnow_fingerprints` (the fused
  * hash → window-min → distinct fingerprint pass). Play-parser SQL
  * functions remain per-session (`PlayFunctions.registerSql`) because
  * they are expression rewrites bound to a session's function registry,
  * not standalone expressions.
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
    ext.injectFunction((
      new FunctionIdentifier("rolling_hashes"),
      new ExpressionInfo(classOf[RabinKarpHashes].getName, "rolling_hashes"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"rolling_hashes requires exactly 2 arguments, got ${children.size}")
        RabinKarpHashes(children(0),
          constIntArg("rolling_hashes", "k", children(1)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        if (children.size != 3)
          throw new IllegalArgumentException(
            s"winnow_fingerprints requires exactly 3 arguments, got ${children.size}")
        WinnowFingerprints(children(0),
          constIntArg("winnow_fingerprints", "k", children(1)),
          constIntArg("winnow_fingerprints", "w", children(2)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => {
        if (children.size != 2)
          throw new IllegalArgumentException(
            s"word_ngrams requires exactly 2 arguments, got ${children.size}")
        WordNgrams(children(0), constIntArg("word_ngrams", "n", children(1)))
      }))
  }

  /** Constant-foldable integral argument, any integer width — CAST(3 AS
    * BIGINT), 2+1, a SMALLINT literal — not just a bare IntegerType
    * Literal. Shared by every injected function's builder. */
  private def constIntArg(fn: String, name: String, e: Expression): Int = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val v = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType if e.foldable =>
        e.eval() match {
          case null => throw new IllegalArgumentException(
            s"$fn: $name must not be NULL")
          case n: Number => n.longValue()
        }
      case _ => throw new IllegalArgumentException(
        s"$fn: $name must be a constant integer expression")
    }
    if (v < 1 || v > Int.MaxValue)
      throw new IllegalArgumentException(s"$fn: $name out of range: $v")
    v.toInt
  }
}
