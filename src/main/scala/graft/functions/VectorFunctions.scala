package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as higher-order
  * functions — codegen-friendly, no UDFs (SURVEY.md §2 F12).
  */
object VectorFunctions {
  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Full-precision cosine similarity (float inputs, double accumulate). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Integer fixed-point quantization (6 decimal digits). Sums of
    * quantized products are exact and order-independent — the form used
    * by oracle-checked queries, and the same trick int8-quantized vector
    * search uses at scale.
    */
  def quantize(a: Column, scale: Int = 1000000): Column =
    transform(a, x => round(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product over quantized vectors. */
  def idot(u: Column, v: Column): Column =
    aggregate(zip_with(u, v, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine over quantized vectors: bigint dot/norms (exact), one final
    * double division — bit-identical across engines and shuffle orders.
    * When scoring many pairs, precompute norms per side and divide by
    * them instead (one fold per pair, not three). */
  def cosineQuantized(qa: Column, qb: Column): Column =
    safeCos(idot(qa, qb).cast("double"),
      sqrt(idot(qa, qa).cast("double")) * sqrt(idot(qb, qb).cast("double")))

  /** Cosine from a precomputed dot and norm product, with the zero-vector
    * case pinned to 0.0. Without the guard a vector that quantizes to all
    * zeros (every |component| < 0.5/scale) makes the division 0/0 = NaN,
    * and NaN ORDERS DIFFERENTLY across engines (Spark's Ordering ranks it
    * last under -cos ascending; SQL ORDER BY cos DESC ranks it first), so
    * the zero-similarity definition is what keeps rankings portable. Both
    * engines' query twins share the same CASE. */
  def safeCos(dotD: Column, normProduct: Column): Column =
    when(normProduct === 0.0, lit(0.0)).otherwise(dotD / normProduct)

  /** SQL fragment mirroring [[safeCos]] for the DuckDB oracles. */
  def safeCosSql(dotSql: String, normProductSql: String): String =
    s"CASE WHEN $normProductSql = 0.0 THEN 0.0 ELSE $dotSql / ($normProductSql) END"

  /** Typed centroid aggregator: avg of Array[Float] vectors per group.
    * Built-in `avg` can't take arrays; this is the one custom Aggregator
    * the engine needs (SURVEY.md §2.4). Buffer is (sum vector, count) —
    * associative, merge-safe, spill-friendly.
    */
  class CentroidAggregator(dim: Int)
      extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {
    def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)
    def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dim && i < v.length) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    def finish(b: (Array[Double], Long)): Array[Float] =
      if (b._2 == 0) Array.fill(dim)(0f)
      else b._1.map(s => (s / b._2).toFloat)
    def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder: Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
  }
}
