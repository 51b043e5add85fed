package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-gram Rabin-Karp hashes of a string as `array<bigint>` — the
  * rolling-hash primitive behind winnowing document fingerprints.
  *
  * Hash of the k-gram at byte offset i:
  *   h(i) = (Σ_{j<k} byte(i+j) · B^(k-1-j)) mod M,  B=131, M=1e9+7
  * computed with the O(1)-per-position rolling update
  *   h(i+1) = ((h(i) − byte(i)·B^(k-1)) · B + byte(i+k)) mod M
  * so the whole array is O(n) instead of O(n·k) — this is why it's a
  * custom codegen Expression rather than a transform/sequence
  * composition (which would re-sum every k-gram). Values are identical
  * to the naive polynomial (mod-congruence), which is what the DuckDB
  * oracle computes for the hash-compare.
  *
  * Byte-based: equals character/`ascii()` semantics for ASCII text
  * (the fixtures; multi-byte UTF-8 still hashes deterministically,
  * just over bytes).
  */
case class RabinKarpHashes(child: Expression, k: Int)
    extends UnaryExpression {
  private val B = 131L
  private val M = 1000000007L
  /** B^(k-1) mod M */
  private val bPow: Long = {
    var p = 1L
    var i = 0
    while (i < k - 1) { p = p * B % M; i += 1 }
    p
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and k >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rabin_karp_hashes"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    if (n < k) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](n - k + 1)
      var h = 0L
      var i = 0
      while (i < k) { h = (h * B + (s.getByte(i) & 0xffL)) % M; i += 1 }
      out(0) = h
      i = k
      while (i < n) {
        h = (h + M - (s.getByte(i - k) & 0xffL) * bPow % M) % M
        h = (h * B + (s.getByte(i) & 0xffL)) % M
        out(i - k + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |int $n = $s.numBytes();
         |long[] $out = ($n < $k) ? new long[0] : new long[$n - $k + 1];
         |if ($n >= $k) {
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    $h = ($h * ${B}L + ($s.getByte($i) & 0xffL)) % ${M}L;
         |  }
         |  $out[0] = $h;
         |  for (int $i = $k; $i < $n; $i++) {
         |    $h = ($h + ${M}L - ($s.getByte($i - $k) & 0xffL) * ${bPow}L % ${M}L) % ${M}L;
         |    $h = ($h * ${B}L + ($s.getByte($i) & 0xffL)) % ${M}L;
         |    $out[$i - $k + 1] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RabinKarpHashes {
  /** Column entry point over a column reference. */
  def rollingHashes(colName: String, k: Int): Column =
    ColumnBridge.column(RabinKarpHashes(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quotedString(colName), k))
}
