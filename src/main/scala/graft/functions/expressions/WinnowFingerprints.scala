package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The complete winnowing fingerprint set of a string in ONE primitive
  * pass: all k-gram Rabin-Karp rolling hashes, the minimum of every
  * w-hash window (monotonic deque — O(n) total, not O(n·w)), then
  * sort + unique. Returns the DISTINCT fingerprint values as a sorted
  * `array<bigint>`.
  *
  * Semantically identical to the composed form
  * `array_distinct(transform(sequence(...), i -> array_min(slice(h,i,w))))`
  * over [[RabinKarpHashes]] output (same B=131, M=1e9+7 polynomial —
  * spec-pinned equivalence in PropertySpec), but where the composed
  * higher-order functions allocate a boxed w-element slice per window
  * position, this runs entirely over primitive long arrays. On the sf0.1
  * fingerprint sweep the composition burned ~30 cpu-seconds; the fused
  * pass is the shape that survives a 100 TB corpus, where per-byte
  * constants dominate the bill.
  *
  * Output order: ascending (the distinct SET is the fingerprint; callers
  * explode + sort, so set equality is the contract — the composed form's
  * first-occurrence order and this sorted order agree after the sort).
  *
  * Codegen calls the same static [[WinnowFingerprints.compute]] as eval
  * (one invocation per row amortized over the whole-document loop), so
  * the expression stays inside the WholeStageCodegen span without
  * duplicating the deque logic in generated Java.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && w >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, k >= 1 and w >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.WinnowFingerprints.compute($s, $k, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val B = 131L
  private val M = 1000000007L

  /** Shared by eval and codegen. Returns the sorted distinct window-min
    * fingerprints; empty when the string is shorter than k + w - 1 bytes
    * (no complete window exists). */
  def compute(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val n = s.numBytes()
    // long arithmetic: SQL-supplied k/w near Int.MaxValue must take the
    // empty branch here, not overflow past the guard and spin/crash
    if (n.toLong < k.toLong + w.toLong - 1L) return Array.emptyLongArray
    // B^(k-1) mod M for the rolling eviction term
    var bPow = 1L
    var j = 0
    while (j < k - 1) { bPow = bPow * B % M; j += 1 }

    val m = n - k + 1 // number of k-gram hashes
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (s.getByte(i) & 0xffL)) % M; i += 1 }
    hs(0) = h
    i = k
    while (i < n) {
      h = (h + M - (s.getByte(i - k) & 0xffL) * bPow % M) % M
      h = (h * B + (s.getByte(i) & 0xffL)) % M
      hs(i - k + 1) = h
      i += 1
    }

    // sliding-window min over hs, width w: monotonic index deque.
    // Popping on >= keeps the rightmost minimal index; only the VALUE is
    // emitted, so the tie choice is invisible downstream.
    val nm = m - w + 1
    val mins = new Array[Long](nm)
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = hs(dq(head))
      i += 1
    }

    java.util.Arrays.sort(mins)
    var u = 1
    i = 1
    while (i < nm) {
      if (mins(i) != mins(i - 1)) { mins(u) = mins(i); u += 1 }
      i += 1
    }
    if (u == nm) mins else java.util.Arrays.copyOf(mins, u)
  }

  /** Column entry point over a column reference. */
  def winnowFingerprints(colName: String, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quotedString(colName), k, w))
}
