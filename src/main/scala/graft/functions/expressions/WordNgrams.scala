package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All word n-grams of a string as `array<string>` — the shingle
  * primitive behind the minhash family, bigram counting and repetition
  * scoring.
  *
  * Semantics are exactly the composed form
  *   `transform(sequence(0, size(t)-n), i -> array_join(slice(t, i+1, n), " "))`
  * over `t = split(text, ' ')` (single-space separator, Spark's
  * trailing-empty-keeping split): because the tokens are re-joined with
  * the SAME single-space separator they were split on, each n-gram IS a
  * substring of the original text between space boundaries — including
  * the empty tokens consecutive/leading/trailing spaces produce. This
  * expression therefore emits zero-copy byte VIEWS over one byte array
  * per document, where the composed form allocates a token array plus a
  * boxed slice and a joined string per n-gram position — the per-byte
  * constant that dominates a 100 TB shingling pass. Returns an empty
  * array when the document has fewer than n tokens (callers explode or
  * filter on emptiness, matching the composed form's size(t) >= n gate).
  *
  * Byte-level scanning is UTF-8-safe: 0x20 never occurs inside a
  * multi-byte UTF-8 sequence.
  *
  * Codegen calls the same static [[WordNgrams.compute]] as eval (one
  * invocation per row amortized over the whole-document scan), so the
  * expression stays inside the WholeStageCodegen span.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and n >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WordNgrams.compute(input.asInstanceOf[UTF8String], n)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.expressions.WordNgrams.compute($s, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  /** Shared by eval and codegen. One byte copy per document; each n-gram
    * is a view into it. */
  def compute(s: UTF8String, n: Int): Array[UTF8String] = {
    val b = s.getBytes
    val len = b.length
    // token boundaries: token j starts after space j-1 and ends at space j
    var spaces = 0
    var i = 0
    while (i < len) { if (b(i) == 0x20) spaces += 1; i += 1 }
    val t = spaces + 1 // split(_, ' ') keeps leading/trailing empties
    if (t < n) return WordNgrams.empty
    // starts(j) = byte offset of token j; ends(j) = exclusive end
    val starts = new Array[Int](t)
    val ends = new Array[Int](t)
    starts(0) = 0
    var j = 0
    i = 0
    while (i < len) {
      if (b(i) == 0x20) { ends(j) = i; j += 1; starts(j) = i + 1 }
      i += 1
    }
    ends(t - 1) = len
    val out = new Array[UTF8String](t - n + 1)
    i = 0
    while (i <= t - n) {
      out(i) = UTF8String.fromBytes(b, starts(i), ends(i + n - 1) - starts(i))
      i += 1
    }
    out
  }

  private val empty = new Array[UTF8String](0)

  /** Column entry point over a column reference. */
  def wordNgrams(colName: String, n: Int): Column =
    ColumnBridge.column(WordNgrams(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quotedString(colName), n))
}
