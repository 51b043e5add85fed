package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All seven per-document text-statistics counters in ONE byte pass,
  * as `struct<n_chars, n_tokens, n_types, n_stop, n_split, n_punct,
  * n_bpe int>`. Each field is exactly the count the composed column
  * form computes (spec-pinned equivalence):
  *
  *  - n_chars  = `length(text)` — code points (non-continuation bytes);
  *  - n_tokens = `size(regexp_extract_all(text, "\\S+"))` — maximal runs
  *    of non-whitespace, Java's ASCII `\s` = [ \t\n\x0B\f\r];
  *  - n_types  = `size(array_distinct(split(text, " ")))` — distinct
  *    single-space-delimited tokens, empties included;
  *  - n_stop   = `size(filter(split(text," "), t -> t IN stops))`;
  *  - n_split  = `size(split(text, " "))` = spaces + 1 (the stop-ratio
  *    denominator);
  *  - n_punct  = `length(regexp_replace(text, "[a-z0-9 ]", ""))` — code
  *    points outside the class (class members are single-byte ASCII, so
  *    the count is n_chars minus in-class bytes);
  *  - n_bpe    = `size(regexp_extract_all(text,
  *    " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"))` — the BPE-ish tokenizer.
  *    Simulated directly: at each position an optional space attaches to
  *    a following maximal run of ONE category (lower / digit / other),
  *    where "other" is any char outside [a-z0-9 ] (multi-byte UTF-8
  *    included); a space not followed by a category char matches no
  *    alternative and is skipped — Java regex's leftmost-alternation
  *    behavior on this pattern.
  *
  * The composed form runs two compiled-regex sweeps that MATERIALIZE
  * every match into an array just to take its size, a regexp_replace
  * that builds the stripped string just to take its length, and a
  * split + distinct + filter over boxed token arrays — the dominant
  * per-byte constant of the corpus-stats pass at scale. Byte scanning
  * is UTF-8-safe throughout: every class byte tested is ASCII and never
  * occurs inside a multi-byte sequence.
  *
  * Codegen calls the same static [[TextStatsExpr.compute]] as eval, so
  * the expression stays inside the WholeStageCodegen span.
  */
case class TextStatsExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")
  override def dataType: DataType = StructType(Seq(
    "n_chars", "n_tokens", "n_types", "n_stop", "n_split", "n_punct", "n_bpe")
    .map(StructField(_, IntegerType, nullable = false)))
  override def prettyName: String = "text_stats"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stops.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.expressions.TextStatsExpr.compute(
         |  $s, $stopsRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExpr {
  private def isWs(b: Byte): Boolean = // Java regex ASCII \s
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D
  private def isLower(b: Byte): Boolean = b >= 'a' && b <= 'z'
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def inPunctClass(b: Byte): Boolean = // [a-z0-9 ]
    isLower(b) || isDigit(b) || b == 0x20

  /** Shared by eval and codegen. */
  def compute(s: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val b = s.getBytes
    val n = b.length

    var nChars = 0
    var nTokens = 0 // \S+ runs
    var nPunct = 0 // code points outside [a-z0-9 ]
    var inRun = false
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((c & 0xC0) != 0x80) { // non-continuation byte = one code point
        nChars += 1
        if (!inPunctClass(c)) nPunct += 1
      }
      if (isWs(c)) inRun = false
      else if (!inRun) { inRun = true; nTokens += 1 }
      i += 1
    }

    // single-space split: distinct types + stopword hits + token count
    val types = new java.util.HashSet[UTF8String]()
    var nStop = 0
    var nSplit = 0
    var tokStart = 0
    i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        val len = i - tokStart
        types.add(UTF8String.fromBytes(b, tokStart, len))
        var k = 0
        var hit = false
        while (!hit && k < stops.length) {
          val st = stops(k)
          if (st.length == len) {
            var j = 0
            while (j < len && b(tokStart + j) == st(j)) j += 1
            hit = j == len
          }
          k += 1
        }
        if (hit) nStop += 1
        nSplit += 1
        tokStart = i + 1
      }
      i += 1
    }

    // " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+" leftmost-match count
    var nBpe = 0
    i = 0
    while (i < n) {
      var p = i
      if (b(p) == 0x20 && p + 1 < n && b(p + 1) != 0x20) p += 1
      val c = if (p < n) b(p) else 0x20.toByte
      if (c == 0x20) i = p + 1 // bare/trailing space: no alternative matches
      else {
        nBpe += 1
        if (isLower(c)) { while (p < n && isLower(b(p))) p += 1 }
        else if (isDigit(c)) { while (p < n && isDigit(b(p))) p += 1 }
        else { while (p < n && b(p) != 0x20 && !isLower(b(p)) && !isDigit(b(p))) p += 1 }
        i = p
      }
    }

    new GenericInternalRow(Array[Any](
      nChars, nTokens, types.size(), nStop, nSplit, nPunct, nBpe))
  }

  /** Column entry point over a column reference. */
  def textStats(colName: String, stops: Seq[String]): Column =
    ColumnBridge.column(TextStatsExpr(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quotedString(colName),
      stops))
}
