package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The complete play parse in ONE pass, as `struct<time_remaining,
  * quarter, shots_by, outcome, attempt, distance, team, winner_score,
  * loser_score: string>` — the fused twin of the nine
  * [[graft.functions.PlayFunctions]] column functions (which remain the
  * public per-field surface, reference scripts/spark_processing.py:137-246).
  *
  * Why fuse: the composed projection re-splits the play per derived
  * column, and the F9 score branches live inside CaseWhen arms where
  * codegen's subexpression elimination does not share them — measured
  * ~56 cpu-seconds at the 10x fixture for the ten-column parse. One
  * byte pass over the play string replaces every split/regex/array
  * access.
  *
  * Field-by-field semantics are EXACTLY the composed forms, including
  * dirty-input degradation (spec-pinned in PlayFunctionsSpec):
  *  - null play → null struct (every extracted field null, matching the
  *    per-column null propagation);
  *  - token access out of range → null field (`get`/`try_element_at`);
  *  - `regexp_extract` fields (outcome/attempt) return "" when the
  *    pattern does not match non-null input;
  *  - splits keep trailing empty tokens (Spark split limit = -1);
  *  - a null `winner`/`loser`/team makes `side === team` null, so the
  *    score picks the B side — replicated literally;
  *  - the attempt pattern "[0-9]-pointer?" binds `?` to the final 'r'
  *    (the reference's own quirk).
  */
case class PlayParsed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string arguments")
  override def dataType: DataType = StructType(Seq(
    "time_remaining", "quarter", "shots_by", "outcome", "attempt",
    "distance", "team", "winner_score", "loser_score")
    .map(StructField(_, StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "play_parsed"

  // play null → null struct; winner/loser null are VALID inputs (the
  // composed score columns degrade to the B side), so the default
  // any-null-child short-circuit of nullSafeEval cannot be used.
  override def eval(input: InternalRow): Any = {
    val p = first.eval(input)
    if (p == null) null
    else PlayParsed.compute(p.asInstanceOf[UTF8String],
      second.eval(input).asInstanceOf[UTF8String],
      third.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val pc = first.genCode(ctx)
    val wc = second.genCode(ctx)
    val lc = third.genCode(ctx)
    ev.copy(code =
      code"""
        ${pc.code}
        boolean ${ev.isNull} = ${pc.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${wc.code}
          ${lc.code}
          ${ev.value} = graft.functions.expressions.PlayParsed.compute(
            ${pc.value},
            ${wc.isNull} ? null : ${wc.value},
            ${lc.isNull} ? null : ${lc.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PlayParsed {
  private val twoWordCities =
    Array("LA", "New", "San", "Golden").map(UTF8String.fromString)
  private val SPACE = UTF8String.fromString(" ")
  private val MADE = "made".getBytes("UTF-8")
  private val MISSED = "missed".getBytes("UTF-8")
  private val POINTE = "-pointe".getBytes("UTF-8")
  private val TRAILS = UTF8String.fromString("trails")
  private val LEADS = UTF8String.fromString("leads")
  private val TIED = UTF8String.fromString("tied")

  /** Split `b[from, to)` on `sep` keeping trailing empties (Spark split
    * limit -1); returns UTF8String views. */
  private def splitViews(b: Array[Byte], from: Int, to: Int,
      sep: Byte): Array[UTF8String] = {
    var cnt = 1
    var i = from
    while (i < to) { if (b(i) == sep) cnt += 1; i += 1 }
    val out = new Array[UTF8String](cnt)
    var start = from
    var k = 0
    i = from
    while (i <= to) {
      if (i == to || b(i) == sep) {
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
        start = i + 1
      }
      i += 1
    }
    out
  }

  private def at(t: Array[UTF8String], i: Int): UTF8String =
    if (i >= 0 && i < t.length) t(i) else null

  private def matchesAt(b: Array[Byte], p: Int, to: Int, pat: Array[Byte]): Boolean = {
    if (p + pat.length > to) return false
    var j = 0
    while (j < pat.length && b(p + j) == pat(j)) j += 1
    j == pat.length
  }

  /** Shared by eval and codegen; `winner`/`loser` may be null. */
  def compute(play: UTF8String, winner: UTF8String, loser: UTF8String): InternalRow = {
    val b = play.getBytes
    val n = b.length

    // segments: split on literal "<br>" keeping trailing empties
    var segs: List[(Int, Int)] = Nil
    var segStart = 0
    var i = 0
    while (i + 3 < n) {
      if (b(i) == '<' && b(i + 1) == 'b' && b(i + 2) == 'r' && b(i + 3) == '>') {
        segs = (segStart, i) :: segs
        segStart = i + 4
        i += 4
      } else i += 1
    }
    segs = ((segStart, n) :: segs).reverse
    def seg(k: Int): Option[(Int, Int)] =
      if (k < segs.length) Some(segs(k)) else None

    // whole-play space tokens (need 0 and 2)
    val playToks = splitViews(b, 0, n, 0x20.toByte)
    val quarter = {
      val t0 = playToks(0) // index 0 always exists
      t0.substringSQL(1, 1) // first code point; "" stays ""
    }
    val timeRemaining = at(playToks, 2)

    // shot segment
    var shotsBy: UTF8String = null
    var outcome: UTF8String = null
    var attempt: UTF8String = null
    var distance: UTF8String = null
    seg(1).foreach { case (s1, e1) =>
      val t = splitViews(b, s1, e1, 0x20.toByte)
      val t1 = at(t, 1)
      shotsBy = if (t1 == null) null
        else UTF8String.concat(at(t, 0), SPACE, t1)
      val tm2 = at(t, t.length - 2)
      distance = if (tm2 == null) null else UTF8String.concat(tm2, t(t.length - 1))
      // regexp_extract(seg1, "made|missed", 0): leftmost alternation
      outcome = UTF8String.EMPTY_UTF8
      var p = s1
      var found = false
      while (!found && p < e1) {
        if (matchesAt(b, p, e1, MADE)) {
          outcome = UTF8String.fromBytes(b, p, 4); found = true
        } else if (matchesAt(b, p, e1, MISSED)) {
          outcome = UTF8String.fromBytes(b, p, 6); found = true
        } else p += 1
      }
      // regexp_extract(seg1, "[0-9]-pointer?", 0): greedy optional 'r'
      attempt = UTF8String.EMPTY_UTF8
      p = s1
      found = false
      while (!found && p < e1) {
        if (b(p) >= '0' && b(p) <= '9' && matchesAt(b, p + 1, e1, POINTE)) {
          val len = if (p + 8 < e1 && b(p + 8) == 'r') 9 else 8
          attempt = UTF8String.fromBytes(b, p, len); found = true
        } else p += 1
      }
    }

    // score segment
    var team: UTF8String = null
    var winnerScore: UTF8String = null
    var loserScore: UTF8String = null
    seg(2).foreach { case (s2, e2) =>
      val d = splitViews(b, s2, e2, 0x20.toByte)
      val d0 = d(0)
      val twoWord = twoWordCities.exists(_.equals(d0))
      team = if (twoWord) {
        val d1 = at(d, 1)
        if (d1 == null) null else UTF8String.concat(d0, SPACE, d1)
      } else d0
      def isVerb(c: UTF8String): Boolean =
        c != null && (c.equals(TRAILS) || c.equals(LEADS))
      def dash(tok: UTF8String, j: Int): UTF8String = {
        if (tok == null) return null
        val tb = tok.getBytes
        val parts = splitViews(tb, 0, tb.length, '-'.toByte)
        at(parts, j)
      }
      def score(side: UTF8String): UTF8String = {
        // side === team: null side/team → null condition → B side
        val sideJ = if (side != null && team != null && side.equals(team)) 0 else 1
        if (twoWord) {
          if (isVerb(at(d, 2))) dash(at(d, 3), sideJ)
          else if (isVerb(at(d, 3))) dash(at(d, 4), sideJ)
          else if (TIED.equals(at(d, 2))) dash(at(d, 3), 0)
          else dash(at(d, 4), 0)
        } else {
          if (isVerb(at(d, 1))) dash(at(d, 2), sideJ)
          else if (isVerb(at(d, 2))) dash(at(d, 3), sideJ)
          else if (TIED.equals(at(d, 1))) dash(at(d, 2), 0)
          else dash(at(d, 3), 0)
        }
      }
      winnerScore = score(winner)
      loserScore = score(loser)
    }

    new GenericInternalRow(Array[Any](
      timeRemaining, quarter, shotsBy, outcome, attempt, distance,
      team, winnerScore, loserScore))
  }

  /** Column entry point. */
  def playParsed(play: Column, winner: Column, loser: Column): Column =
    ColumnBridge.column(PlayParsed(
      ColumnBridge.expression(play),
      ColumnBridge.expression(winner),
      ColumnBridge.expression(loser)))
}
