package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's play-string parser (its entire scalar-function surface,
  * 10 Python UDFs at reference scripts/spark_processing.py:137-246)
  * re-expressed as native Spark SQL Column expressions.
  *
  * No UDFs: every function below stays inside whole-stage codegen, so the
  * ingest pipeline is one narrow fused stage with working column pruning —
  * the reference's row-at-a-time Python pickling (BatchEvalPython barrier)
  * is gone entirely. At 100 TB this is the difference between a scan-bound
  * job and a serialization-bound one.
  *
  * Play grammar (three `<br>`-separated segments, see FIXTURES.md A3):
  *   "1st Q, 11:30.0 remaining<br>First Last missed 3-pointer from 25 ft<br>LA Lakers trails 10-15"
  *
  * Divergence from the reference, by design: on dirty input Python
  * `re.search(...).group(0)` raises and a missing token IndexErrors —
  * failing the whole job. Here every token access is null-tolerant
  * (`get`/`try_element_at` — ANSI mode is on in Spark 4, so plain
  * `arr(i)` would throw like the reference does): clean rows produce
  * identical values, dirty rows degrade to nulls instead of killing a
  * 100 TB run.
  */
object PlayFunctions {
  /** Two-word-city first tokens (reference spark_processing.py:160). */
  private val twoWordCities = Seq("LA", "New", "San", "Golden")

  private def seg(play: Column, i: Int): Column = get(split(play, "<br>"), lit(i))
  private def tokens(c: Column): Column = split(c, " ")
  private def tok(c: Column, i: Int): Column = get(tokens(c), lit(i))

  /** F1: first char of first space-token — "1st Q…" → "1"
    * (reference spark_processing.py:140-141). */
  def quarter(play: Column): Column =
    substring(tok(play, 0), 1, 1)

  /** F2/F3 net semantics: third space-token, e.g. "11:30.0"
    * (reference spark_processing.py:143-144; the TimestampType UDF at
    * :137-138 is dead — overwritten at :104-105). */
  def timeRemaining(play: Column): Column =
    tok(play, 2)

  /** F4: first two tokens of the shot segment → "First Last"
    * (reference spark_processing.py:146-147). */
  def shotsBy(play: Column): Column =
    concat(tok(seg(play, 1), 0), lit(" "), tok(seg(play, 1), 1))

  /** F5: "made" | "missed" from the shot segment
    * (reference spark_processing.py:149-150). */
  def outcome(play: Column): Column =
    regexp_extract(seg(play, 1), "made|missed", 0)

  /** F6: "[0-9]-pointer" from the shot segment. The trailing `?` binds to
    * the single character 'r' — "[0-9]-pointe" would also match. That
    * quirk is the reference's own pattern, replicated verbatim
    * (reference spark_processing.py:152-153). */
  def attempt(play: Column): Column =
    regexp_extract(seg(play, 1), "[0-9]-pointer?", 0)

  /** F7: last two tokens of the shot segment concatenated → "25ft"
    * (reference spark_processing.py:155-156). */
  def distance(play: Column): Column = {
    val t = tokens(seg(play, 1))
    concat(try_element_at(t, lit(-2)), try_element_at(t, lit(-1)))
  }

  /** F8: team name from the score segment — tokens 0+1 for two-word
    * cities, else token 0 (reference spark_processing.py:158-163). */
  def team(play: Column): Column = {
    val t0 = tok(seg(play, 2), 0)
    when(t0.isin(twoWordCities: _*),
      concat(t0, lit(" "), tok(seg(play, 2), 1)))
      .otherwise(t0)
  }

  /** F9: score for one side of the game. The reference's
    * get_winner_score / get_loser_score (spark_processing.py:165-246) are
    * the same branch tree over the score phrase
    * "<Team> [now] <leads|trails|tied> A-B"; `side == team` picks A, else B
    * (ties always return A). Token indices shift by one for two-word
    * cities and again for the "now" prefix.
    */
  def scoreFor(side: Column, teamCol: Column, play: Column): Column = {
    def d(i: Int): Column = tok(seg(play, 2), i)
    def sc(c: Column, j: Int): Column = get(split(c, "-"), lit(j))
    def half(c: Column): Column =
      when(side === teamCol, sc(c, 0)).otherwise(sc(c, 1))
    def isVerb(c: Column): Column = c === "trails" || c === "leads"
    when(d(0).isin(twoWordCities: _*),
      when(isVerb(d(2)), half(d(3)))
        .when(isVerb(d(3)), half(d(4)))
        .when(d(2) === "tied", sc(d(3), 0))
        .otherwise(sc(d(4), 0)))
    .otherwise(
      when(isVerb(d(1)), half(d(2)))
        .when(isVerb(d(2)), half(d(3)))
        .when(d(1) === "tied", sc(d(2), 0))
        .otherwise(sc(d(3), 0)))
  }

  def winnerScore(winner: Column, teamCol: Column, play: Column): Column =
    scoreFor(winner, teamCol, play)

  def loserScore(loser: Column, teamCol: Column, play: Column): Column =
    scoreFor(loser, teamCol, play)

  /** Register every play function as a SQL-callable temp function
    * (`SELECT play_quarter(play) …`). These are expression-tree rewrites,
    * not UDFs — the registered functions inline into the plan and stay
    * inside codegen exactly like the Column API.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.registerExprFunction
    def reg1(name: String, f: Column => Column): Unit =
      registerExprFunction(spark, name, es => f(es.head))
    def reg3(name: String, f: (Column, Column, Column) => Column): Unit =
      registerExprFunction(spark, name, es => f(es(0), es(1), es(2)))
    reg1("play_quarter", quarter)
    reg1("play_time_remaining", timeRemaining)
    reg1("play_shots_by", shotsBy)
    reg1("play_outcome", outcome)
    reg1("play_attempt", attempt)
    reg1("play_distance", distance)
    reg1("play_team", team)
    reg3("play_winner_score", winnerScore)
    reg3("play_loser_score", loserScore)
  }
}
