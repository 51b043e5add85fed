package graft

import graft.functions.PlayFunctions
import org.apache.spark.sql.functions._

/** The engine drives from `spark.sql` too: temp views over the testdata
  * + registered play functions must produce the same results as the
  * DataFrame API queries.
  */
class SqlSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  test("SQL star-join rollup equals the DataFrame twin") {
    for (t <- Seq("orders", "customer", "nation", "region"))
      Tables.table(spark, sf, t).createOrReplaceTempView(t)
    val viaSql = spark.sql(
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin)
    val viaDf = graft.queries.Relational.revenueByNation(spark, sf)
    assert(viaSql.exceptAll(viaDf).count() == 0)
    assert(viaDf.exceptAll(viaSql).count() == 0)
  }

  test("registered play functions compose inside a SQL pipeline") {
    PlayFunctions.registerSql(spark)
    graft.queries.PlayParse.playParse(spark, sf)
      .limit(0) // just ensure co-existence; now run SQL over raw plays
    Seq(
      ("g1", "Boston", "Miami",
        "1st Q, 11:30.0 remaining<br>LeBron James missed 3-pointer from 25 ft<br>Boston trails 10-15"),
      ("g2", "Golden State", "Utah",
        "4th Q, 0:08.0 remaining<br>Stephen Curry made 3-pointer from 28 ft<br>Golden State now leads 110-108"))
      .toDF("game_id", "winner", "loser", "play")
      .createOrReplaceTempView("raw_plays")
    val out = spark.sql(
      """SELECT game_id, play_team(play) AS team,
        |  play_winner_score(winner, play_team(play), play) AS ws,
        |  play_loser_score(loser, play_team(play), play) AS ls,
        |  play_outcome(play) AS outcome
        |FROM raw_plays ORDER BY game_id""".stripMargin).collect()
    // winner Boston == team → winner takes the A side of "10-15"
    assert(out(0).toSeq == Seq("g1", "Boston", "10", "15", "missed"))
    assert(out(1).toSeq == Seq("g2", "Golden State", "110", "108", "made"))
  }
}
