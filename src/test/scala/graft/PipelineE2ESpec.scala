package graft

import graft.ingest.Ingest
import graft.merge.Merge
import org.apache.spark.sql.functions._

/** The reference's complete workflow as one test (SURVEY.md §3, §5.4):
  * envelope JSON → streaming transform → headered CSV delta → merge with
  * the season tgz → republish — broker-free via the file-based envelope
  * source, identical frames downstream of the source.
  */
class PipelineE2ESpec extends SparkTestBase {
  import spark.implicits._

  private def envelopeJson(gameId: String, winner: String, loser: String,
      play: String): String =
    s"""{"game_id":"$gameId","year":"2025","month":"01","day":"15",
       |"winner":"$winner","loser":"$loser","x":"10","y":"20",
       |"play":"$play"}""".stripMargin.replace("\n", "")

  test("ingest -> delta csv -> merge with season tgz -> republish") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe").toString

    // day-1 season: one already-known play, packaged as the tgz artifact
    val day1 = Ingest.transform(Seq(
      ("k0", envelopeJson("g1", "Cleveland", "Boston",
        "1st Q, 10:00.0 remaining<br>Donovan Mitchell made 2-pointer from 8 ft<br>Cleveland leads 2-0"))
    ).toDF("key", "value"))
    Merge.publishTgz(day1, s"$dir/t1", s"$dir/shots-2025.tgz", "shots-2025.csv")

    // day-2 scrape: replays the day-1 play (overlap window) + two new ones
    val day2Envelope = Seq(
      ("k0", envelopeJson("g1", "Cleveland", "Boston",
        "1st Q, 10:00.0 remaining<br>Donovan Mitchell made 2-pointer from 8 ft<br>Cleveland leads 2-0")),
      ("k1", envelopeJson("g1", "Cleveland", "Boston",
        "2nd Q, 5:30.0 remaining<br>Jayson Tatum missed 3-pointer from 26 ft<br>Boston trails 40-48")),
      ("k2", envelopeJson("g2", "LA Lakers", "Miami",
        "4th Q, 0:01.2 remaining<br>LeBron James made 3-pointer from 30 ft<br>LA Lakers now leads 101-99"))
    ).toDF("key", "value")
    // ingest stage writes the ongoing/ delta as headered CSV
    Ingest.writeCsv(Ingest.transform(day2Envelope), s"$dir/ongoing")

    // merge stage: season tgz + delta csv -> dedup by key -> republish
    val season = Merge.readSeasonTgz(spark, s"$dir/shots-2025.tgz")
    val delta = Merge.readCsv(spark, s"$dir/ongoing")
    val merged = Merge.mergeDeterministic(season, delta)
    Merge.publishTgz(merged, s"$dir/t2", s"$dir/shots-2025.tgz", "shots-2025.csv")

    val reread = Merge.readSeasonTgz(spark, s"$dir/shots-2025.tgz")
    assert(reread.count() == 3) // replayed row deduped, 2 new rows added
    val g2 = reread.filter($"game_id" === "g2").collect()(0)
    assert(g2.getAs[String]("team") == "LA Lakers")
    assert(g2.getAs[String]("winner_score") == "101")
    assert(g2.getAs[String]("loser_score") == "99")
    assert(g2.getAs[String]("distance") == "30ft")
    // re-running the merge with the same delta is a no-op (idempotent)
    val again = Merge.mergeDeterministic(reread, delta)
    assert(again.count() == 3)
  }

  test("streaming flavor: envelope file stream -> transform -> csv sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-s").toString
    Seq(("k1", envelopeJson("g9", "Utah", "Chicago",
      "3rd Q, 2:15.0 remaining<br>Lauri Markkanen made 3-pointer from 24 ft<br>Utah leads 70-60")))
      .toDF("key", "value").write.parquet(s"$dir/in")
    val env = spark.readStream
      .schema("key STRING, value STRING")
      .parquet(s"$dir/in")
    Ingest.streamToCsv(Ingest.transform(env), s"$dir/out", s"$dir/ckpt")
    val out = Merge.readCsv(spark, s"$dir/out")
    assert(out.count() == 1)
    assert(out.select("team").as[String].collect()(0) == "Utah")
    assert(out.select("winner_score").as[String].collect()(0) == "70")
  }
}
