package graft

import org.apache.spark.sql.functions._

/** Randomized differential fuzz for the fused byte-level expressions
  * added in round 17 — [[graft.functions.expressions.WinnowFingerprints]],
  * [[graft.functions.expressions.WordNgrams]],
  * [[graft.functions.expressions.TextStatsExpr]] and
  * [[graft.functions.expressions.PlayParsed]] — against the composed
  * column forms they replaced (split/transform/slice, regexp_extract_all,
  * regexp_replace, the F1-F9 functions). The curated equivalence specs
  * cover the known edges; this one throws RANDOM strings at both sides —
  * mixed ASCII categories, every Java-\\s whitespace byte (incl. \\x0B),
  * multi-byte UTF-8 up to astral plane, empty/boundary shapes, and
  * grammar-adjacent garbage — so a byte-scan divergence from the real
  * regex engines cannot hide outside the curated set. Fixed seeds:
  * failures replay.
  */
class FusedExprFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def randomText(rng: scala.util.Random): String = {
    val len = rng.nextInt(60)
    val sb = new StringBuilder
    var i = 0
    while (i < len) {
      rng.nextInt(14) match {
        case 0 => sb += ' '
        case 1 => sb += (if (rng.nextBoolean()) '\t' else '\u000B')
        case 2 => sb += (if (rng.nextBoolean()) '\n' else '\r')
        case 3 => sb += ('a' + rng.nextInt(26)).toChar
        case 4 => sb += ('A' + rng.nextInt(26)).toChar
        case 5 => sb += ('0' + rng.nextInt(10)).toChar
        case 6 => sb += "!;.,-?<>()#".charAt(rng.nextInt(11))
        case 7 => sb += "éüßñç".charAt(rng.nextInt(5)) // 2-byte UTF-8
        case 8 => sb += "ζλπΩ".charAt(rng.nextInt(4)) // 2-byte Greek
        case 9 => sb ++= "😀" // 4-byte astral (emoji)
        case 10 => sb ++= Seq("the", "a", "of", "is", "made", "missed",
          "tied", "leads", "trails", "now")(rng.nextInt(10))
        case 11 => sb ++= Seq("<br>", "<b", "br>", "-pointer", "-pointe",
          "3-pointer", "10-15")(rng.nextInt(7))
        case 12 => sb ++= Seq("LA", "New", "San", "Golden", "Boston")(rng.nextInt(5))
        case _ => sb += ' '
      }
      i += 1
    }
    sb.toString
  }

  private val texts: Seq[String] = {
    val rng = new scala.util.Random(20260816L)
    (0 until 400).map(_ => randomText(rng))
  }

  test("WinnowFingerprints fuzz: fused == composed on 400 random strings") {
    import graft.functions.expressions.RabinKarpHashes.rollingHashes
    import graft.functions.expressions.WinnowFingerprints.winnowFingerprints
    val (k, w) = (8, 4)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val composed = df
      .select($"doc_id", rollingHashes("text", k).as("h"))
      .select($"doc_id", when(size($"h") - w + 1 >= 1,
        array_sort(array_distinct(transform(
          sequence(lit(1), greatest(size($"h") - w + 1, lit(1))),
          i => array_min(slice($"h", i, lit(w))))))).otherwise(
        array().cast("array<bigint>")).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    val fused = df.select($"doc_id", winnowFingerprints("text", k, w).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    for (id <- fused.keys)
      assert(fused(id) == composed(id), s"doc $id text='${texts(id.toInt)}'")
  }

  test("WordNgrams fuzz: fused == composed for n in 1..3 on 400 random strings") {
    import graft.functions.expressions.WordNgrams.wordNgrams
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val composed = df
        .select($"doc_id", split($"text", " ").as("t"))
        .select($"doc_id", when(size($"t") >= n,
          transform(sequence(lit(0), greatest(size($"t") - n, lit(0))),
            i => array_join(slice($"t", i + 1, lit(n)), " ")))
          .otherwise(array().cast("array<string>")).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      val fused = df.select($"doc_id", wordNgrams("text", n).as("g"))
        .as[(Long, Seq[String])].collect().toMap
      for (id <- fused.keys)
        assert(fused(id) == composed(id), s"n=$n doc $id text='${texts(id.toInt)}'")
    }
  }

  test("TextStatsExpr fuzz: all seven counters == composed on 400 random strings") {
    import graft.functions.expressions.TextStatsExpr.textStats
    val stops = Seq("the", "a", "an", "of", "and", "to", "in", "is")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val toks = split($"text", " ")
    val composed = df.select($"doc_id",
      length($"text"),
      size(regexp_extract_all($"text", lit("\\S+"), lit(0))),
      size(array_distinct(toks)),
      size(filter(toks, t => t.isin(stops: _*))),
      size(toks),
      length(regexp_replace($"text", "[a-z0-9 ]", "")),
      size(regexp_extract_all($"text", lit(" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"),
        lit(0))))
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7, r._8)).toMap
    val fused = df.select($"doc_id", textStats("text", stops).as("s"))
      .select($"doc_id", $"s.n_chars", $"s.n_tokens", $"s.n_types",
        $"s.n_stop", $"s.n_split", $"s.n_punct", $"s.n_bpe")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7, r._8)).toMap
    for (id <- fused.keys)
      assert(fused(id) == composed(id),
        s"doc $id text='${texts(id.toInt)}': fused=${fused(id)} composed=${composed(id)}")
  }

  test("PlayParsed fuzz: fused == composed F1-F9 on 400 random strings") {
    import graft.functions.PlayFunctions._
    import graft.functions.expressions.PlayParsed.playParsed
    val rng = new scala.util.Random(41L)
    val sides = Seq("Boston", "LA Lakers", "Opponent", "A", null)
    val rows = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, sides(rng.nextInt(sides.size)), sides(rng.nextInt(sides.size)), t)
    }
    val df = rows.toDF("id", "winner", "loser", "play")
    val p = col("play")
    val composed = df
      .withColumn("team", team(p))
      .select(col("id"), timeRemaining(p), quarter(p), shotsBy(p),
        outcome(p), attempt(p), distance(p), col("team"),
        winnerScore(col("winner"), col("team"), p),
        loserScore(col("loser"), col("team"), p))
      .collect().map(r => r.getLong(0) ->
        (1 to 9).map(i => if (r.isNullAt(i)) null else r.getString(i))).toMap
    val fused = df
      .select(col("id"), playParsed(p, col("winner"), col("loser")).as("s"))
      .select(col("id"), col("s.time_remaining"), col("s.quarter"),
        col("s.shots_by"), col("s.outcome"), col("s.attempt"),
        col("s.distance"), col("s.team"), col("s.winner_score"),
        col("s.loser_score"))
      .collect().map(r => r.getLong(0) ->
        (1 to 9).map(i => if (r.isNullAt(i)) null else r.getString(i))).toMap
    for (id <- fused.keys.toSeq.sorted)
      assert(fused(id) == composed(id),
        s"case $id play='${texts(id.toInt)}': fused=${fused(id)} composed=${composed(id)}")
  }
}
