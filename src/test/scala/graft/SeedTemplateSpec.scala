package graft

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._

/** Pins the q87 seed-template STALENESS rule (ADVICE r11): the template
  * season is memoized per (JVM, fixture listing), so rewriting the
  * events fixture mid-session must REBUILD it. Before the fingerprint,
  * the memo keyed on the dir alone — a rewritten fixture silently
  * drained against the previous fixture's seed, and stale season rows
  * for keys absent from the new delta survived into the output.
  *
  * The probe encodes exactly that failure shape: fixture A contains an
  * even event_id (4) that becomes a stale season row (value −1) and a
  * %97 key (97) that becomes a seed-only row; fixture B drops both. A
  * stale template would leak id 4 (value −1) and the offset seed row
  * into B's drain — the assertion on B's exact key/value set fails on
  * the pre-fix code and passes with the listing fingerprint.
  */
class SeedTemplateSpec extends SparkTestBase {
  import spark.implicits._

  private val baseUs = 1704067200000000L

  /** Single-file events.parquet with the given (event_id, value) rows. */
  private def writeFixture(dir: java.nio.file.Path,
      rows: Seq[(Long, Double)]): Unit = {
    val df = rows.zipWithIndex
      .map { case ((id, v), i) => (id, baseUs + i * 1000000L, 7L, "click", v) }
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val stage = Files.createTempDirectory("graft-seedtpl-stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    scala.util.Using.resource(Files.list(stage)) { listing =>
      val part = listing.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, dir.resolve("events.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def upsertKeyValues(dir: String): Map[Long, Double] =
    queries.StreamingQueries.streamedUpsert(spark, dir)
      .select(col("event_id"), col("value"))
      .as[(Long, Double)].collect().toMap

  test("rewritten events fixture rebuilds the q87 seed template") {
    val dir = Files.createTempDirectory("graft-seedtpl")
    // fixture A: id 4 (even -> stale season row), id 97 (seed-only copy)
    writeFixture(dir, Seq(1L -> 1.0, 4L -> 4.0, 97L -> 9.7))
    val a = upsertKeyValues(dir.toString)
    assert(a == Map(1L -> 1.0, 4L -> 4.0, 97L -> 9.7,
      100000097L -> -1.0), s"fixture A drain wrong: $a")
    // the template A's drain memoized, about to be superseded
    val tplA = queries.StreamingQueries.q87SeedTemplates
      .get(dir.toString)._2
    assert(Files.exists(java.nio.file.Paths.get(tplA)),
      s"fixture A's template missing before the rewrite: $tplA")
    // fixture B drops 4 and 97: nothing may survive from A's season
    writeFixture(dir, Seq(2L -> 2.0, 3L -> 3.0))
    val b = upsertKeyValues(dir.toString)
    assert(b == Map(2L -> 2.0, 3L -> 3.0),
      s"stale seed template leaked into the rewritten fixture's drain: $b")
    // ADVICE r12: the superseded template tree must be DELETED when its
    // replacement is built, not leak in tmpdir for the JVM's lifetime
    val tplB = queries.StreamingQueries.q87SeedTemplates
      .get(dir.toString)._2
    assert(tplB != tplA, "rewrite did not produce a fresh template")
    assert(!Files.exists(java.nio.file.Paths.get(tplA)),
      s"superseded seed template leaked: $tplA")
  }
}
