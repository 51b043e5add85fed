package graft

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._

/** Pins the q92/q93 corrupted-corpus template rules (r18, the q87
  * seed-template discipline applied to the route queries' source
  * staging): the staged planted-corruption corpus is memoized per
  * (JVM, documents fixture, variant), so
  *
  *  1. a second drain against the SAME fixture reuses the template
  *     (no rebuild — the staging job runs once, off the timed runs), and
  *  2. a REWRITTEN documents fixture rebuilds it — a stale template
  *     would route the previous corpus' doc set into the fresh tables —
  *     and deletes the superseded tree (no tmpdir leak).
  *
  * The assertion distinguishing stale from fresh is the routed key
  * count: fixture A has 8 docs, fixture B has 5 with disjoint ids, so a
  * drain that reuses A's template under B reports 8 routed keys
  * instead of 5.
  */
class BlobSrcTemplateSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-file documents.parquet with the given doc_ids. Texts vary in
    * length so the planted decode arithmetic exercises several widths.
    */
  private def writeFixture(dir: java.nio.file.Path, ids: Seq[Long]): Unit = {
    val df = ids.map { id =>
      (id, "word " * (3 + (id % 5).toInt), "en", "spec", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("n_chars", length(col("text")))
    val stage = Files.createTempDirectory("graft-blobsrc-stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    scala.util.Using.resource(Files.list(stage)) { listing =>
      val part = listing.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.copy(part, dir.resolve("documents.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Total routed keys across both tables: main_rows + quar_active
    * (+ quar_resolved, 0 in the q92 shape) — equals the fixture's doc
    * count when and only when the drain routed the CURRENT corpus.
    */
  private def routedKeys(dir: String): Long =
    queries.StreamingQueries.streamedQuarantine(spark, dir)
      .agg(sum(col("main_rows") + col("quar_active") + col("quar_resolved")))
      .head().getLong(0)

  test("rewritten documents fixture rebuilds the q92 src template") {
    val dir = Files.createTempDirectory("graft-blobsrc")
    writeFixture(dir, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 14L)) // 7, 14 corrupt
    assert(routedKeys(dir.toString) == 8L)
    val key = dir.toString + "|corrupt4"
    val tplA = queries.StreamingQueries.blobSrcTemplates.get(key)._2
    assert(Files.exists(java.nio.file.Paths.get(tplA)),
      s"fixture A's template missing: $tplA")
    // same fixture: the template must be REUSED, not rebuilt
    assert(routedKeys(dir.toString) == 8L)
    assert(queries.StreamingQueries.blobSrcTemplates.get(key)._2 == tplA,
      "unchanged fixture rebuilt its src template")
    // fixture B: disjoint, smaller — a stale template would report 8
    writeFixture(dir, Seq(21L, 22L, 23L, 24L, 28L)) // 21, 28 corrupt
    assert(routedKeys(dir.toString) == 5L,
      "stale corrupted-src template leaked into the rewritten fixture's drain")
    val tplB = queries.StreamingQueries.blobSrcTemplates.get(key)._2
    assert(tplB != tplA, "rewrite did not produce a fresh template")
    assert(!Files.exists(java.nio.file.Paths.get(tplA)),
      s"superseded src template leaked: $tplA")
  }
}
