package graft

import java.nio.file.Files

import graft.merge.Merge
import org.apache.spark.sql.functions._

/** Merge/upsert semantics (reference spark_merge_dfs.py:82-83) + the
  * tgz artifact round-trip (S3/S5).
  */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private def season = Seq(
    ("g1", "11:30.0", "1", "old1"),
    ("g1", "10:00.0", "1", "old2"),
    ("g2", "5:00.0", "2", "old3")
  ).toDF("game_id", "time_remaining", "quarter", "payload")

  // overlaps on (g1, 11:30.0, 1); adds a new row and a new column
  private def delta = Seq(
    ("g1", "11:30.0", "1", "new1", "extra1"),
    ("g3", "2:00.0", "4", "new2", "extra2")
  ).toDF("game_id", "time_remaining", "quarter", "payload", "batch_tag")

  test("merge: union-by-name null-fill + one row per key") {
    val m = Merge.merge(season, delta)
    assert(m.columns.toSet == Set("game_id", "time_remaining", "quarter",
      "payload", "batch_tag"))
    assert(m.count() == 4)
    assert(m.groupBy("game_id", "time_remaining", "quarter").count()
      .filter(col("count") > 1).count() == 0)
    // season-only rows got a null batch_tag
    assert(m.filter(col("game_id") === "g2" && col("batch_tag").isNull).count() == 1)
  }

  test("mergeDeterministic: delta wins on key collision; idempotent") {
    val m = Merge.mergeDeterministic(season, delta)
    assert(m.filter(col("game_id") === "g1" && col("time_remaining") === "11:30.0")
      .select("payload").as[String].collect().toSeq == Seq("new1"))
    // re-merging the same delta changes nothing
    val m2 = Merge.mergeDeterministic(m, delta)
    assert(m2.exceptAll(m).count() == 0 && m.exceptAll(m2).count() == 0)
  }

  test("mergeDeterministic tolerates unorderable (map) payload columns") {
    import org.apache.spark.sql.functions.map
    val s = season.withColumn("props", map(lit("k"), col("payload")))
    val d = delta.withColumn("props", map(lit("k"), col("payload")))
    val m = Merge.mergeDeterministic(s, d)
    assert(m.count() == 4) // analysis succeeds; one row per key
  }

  test("tgz publish → readSeasonTgz round-trip") {
    val dir = Files.createTempDirectory("graft-tgz").toString
    val df = Merge.mergeDeterministic(season, delta)
    Merge.publishTgz(df, s"$dir/tmp", s"$dir/shots-2025.tgz", "shots-2025.csv")
    val back = Merge.readSeasonTgz(spark, s"$dir/shots-2025.tgz")
    assert(back.columns.sorted.toSeq == df.columns.sorted.toSeq)
    assert(back.count() == df.count())
    // all-string round trip (header=true, no inferSchema), like the reference
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("publishPartitioned writes executor-parallel parquet") {
    val dir = Files.createTempDirectory("graft-part").toString
    Merge.publishPartitioned(Merge.merge(season, delta), s"$dir/out",
      partitionCols = Seq("quarter"))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 4)
    assert(back.select("quarter").distinct().count() == 3)
  }
}
