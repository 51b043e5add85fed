package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pin the window-alignment facts the q18/q49 oracles assert about
  * Spark's `window()` — the same discipline SessionBoundaryPropertySpec
  * applies to `session_window`:
  *
  *  - tumbling: `window(ts, '1 hour').start == date_trunc('hour', ts)`
  *    (q18/q79's oracle states the rollup with date_trunc);
  *  - sliding 1h/15m: each event belongs to EXACTLY the 4 windows whose
  *    starts are `(us div slide − k)·slide` for k = 0..3 (q49's oracle
  *    derives the starts arithmetically instead of joining windows).
  *
  * Generated instants cluster on the boundaries fixtures never hit:
  * exact slide/hour marks and ±1µs around them — where an off-by-one in
  * either claim (inclusive vs exclusive window ends, floor vs round
  * alignment) would diverge.
  */
class WindowAlignmentPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val slideUs = 900000000L           // 15 min
  private val baseUs = 1704067200000000L     // 2024-01-01T00:00:00Z, on the hour

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val instantGen: Gen[Long] = for {
    k <- Gen.choose(0L, 40L)                 // which slide boundary
    off <- Gen.oneOf(
      Gen.const(0L), Gen.const(1L), Gen.const(-1L),      // on / around mark
      Gen.const(slideUs - 1L),
      Gen.choose(2L, slideUs - 2L))                      // interior
  } yield baseUs + k * slideUs + off

  private def fixture(seed: Long) = {
    val us = sample(Gen.listOfN(300, instantGen), seed)
      .zipWithIndex.map { case (u, i) => (i.toLong, math.max(u, baseUs)) }
    us.toDF("event_id", "us").withColumn("ts", timestamp_micros(col("us")))
  }

  test("tumbling window(1h).start == date_trunc(hour) on boundary instants") {
    for (seed <- 1L to 3L) {
      val bad = fixture(seed)
        .select(window(col("ts"), "1 hour").getField("start").as("ws"),
          date_trunc("hour", col("ts")).as("dt"))
        .filter(col("ws") =!= col("dt"))
        .count()
      assert(bad == 0L, s"seed $seed: window.start != date_trunc(hour)")
    }
  }

  test("sliding window(1h,15m) memberships == (us div slide - k)*slide, k=0..3") {
    for (seed <- 1L to 3L) {
      val df = fixture(seed)
      val got = df
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_id"))
        .agg(count(lit(1)))
        .select(col("event_id"), unix_micros(col("window.start")).as("ws"))
        .as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val expected = df.select(col("event_id"), col("us"))
        .as[(Long, Long)].collect()
        .map { case (id, us) =>
          id -> (0L to 3L).map(k => (us / slideUs - k) * slideUs).toSet
        }.toMap
      assert(got == expected, s"seed $seed: sliding memberships diverge")
    }
  }
}
