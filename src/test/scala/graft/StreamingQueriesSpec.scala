package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q79's contract: the STREAMING engine's windowed rollup (file stream →
  * watermarked window agg → AvailableNow drain) produces exactly the
  * batch q18 result — the same parity the driver's oracle gate checks at
  * sf0.01, kept here as a fast in-suite regression net.
  */
class StreamingQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q79 streamed rollup equals the batch q18 rollup") {
    val streamed = queries.StreamingQueries.streamedHourlyRollup(spark, sf)
      .collect().toSeq
    val batch = queries.EventOps.hourlyRollup(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q79 restores the session's shuffle-partition conf after the drain") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    queries.StreamingQueries.streamedHourlyRollup(spark, sf).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }
}
