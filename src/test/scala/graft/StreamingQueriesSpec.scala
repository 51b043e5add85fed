package graft

/** q79's contract: the STREAMING engine's windowed rollup (file stream →
  * watermarked window agg → AvailableNow drain) produces exactly the
  * batch q18 result — the same parity the driver's oracle gate checks at
  * sf0.01, kept here as a fast in-suite regression net.
  */
class StreamingQueriesSpec extends SparkTestBase {

  test("q79 streamed rollup equals the batch q18 rollup") {
    val streamed = queries.StreamingQueries.streamedHourlyRollup(spark, sf)
      .collect().toSeq
    val batch = queries.EventOps.hourlyRollup(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q80 streamed sessions match the batch gaps-and-islands sessions") {
    // same strict-> boundary and end = max+gap shape as q80's oracle SQL
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val batch = Tables.events(spark, sf)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("grp",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("us")).as("start_us"),
        (max(col("us")) + 1800000000L).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("start_us"), col("session_end_us"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("start_us"))
      .collect().toSeq
    val streamed = queries.StreamingQueries.streamedSessionRollup(spark, sf)
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
