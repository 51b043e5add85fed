package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators in their batch form (the streaming twins live in
  * graft.streaming and are exercised by ScalaTest): JSON prop access,
  * tumbling-window rollups, gaps-and-islands sessionization, per-type
  * profiles (SURVEY.md §2 F13, §2.9 N-extensions).
  */
object EventOps {
  import Exact._

  /** F13: JSON field extraction from the props column. The sort runs
    * below the extraction (q07's range-sampling rationale,
    * `PlayParse.playParse`): the range exchange's sampling pass then
    * reads raw columns instead of re-running the JSON parse, and the
    * parse itself runs once, spread over the post-exchange partitions.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("props"))
      .orderBy(col("event_id"))
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))

  val jsonExtractSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  /** Tumbling 1-hour rollup per event type — the batch twin of the
    * streaming windowed aggregation. Uses Spark's `window()` so the same
    * expression works under readStream + watermark.
    */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumD(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("total_value"))
      .orderBy(col("hour"), col("event_type"))

  val hourlyRollupSql: String =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
       |  COUNT(*) AS n, ${sumDSql("value")} AS total_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour, event_type""".stripMargin

  /** Sliding 1-hour windows advancing every 15 minutes — each event lands
    * in 4 overlapping windows (the streaming twin passes a slide to
    * Streaming.windowedRollup). The oracle derives the same 4 window
    * starts per event arithmetically: Spark's window() aligns windows to
    * the epoch, so start_k = (us div slide − k) · slide for k = 0..3.
    * Output keyed by epoch-micros window start for engine parity.
    */
  def slidingRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumD(col("value")).as("total_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("window_start_us"), col("event_type"))

  val slidingRollupSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
       |  FROM events
       |), slid AS (
       |  SELECT event_type, value,
       |    ((us // 900000000) - unnest([0, 1, 2, 3])) * 900000000 AS window_start_us
       |  FROM ev
       |)
       |SELECT window_start_us, event_type, COUNT(*) AS n,
       |  ${sumDSql("value")} AS total_value
       |FROM slid
       |GROUP BY window_start_us, event_type
       |ORDER BY window_start_us, event_type""".stripMargin

  /** Gaps-and-islands sessionization (30-minute inactivity gap): the
    * deterministic batch twin of session_window/flatMapGroupsWithState.
    * Timestamps surface as epoch micros (long) so both engines agree on
    * serialization.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    ev.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"), sumD(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val sessionizeSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
       |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
       |  FROM events
       |), flagged AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
       |                 THEN 1 ELSE 0 END AS is_new
       |  FROM ev
       |), sess AS (
       |  -- CAST: DuckDB SUM(int) is HUGEINT, which pandas renders float64;
       |  -- the driver's hash compare is int-vs-float sensitive.
       |  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged
       |)
       |SELECT user_id, session_id, min(us) AS start_us, max(us) AS end_us,
       |  COUNT(*) AS n_events, ${sumDSql("value")} AS session_value
       |FROM sess GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  /** F13 complete: props parsed as a real MapType (not just path access)
    * then exploded to (key, value) rows — per-key cardinality and value
    * range. The map shape is what survives schema drift: new JSON keys
    * appear as new rows, not as breaking schema changes.
    */
  def propsMap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(explode(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as(Seq("key", "val")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        min(expr("try_cast(val AS LONG)")).as("min_val"),
        max(expr("try_cast(val AS LONG)")).as("max_val"))
      .orderBy(col("key"))

  // Drift-parity notes (both sides must degrade identically on data this
  // query's doc comment anticipates):
  //  - numeric drift: Spark try_cast(STRING AS LONG) nulls anything that
  //    is not an (optionally signed, whitespace-padded) integer, while
  //    DuckDB TRY_CAST('3.5' AS BIGINT) ROUNDS — so the oracle gates
  //    TRY_CAST behind the same integer regex Spark accepts (overflow
  //    nulls on both engines). Spark's trimAll strips ALL chars <= 0x20
  //    (so "12" casts to 12), hence [\x00-\x20] in the gate rather
  //    than \s — the two differ on control-char-padded numerics.
  //  - key drift: json_keys + the '$."<key>"' path handles keys
  //    containing '.' but NOT keys containing a double-quote (the path
  //    quoting would break). ASSUMPTION (like the ASCII one in
  //    MultimodalOps): props keys never contain '"' — true of the
  //    fixtures and of sane telemetry schemas.
  val propsMapSql: String =
    """WITH kv AS (
      |  SELECT key, json_extract_string(props, '$."' || key || '"') AS val
      |  FROM (SELECT props, unnest(json_keys(props)) AS key FROM events)
      |), gated AS (
      |  -- mirror Spark's trimAll: accept and strip ALL chars <= 0x20,
      |  -- not just \s, before the cast (DuckDB's own cast trim is
      |  -- narrower and would null control-char-padded integers)
      |  SELECT key,
      |    CASE WHEN regexp_matches(val, '^[\x00-\x20]*[+-]?[0-9]+[\x00-\x20]*$')
      |         THEN TRY_CAST(regexp_replace(val,
      |                '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g') AS BIGINT)
      |    END AS num
      |  FROM kv
      |)
      |SELECT key, COUNT(*) AS n,
      |  min(num) AS min_val,
      |  max(num) AS max_val
      |FROM gated GROUP BY key ORDER BY key""".stripMargin

  /** Ranking-function family over per-user activity: rank / dense_rank /
    * cume_dist share a ties-allowed ordering (integer key, so tie groups
    * are engine-identical), lead uses the unique tie-broken ordering.
    * Covers the §2.7 window flavors q04/q14's row_number doesn't.
    */
  def userRanks(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val tied = Window.partitionBy(col("event_type"))
      .orderBy(col("n_events").desc)
    val unique = Window.partitionBy(col("event_type"))
      .orderBy(col("n_events").desc, col("user_id"))
    base.select(col("event_type"), col("user_id"), col("n_events"),
      rank().over(tied).as("rnk"),
      dense_rank().over(tied).as("drnk"),
      cume_dist().over(tied).as("cd"),
      lead(col("n_events"), 1).over(unique).as("next_n"))
      .orderBy(col("event_type"), col("user_id"))
  }

  val userRanksSql: String =
    """WITH base AS (
      |  SELECT event_type, user_id, COUNT(*) AS n_events
      |  FROM events GROUP BY event_type, user_id
      |)
      |SELECT event_type, user_id, n_events,
      |  CAST(rank() OVER (PARTITION BY event_type ORDER BY n_events DESC) AS INT) AS rnk,
      |  CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY n_events DESC) AS INT) AS drnk,
      |  cume_dist() OVER (PARTITION BY event_type ORDER BY n_events DESC) AS cd,
      |  lead(n_events, 1) OVER (PARTITION BY event_type
      |                          ORDER BY n_events DESC, user_id) AS next_n
      |FROM base
      |ORDER BY event_type, user_id""".stripMargin

  /** Per-type profile: exact distinct users, value distribution. */
  def typeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sumD(col("value")).as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("event_type"))

  val typeStatsSql: String =
    s"""SELECT event_type, COUNT(*) AS n,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  ${sumDSql("value")} AS total_value,
       |  MIN(value) AS min_value, MAX(value) AS max_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------- resample/ffill
  /** Hourly resample with forward fill (q68) — the time-series
    * regularization op (`resample('1h').ffill()` in dataframe dialects):
    * per user, one row per hour from first to last event; each hour
    * carries its event count and the latest observed value at or before
    * it (LOCF). The per-hour representative is deterministic (latest
    * (ts, event_id)); the hour grid is generated by exploding each
    * OBSERVATION across the hours it covers (rows ∝ span, not events²,
    * and the fill window runs on per-hour rows, never grid rows); the
    * fill is one user-partitioned window — everything shuffles on
    * user_id only, so the plan is D-way parallel at any scale with no
    * global sort before the presentation ORDER BY.
    */
  def hourlyResample(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .withColumn("us", unix_micros(col("ts")))
    // One (user_id, hr) aggregate carries BOTH the per-hour count and the
    // latest-observed value (max_by over the unique (us, event_id) order —
    // deterministic because event_id is unique). This replaces the
    // earlier 3-consumer shape (row_number window + count groupBy + span
    // groupBy), whose window sort alone re-shuffled every event row: the
    // raw events now cross the wire exactly once, map-side partials
    // included, and everything downstream is per-hour granularity
    // (measured 0.66 s -> ~0.4 s at sf0.1; at 100 TB the delta is two
    // full-fact exchanges).
    val perHour = ev.groupBy(col("user_id"), col("hr"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col("value"), struct(col("us"), col("event_id"))).as("hr_value"))
    // LOCF computed on PER-HOUR rows, then each row exploded across the
    // hours it covers ([hr, next_hr)) — the filled hours between two
    // observations inherit the covering row's forward-filled value by
    // construction, so this is row-identical to the earlier
    // grid-generate → left-join → grid-scale-window shape while touching
    // an order of magnitude fewer rows: the 10x probe (BUILD_NOTES r18)
    // measured the grid at 10.5M rows vs 955k per-hour rows, and the
    // grid JOIN exchange + grid WINDOW exchange were ~9.4 s of q68's
    // 16.6 s there. Both are gone: the two window frames below share
    // one (user_id)-exchange + sort of per-hour rows, the explode is
    // map-side, and the only remaining grid-scale work is the
    // presentation ORDER BY — inherent to the query's output contract.
    // At 100 TB the removed exchanges are grid-scale (span-hours x
    // users), strictly larger than the corpus's per-hour rows.
    val wHr = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    perHour
      // last non-null value at or before this observation — original
      // hours and every hour they cover show exactly this (a null
      // hr_value row carries the previous non-null forward, matching
      // the grid-join form's ignoreNulls LOCF)
      .withColumn("ffv", last(col("hr_value"), ignoreNulls = true)
        .over(wHr.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_hr", lead(col("hr"), 1).over(wHr))
      // the user's grid ends at their LAST active hour (the old
      // sequence(min hr, max hr) span): the final observation covers
      // only itself
      .select(col("user_id"), col("hr").as("obs_hr"), col("n_events"),
        col("ffv"),
        explode(sequence(col("hr"),
          coalesce(col("next_hr") - expr("interval 1 hour"), col("hr")),
          expr("interval 1 hour"))).as("hr"))
      .select(col("user_id"), col("hr"),
        when(col("hr") === col("obs_hr"), col("n_events"))
          .otherwise(lit(0L)).as("n_events"),
        col("ffv").as("value_ffill"))
      .orderBy(col("user_id"), col("hr"))
  }

  val hourlyResampleSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, value,
      |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events
      |), last_in_hr AS (
      |  SELECT user_id, hr, value AS hr_value FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, hr
      |                                 ORDER BY us DESC, event_id DESC) AS rn
      |    FROM ev
      |  ) WHERE rn = 1
      |), counts AS (
      |  SELECT user_id, hr, COUNT(*) AS n_events FROM ev GROUP BY 1, 2
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(hr0, hr1, INTERVAL 1 HOUR)) AS hr
      |  FROM (SELECT user_id, min(hr) AS hr0, max(hr) AS hr1 FROM ev GROUP BY 1)
      |)
      |SELECT g.user_id, g.hr,
      |  CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events,
      |  last_value(l.hr_value IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
      |FROM grid g
      |LEFT JOIN counts c ON g.user_id = c.user_id AND g.hr = c.hr
      |LEFT JOIN last_in_hr l ON g.user_id = l.user_id AND g.hr = l.hr
      |ORDER BY g.user_id, g.hr""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_hourly_resample" -> (hourlyResample _),
    "q17_json_extract" -> (jsonExtract _),
    "q18_hourly_rollup" -> (hourlyRollup _),
    "q19_sessionize" -> (sessionize _),
    "q20_type_stats" -> (typeStats _),
    "q49_sliding_rollup" -> (slidingRollup _),
    "q50_user_ranks" -> (userRanks _),
    "q53_props_map" -> (propsMap _))

  val oracle: Map[String, String] = Map(
    "q68_hourly_resample" -> hourlyResampleSql,
    "q17_json_extract" -> jsonExtractSql,
    "q18_hourly_rollup" -> hourlyRollupSql,
    "q19_sessionize" -> sessionizeSql,
    "q20_type_stats" -> typeStatsSql,
    "q49_sliding_rollup" -> slidingRollupSql,
    "q50_user_ranks" -> userRanksSql,
    "q53_props_map" -> propsMapSql)
}
