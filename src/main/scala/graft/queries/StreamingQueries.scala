package graft.queries

import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q79: the Structured Streaming surface (SURVEY.md §2.9) under the
  * DuckDB oracle gate — the streaming twin of what q78 did for the Kafka
  * source contract.
  *
  * The events fixture is read through the REAL streaming entry points:
  * `Streaming.fileEventSource` (readStream.parquet over the staged
  * fixture, shared ts normalization) → `Streaming.windowedRollup` (the
  * production watermarked window aggregate) → a `Trigger.AvailableNow`
  * drain — the reference's drain-everything-then-stop semantics
  * (`scripts/spark_processing.py:53-59` reads the whole topic as a batch;
  * here the same bounded-drain shape runs as a genuine streaming query
  * with checkpointed progress). The oracle states the identical rollup
  * over the parquet directly (q18's SQL), so a hash-match proves the
  * stream path — source staging, micro-batching, event-time windowing,
  * state store, drain — is lossless and duplicate-free, not just
  * spec-covered.
  */
object StreamingQueries {
  private val drainId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** q79: hourly event-type rollup computed BY THE STREAMING ENGINE.
    * Complete output mode: AvailableNow drains the fixture in bounded
    * micro-batches and the final emit carries every window, exactly the
    * batch q18 result (append mode would hold back windows the closing
    * watermark never passed — correct for an unbounded stream, wrong for
    * an oracle-compared bounded drain).
    */
  def streamedHourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val rolled = Streaming.windowedRollup(Streaming.fileEventSource(spark, dir))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // The stateful agg creates one state-store instance per shuffle
    // partition, each with its own checkpoint dir, snapshot and commit
    // files — at local bench scale that per-partition constant dominates
    // the drain. 8 partitions is still a distributed plan (state scales
    // out by repartitioning the checkpoint at deployment); the conf is
    // captured at stream START, so scoping it around start() is safe and
    // is restored before any other query plans.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try Streaming.drainToBatch(rolled, s"q79_drain_${drainId.incrementAndGet()}",
        outputMode = "complete")
      .orderBy(col("hour"), col("event_type"))
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Same statement as q18's oracle — the two entries must never drift,
    * so the SQL is shared, not copied. */
  val streamedHourlyRollupSql: String = EventOps.hourlyRollupSql

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_streamed_rollup" -> (streamedHourlyRollup _))

  val oracle: Map[String, String] = Map(
    "q79_streamed_rollup" -> streamedHourlyRollupSql)
}
