package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PII-scrubbing operators — the anonymization pass a training-data
  * pipeline runs before any text or structured record reaches a corpus:
  *
  *  - deterministic pseudonymization: md5 of the identifying value — a
  *    stable surrogate key, so downstream joins/dedup still work without
  *    the raw identity;
  *  - masking: digit runs in free-text identifiers replaced with 'X'
  *    (regexp, codegen'd — no UDF);
  *  - generalization: numeric quasi-identifiers coarsened to buckets
  *    (here acctbal → 1000-wide bands), the standard k-anonymity move;
  *  - k-anonymity audit: the size of each (nation, segment, band)
  *    equivalence class, attached per row — rows with k below policy are
  *    the re-identification risk a release gate suppresses.
  *
  * Plan shape: one scan, map-only scrubbing, and a single window
  * partitioned by the quasi-identifier class for the audit count (bounded
  * by class size — never a global sort). Scales as a linear pass at
  * 100 TB.
  */
object PrivacyOps {

  private def bucket: org.apache.spark.sql.Column =
    expr("CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT)")

  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"),
      col("acctbal_band"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        md5(col("c_name")).as("pseudonym"),
        regexp_replace(col("c_name"), "[0-9]", "X").as("masked_name"),
        col("c_nationkey"), col("c_mktsegment"),
        bucket.as("acctbal_band"))
      .withColumn("k_anon", count(lit(1)).over(w))
      .orderBy(col("c_custkey"))
  }

  val piiScrubSql: String =
    """WITH scrubbed AS (
      |  SELECT c_custkey,
      |    md5(c_name) AS pseudonym,
      |    regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked_name,
      |    c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) AS acctbal_band
      |  FROM customer
      |)
      |SELECT *,
      |  COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment, acctbal_band)
      |    AS k_anon
      |FROM scrubbed
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_pii_scrub" -> (piiScrub _))

  val oracle: Map[String, String] = Map(
    "q59_pii_scrub" -> piiScrubSql)
}
