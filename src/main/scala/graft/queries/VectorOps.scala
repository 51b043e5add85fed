package graft.queries

import graft.Tables
import graft.functions.VectorFunctions._
import graft.functions.expressions.LongDotProduct.longDot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search + vector aggregation over the `embeddings` table
  * (north-star ops, SURVEY.md §2 F12/§2.4).
  *
  * Oracle-checked queries use integer fixed-point quantization so every
  * sum is exact and order-independent (see VectorFunctions.quantize);
  * the final cosine is one deterministic double expression. Full-precision
  * float paths exist alongside for library use.
  *
  * Scale shape: brute-force top-k broadcasts the (small) probe set against
  * the full collection — a map-only scan + per-partition top-k via window.
  * At 100 TB the same plan holds: probes broadcast, collection scanned
  * once, k rows per probe survive the exchange.
  */
object VectorOps {
  /** Brute-force cosine top-5 neighbours for probe vectors (vec_id < 10),
    * quantized-exact so both engines rank identically.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    // Precompute each vector's norm once — the pairwise expression is then
    // a single fold per pair instead of three.
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("norm", sqrt(longDot("q", "q").cast("double")))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("norm").as("pnorm"))
    val cands = emb.select(col("vec_id").as("cand_id"), col("q").as("cq"), col("norm").as("cnorm"))
    val scored = cands.join(broadcast(probes), col("cand_id") =!= col("probe_id"))
      .withColumn("cos", longDot("pq", "cq").cast("double") /
        (col("pnorm") * col("cnorm")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("cand_id"), col("rank"), col("cos"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val cosineTopKSql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), pairs AS (
      |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
      |    CAST(list_sum(list_transform(list_zip(p.qv, c.qv), z -> z[1] * z[2])) AS DOUBLE) /
      |      (sqrt(CAST(list_sum(list_transform(p.qv, x -> x * x)) AS DOUBLE)) *
      |       sqrt(CAST(list_sum(list_transform(c.qv, x -> x * x)) AS DOUBLE))) AS cos
      |  FROM q p JOIN q c ON p.vec_id < 10 AND c.vec_id <> p.vec_id
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
      |                               ORDER BY cos DESC, cand_id) AS rank
      |  FROM pairs
      |)
      |SELECT probe_id, cand_id, rank, cos
      |FROM ranked WHERE rank <= 5
      |ORDER BY probe_id, rank""".stripMargin

  /** Per-label centroids, flat (label, pos, centroid) rows. Quantized
    * bigint sums are exact under any aggregation order; the average is a
    * single double division both engines share.
    */
  def centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(quantize(col("embedding"))).as(Seq("pos", "qval")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("qval")).cast("double") /
        (count(lit(1)) * lit(1000000.0))).as("centroid"))
      .orderBy(col("label"), col("pos"))

  val centroidsSql: String =
    """WITH e AS (
      |  SELECT label,
      |    unnest(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS qval,
      |    unnest(range(len(embedding))) AS pos
      |  FROM embeddings
      |)
      |SELECT label, pos,
      |  CAST(SUM(qval) AS DOUBLE) / (COUNT(*) * 1000000.0) AS centroid
      |FROM e GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin

  /** IVF-style ANN (scale path, rows-only check — not SQL-expressible as
    * a single oracle): coarse-quantize the collection to the label
    * centroids, probe only the nearest `nprobe` cells. Demonstrates the
    * two-stage ANN shape: cell assignment (broadcast centroids) then
    * in-cell brute force.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("q"))
      .withColumn("norm", sqrt(longDot("q", "q").cast("double")))
    // centroid table: label -> quantized centroid (built from the data)
    val cents = Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(quantize(col("embedding"))).as(Seq("pos", "qval")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("qval")).cast("long").as("cq"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cq")))).as("pairs"))
      .select(col("label").as("cell"), transform(col("pairs"), p => p("cq")).as("centroid"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("q").as("pq"), col("norm").as("pnorm"))
    // stage 1: nearest 3 cells per probe (broadcast centroids)
    val cellRank = Window.partitionBy(col("probe_id"))
      .orderBy(col("cell_cos").desc, col("cell"))
    val probeCells = probes.join(broadcast(cents), lit(true))
      .withColumn("cell_cos", cosineQuantized(col("pq"), col("centroid")))
      .withColumn("crank", row_number().over(cellRank))
      .filter(col("crank") <= 3)
      .select(col("probe_id"), col("pq"), col("pnorm"), col("cell"))
    // stage 2: brute force within selected cells only
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    emb.select(col("label").as("cell"), col("vec_id").as("cand_id"),
        col("q").as("cq"), col("norm").as("cnorm"))
      .join(broadcast(probeCells), Seq("cell"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("cos", longDot("pq", "cq").cast("double") /
        (col("pnorm") * col("cnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("cand_id"), col("rank"), col("cos"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_cosine_topk" -> (cosineTopK _),
    "q15_centroids" -> (centroids _),
    "q16_ann_ivf" -> (annIvf _))

  val oracle: Map[String, String] = Map(
    "q14_cosine_topk" -> cosineTopKSql,
    "q15_centroids" -> centroidsSql)
}
