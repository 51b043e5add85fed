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

  /** IVF ANN (scale path, rows-only check — KMeans assignments aren't
    * SQL-oracle-reproducible): seeded KMeans coarse quantizer + in-cell
    * brute force via graft.similarity.Similarity. Measured at 100k
    * vectors / 1000 probes: 20 s one-time index build + ~1 s per 1000
    * probes vs 166 s brute force, 100% top-1 recall on planted
    * near-duplicates (see BUILD_NOTES).
    */
  /** IVF index cache: build-once / search-many is the point of IVF — the
    * index build (KMeans fit + cell assignment) amortizes over probe
    * volume, so repeated q16 invocations against the same data reuse the
    * index instead of re-fitting. Keyed per (session, dir). Entries for
    * stopped sessions are dropped (and their persisted cells released)
    * on every access, so cycling sessions in one JVM cannot accumulate
    * dead indexes; callers that rewrite the data under `dir` must call
    * [[invalidateIvf]] — the cache has no way to observe file changes.
    */
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String),
      graft.similarity.Similarity.IvfIndex]

  /** Drop the cached index for (session, dir) after an embeddings
    * rewrite; no-op if absent. */
  def invalidateIvf(spark: SparkSession, dir: String): Unit =
    ivfCache.remove((spark, dir)).foreach { idx =>
      scala.util.Try(idx.cells.unpersist())
    }

  private def evictStopped(): Unit =
    ivfCache.keys.filter(_._1.sparkContext.isStopped).foreach { k =>
      ivfCache.remove(k).foreach(idx => scala.util.Try(idx.cells.unpersist()))
    }

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    evictStopped()
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val index = ivfCache.getOrElseUpdate((spark, dir),
      graft.similarity.Similarity.buildIvfIndex(emb, k = 10))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    // self-match excluded BEFORE ranking so all topK slots hold real
    // neighbours
    graft.similarity.Similarity
      .annSearch(index, probes, nprobe = 3, topK = 5, excludeSelf = true)
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
