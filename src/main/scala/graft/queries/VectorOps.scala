package graft.queries

import graft.Tables
import graft.functions.VectorFunctions._
import graft.functions.expressions.LongDotProduct.longDot
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    *
    * Reduction is the distributed top-k aggregate ([[graft.functions
    * .TopK]]): map-side partial top-5 per (partition, probe), then a
    * k-way merge — the shuffle moves ≤5 rows per (partition, probe)
    * instead of every scored candidate, so reduction width scales with
    * the cluster, not with the probe count.
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
      .withColumn("cos", graft.functions.VectorFunctions.safeCos(
        longDot("pq", "cq").cast("double"), col("pnorm") * col("cnorm")))
    val tk = graft.functions.TopK.topK(5)
    val agged = scored.groupBy(col("probe_id"))
      .agg(tk(-col("cos"), col("cand_id")).as("tk"))
    graft.functions.TopK.explodeRanked(agged, "tk", Seq("probe_id"))
      .select(col("probe_id"), col("id").as("cand_id"), col("rank"),
        (-col("score")).as("cos"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val cosineTopKSql: String =
    s"""WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), pairs AS (
      |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
      |    ${graft.functions.VectorFunctions.safeCosSql(
        "CAST(list_sum(list_transform(list_zip(p.qv, c.qv), z -> z[1] * z[2])) AS DOUBLE)",
        "sqrt(CAST(list_sum(list_transform(p.qv, x -> x * x)) AS DOUBLE)) * " +
          "sqrt(CAST(list_sum(list_transform(c.qv, x -> x * x)) AS DOUBLE))")} AS cos
      |  FROM q p JOIN q c ON p.vec_id < 10 AND c.vec_id <> p.vec_id
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
      |                               ORDER BY cos DESC, cand_id) AS rank
      |  FROM pairs
      |)
      |SELECT probe_id, cand_id, rank, cos
      |FROM ranked WHERE rank <= 5
      |ORDER BY probe_id, rank""".stripMargin

  /** Metadata-filtered top-k (q63): cosine top-5 restricted to candidates
    * sharing the probe's label — the "filtered vector search" every
    * retrieval system needs (category/tenant/language constraints).
    * Same broadcast-probe scan + distributed top-k reduction as q14 with
    * the label equality folded into the join condition, so the filter
    * prunes candidates BEFORE any scoring work. At 100 TB this shape
    * (filter-then-brute-force) beats post-filtering an ANN index whenever
    * the predicate is selective — the standard pre-filter/post-filter
    * tradeoff, here on the exact path.
    */
  def filteredTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("q"))
      .withColumn("norm", sqrt(longDot("q", "q").cast("double")))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("label"),
        col("q").as("pq"), col("norm").as("pnorm"))
    val cands = emb.select(col("vec_id").as("cand_id"), col("label").as("clabel"),
      col("q").as("cq"), col("norm").as("cnorm"))
    val scored = cands.join(broadcast(probes),
      col("cand_id") =!= col("probe_id") && col("clabel") === col("label"))
      .withColumn("cos", graft.functions.VectorFunctions.safeCos(
        longDot("pq", "cq").cast("double"), col("pnorm") * col("cnorm")))
    val tk = graft.functions.TopK.topK(5)
    val agged = scored.groupBy(col("probe_id"), col("label"))
      .agg(tk(-col("cos"), col("cand_id")).as("tk"))
    graft.functions.TopK.explodeRanked(agged, "tk", Seq("probe_id", "label"))
      .select(col("probe_id"), col("label"), col("id").as("cand_id"),
        col("rank"), (-col("score")).as("cos"))
      .orderBy(col("probe_id"), col("rank"))
  }

  val filteredTopKSql: String =
    s"""WITH q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), pairs AS (
      |  SELECT p.vec_id AS probe_id, p.label AS label, c.vec_id AS cand_id,
      |    ${graft.functions.VectorFunctions.safeCosSql(
        "CAST(list_sum(list_transform(list_zip(p.qv, c.qv), z -> z[1] * z[2])) AS DOUBLE)",
        "sqrt(CAST(list_sum(list_transform(p.qv, x -> x * x)) AS DOUBLE)) * " +
          "sqrt(CAST(list_sum(list_transform(c.qv, x -> x * x)) AS DOUBLE))")} AS cos
      |  FROM q p JOIN q c
      |    ON p.vec_id < 10 AND c.vec_id <> p.vec_id AND c.label = p.label
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
      |                               ORDER BY cos DESC, cand_id) AS rank
      |  FROM pairs
      |)
      |SELECT probe_id, label, cand_id, rank, cos
      |FROM ranked WHERE rank <= 5
      |ORDER BY probe_id, rank""".stripMargin

  // --------------------------------------------- random projection (q64)
  /** Sign-random-projection dimensionality reduction: 64-dim float
    * embeddings → 16-dim via a ±1 projection matrix (the
    * Johnson–Lindenstrauss / SimHash-family transform — the cheap
    * compression step before clustering or coarse search). The matrix is
    * derived once from md5("j:i") parity at plan-build time and embedded
    * as literals in BOTH engines' expressions, so the projection is
    * deterministic and portable with zero per-row hashing. Quantized
    * integer dot products keep every sum exact; map-only — the 100 TB
    * cost is the scan.
    */
  val projDims = 16
  val srcDims = 64

  private lazy val signMatrix: Array[Array[Long]] =
    Array.tabulate(projDims, srcDims) { (j, i) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1L else -1L
    }

  def randomProjection(spark: SparkSession, dir: String): DataFrame = {
    val dims = (0 until projDims).map { j =>
      val signs = typedLit(signMatrix(j).toSeq)
      struct(lit(j).as("dim"),
        aggregate(zip_with(col("q"), signs, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("proj_q"))
    }
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .select(col("vec_id"), explode(array(dims: _*)).as("d"))
      .select(col("vec_id"), col("d.dim").as("dim"),
        col("d.proj_q").as("proj_q"),
        (col("d.proj_q").cast("double") / 1000000.0).as("proj"))
      .orderBy(col("vec_id"), col("dim"))
  }

  val randomProjectionSql: String = {
    val structs = (0 until projDims).map { j =>
      val lits = signMatrix(j).mkString("[", ",", "]")
      s"{'dim': $j, 'p': list_sum(list_transform(list_zip(qv, $lits), z -> z[1] * z[2]))}"
    }.mkString(",\n    ")
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
       |  FROM embeddings
       |), proj AS (
       |  SELECT vec_id, unnest([
       |    $structs
       |  ]) AS s
       |  FROM q
       |)
       |SELECT vec_id, s.dim AS dim, CAST(s.p AS BIGINT) AS proj_q,
       |  CAST(s.p AS DOUBLE) / 1000000.0 AS proj
       |FROM proj ORDER BY vec_id, dim""".stripMargin
  }

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
    * index instead of re-fitting. A [[graft.ops.SessionLru]] keyed per
    * (session, dir), LRU-bounded at [[IvfCacheMax]] live entries, with a
    * content fingerprint of the embeddings parquet (file names + lengths
    * + mtimes) so a rewrite under `dir` is observed on the next access
    * and the stale index is rebuilt automatically — [[invalidateIvf]]
    * remains for callers that want eager release.
    * `releaseOnRaceLoss = true`: each racer's build owns distinct
    * persisted cell frames, so the insert-race loser's cells are freed.
    */
  val IvfCacheMax = 8

  private val ivfCache =
    new graft.ops.SessionLru[graft.similarity.Similarity.IvfIndex](
      IvfCacheMax, idx => idx.cells.unpersist(), releaseOnRaceLoss = true)

  /** Drop the cached index for (session, dir) after an embeddings
    * rewrite; no-op if absent. (Rewrites are also caught automatically
    * via the fingerprint — this just releases the old cells eagerly.) */
  def invalidateIvf(spark: SparkSession, dir: String): Unit =
    ivfCache.invalidate(spark, dir)

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val fp = graft.ops.SessionLru.pathFingerprint(spark, s"$dir/embeddings.parquet")
    val index = ivfCache.getOrBuild(spark, dir, fp) {
      graft.similarity.Similarity.buildIvfIndex(emb, k = 10)
    }
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    // self-match excluded BEFORE ranking so all topK slots hold real
    // neighbours
    graft.similarity.Similarity
      .annSearch(index, probes, nprobe = 3, topK = 5, excludeSelf = true)
      .orderBy(col("probe_id"), col("rank"))
  }

  /** IVF recall gate (q57): the ANN index's recall@5 against the exact
    * brute-force top-5, emitted as ONE oracle-comparable row. DuckDB
    * cannot reproduce KMeans cell assignments (q16 stays rows-only), but
    * it can state the CONTRACT: the probe count and exact-pair count are
    * derived from the data, and `recall_at_5_ok` must be literally true.
    * If an index regression drops recall below [[annRecallThreshold]],
    * the boolean flips and the driver's hash compare fails — the
    * approximate path now has a hard correctness gate, not just a row
    * count. (Deterministic: seeded KMeans + quantized-exact scoring.)
    *
    * Threshold calibration (measured on the synthetic embeddings):
    * correct index = 0.56 / 0.56 / 0.64 recall@5 at sf0.001/0.01/0.1 —
    * the table has weak cluster structure, so nprobe=3 of 10 cells
    * cannot approach 1.0 (real embedding corpora cluster much harder; a
    * planted-near-dup corpus measures 100% top-1, see SimilaritySpec and
    * BUILD_NOTES). A BROKEN index (uninformative cells) converges to
    * nprobe/k = 0.30. The gate sits between the two regimes with margin
    * on both sides: it trips on quantizer/search regressions without
    * flaking on data-structure noise.
    */
  val annRecallThreshold = 0.45

  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = cosineTopK(spark, dir).select(col("probe_id"), col("cand_id"))
    val approx = annIvf(spark, dir).select(col("probe_id"), col("cand_id"),
      lit(1L).as("hit"))
    exact.join(approx, Seq("probe_id", "cand_id"), "left")
      .agg(
        countDistinct(col("probe_id")).as("n_probes"),
        count(lit(1)).as("n_exact_pairs"),
        (sum(coalesce(col("hit"), lit(0L))).cast("double") /
          count(lit(1)).cast("double") >= annRecallThreshold)
          .as("recall_at_5_ok"))
  }

  val annRecallSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
      |  CAST(COUNT(*) * 5 AS BIGINT) AS n_exact_pairs,
      |  TRUE AS recall_at_5_ok
      |FROM embeddings WHERE vec_id < 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_cosine_topk" -> (cosineTopK _),
    "q15_centroids" -> (centroids _),
    "q16_ann_ivf" -> (annIvf _),
    "q57_ann_recall" -> (annRecall _),
    "q63_filtered_topk" -> (filteredTopK _),
    "q64_random_projection" -> (randomProjection _))

  val oracle: Map[String, String] = Map(
    "q14_cosine_topk" -> cosineTopKSql,
    "q15_centroids" -> centroidsSql,
    "q57_ann_recall" -> annRecallSql,
    "q63_filtered_topk" -> filteredTopKSql,
    "q64_random_projection" -> randomProjectionSql)
}
