package graft.similarity

import graft.functions.VectorFunctions.quantize
import graft.functions.expressions.LongDotProduct.longDot
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbour search with a real IVF index: KMeans
  * coarse quantizer (seeded spark.ml) + in-cell brute force. The two
  * phases are split so the index cost amortizes over probe volume — the
  * shape that matters at 100 TB:
  *
  *  - build: KMeans over the collection (train on a sample for huge N),
  *    assign every vector to its nearest centroid cell, persist the
  *    cell-partitioned collection. One-time cost.
  *  - search: score probes against k centroids (tiny broadcast), pick
  *    `nprobe` cells, brute-force only those cells with the codegen'd
  *    quantized dot product. Per-probe work drops from O(N) to
  *    O(k + nprobe·N/k).
  *
  * Brute force stays the exact-recall baseline (VectorOps.cosineTopK);
  * IVF recall depends on how well cells capture the metric structure —
  * measured in SimilaritySpec with planted near-duplicates.
  */
object Similarity {
  /** cells: (vec_id, cell, q, norm); centroids: (cell, cq, cnorm). */
  case class IvfIndex(cells: DataFrame, centroids: DataFrame)

  /** Build the IVF index over (vec_id, embedding array<float>).
    *
    * The coarse quantizer trains on a bounded sample (~`trainTarget`
    * rows, exact below it): a full-collection KMeans fit at 100 TB is an
    * iterative ML job over every vector just to build an index, while
    * quantizer quality saturates at O(100k) training vectors regardless
    * of collection size — standard IVF practice. ASSIGNMENT still covers
    * every vector (`transform` below), so the index is total either way.
    */
  def buildIvfIndex(emb: DataFrame, k: Int, seed: Long = 42L,
      maxIter: Int = 5, trainTarget: Long = 100000L,
      knownCount: Long = -1L): IvfIndex = {
    require(trainTarget >= k,
      s"buildIvfIndex: trainTarget=$trainTarget must be >= k=$k — the " +
        "quantizer cannot fit k centroids on fewer training rows")
    val spark = emb.sparkSession
    val feat = emb.withColumn("fv", array_to_vector(col("embedding")))
    // `knownCount` spares the cardinality job when the caller already
    // tracks its collection size (a catalog stat, a prior count) — the
    // count() fallback is one extra pass whose only purpose is sizing
    // the training sample.
    val n = if (knownCount >= 0) knownCount else emb.count()
    val train =
      if (n <= trainTarget) feat
      else {
        // 10% headroom: the Bernoulli sample must (almost surely) keep at
        // least k rows; only boundedness matters, not exactness
        val sampled = feat.sample(withReplacement = false,
          math.min(1.0, trainTarget.toDouble * 1.1 / n), seed)
        // trainTarget >= k (required above) makes an under-k sample all
        // but impossible, but a wrong knownCount could still starve the
        // fit — top up deterministically rather than fail inside KMeans
        if (sampled.limit(k).count() < k) feat.limit(k) else sampled
      }
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(train)
    val cells = model.transform(feat)
      .select(col("vec_id"), col("cell"), quantize(col("embedding")).as("q"))
      .withColumn("norm", sqrt(longDot("q", "q").cast("double")))
      .repartition(col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroidRows = model.clusterCenters.zipWithIndex.map {
      case (c: Vector, i: Int) =>
        (i, c.toArray.map(x => math.round(x * 1000000).toLong))
    }.toSeq
    import spark.implicits._
    val centroids = centroidRows.toDF("cell", "cq")
      .withColumn("cnorm", sqrt(longDot("cq", "cq").cast("double")))
    IvfIndex(cells, centroids)
  }

  /** Top-k cosine neighbours for probes (probe_id, embedding), searching
    * `nprobe` cells per probe. With `excludeSelf` the candidate whose
    * vec_id equals the probe_id is dropped BEFORE ranking (for probes
    * drawn from the indexed collection — otherwise the self-match
    * consumes a top-k slot at cos 1.0).
    */
  def annSearch(index: IvfIndex, probes: DataFrame, nprobe: Int = 3,
      topK: Int = 5, excludeSelf: Boolean = false): DataFrame = {
    import graft.functions.TopK
    val p = probes
      .select(col("probe_id"), quantize(col("embedding")).as("pq"))
      .withColumn("pnorm", sqrt(longDot("pq", "pq").cast("double")))
    // nprobe cell selection via the distributed top-k aggregate (ascending
    // (-cell_cos, cell) == the old cell_cos DESC, cell window order); the
    // probe payload (pq, pnorm) is re-attached by an equi-join afterwards
    // rather than carried through the aggregation.
    val tkCells = TopK.topK(nprobe)
    val cellSel = p.join(broadcast(index.centroids), lit(true))
      .withColumn("cell_cos", graft.functions.VectorFunctions.safeCos(
        longDot("pq", "cq").cast("double"), col("pnorm") * col("cnorm")))
      .groupBy(col("probe_id"))
      .agg(tkCells(-col("cell_cos"), col("cell").cast("long")).as("tkc"))
    val probeCells = TopK.explodeRanked(cellSel, "tkc", Seq("probe_id"))
      .select(col("probe_id"), col("id").cast("int").as("cell"))
      .join(p, Seq("probe_id"))
    val cands = index.cells
      .select(col("cell"), col("vec_id").as("cand_id"), col("q").as("cq2"),
        col("norm").as("cnorm2"))
      .join(broadcast(probeCells), Seq("cell"))
    // final reduction: map-side partial top-k per probe (see TopK docs)
    val tk = TopK.topK(topK)
    val agged =
      (if (excludeSelf) cands.filter(col("cand_id") =!= col("probe_id")) else cands)
        .withColumn("cos", graft.functions.VectorFunctions.safeCos(
          longDot("pq", "cq2").cast("double"), col("pnorm") * col("cnorm2")))
        .groupBy(col("probe_id"))
        .agg(tk(-col("cos"), col("cand_id")).as("tk"))
    TopK.explodeRanked(agged, "tk", Seq("probe_id"))
      .select(col("probe_id"), col("id").as("cand_id"), col("rank"),
        (-col("score")).as("cos"))
  }
}
