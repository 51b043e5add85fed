package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** IVF ANN quality: planted near-duplicates (tiny perturbations) must be
  * recovered as top-1 neighbours through the KMeans-cell index — the
  * perturbation is far smaller than inter-cluster distances, so probe
  * and original land in the same cell.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("kmeans IVF recovers planted near-duplicates as top-1") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val index = Similarity.buildIvfIndex(emb, k = 10)
    // probes: perturbed copies of vectors 100..149
    val probes = emb.filter($"vec_id" >= 100 && $"vec_id" < 150)
      .select($"vec_id".as("probe_id"),
        transform($"embedding", x => x + lit(0.0001f)).as("embedding"))
    val got = Similarity.annSearch(index, probes, nprobe = 3, topK = 1)
    val hits = got.filter($"rank" === 1 && $"cand_id" === $"probe_id").count()
    assert(hits >= 48, s"top-1 self-recovery $hits/50") // >=96%
    index.cells.unpersist()
  }

  test("annSearch cell scan is bounded by nprobe cells") {
    val emb = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val index = Similarity.buildIvfIndex(emb, k = 10)
    val probes = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("probe_id"), $"embedding")
    val res = Similarity.annSearch(index, probes, nprobe = 2, topK = 5)
    // every returned candidate must come from one of the probe's 2 cells
    val cellsOf = index.cells.select($"vec_id".as("cand_id"), $"cell")
    val joined = res.join(cellsOf, "cand_id")
      .select($"probe_id", $"cell").distinct()
      .groupBy($"probe_id").count()
    assert(joined.filter($"count" > 2).count() == 0)
    index.cells.unpersist()
  }
}
