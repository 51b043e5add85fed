package graft

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** spark.ml LSH agreement with the engine's exact formulations:
  * MinHashLSH vs the deterministic MinHash band join (q12), and
  * BucketedRandomProjectionLSH (euclidean) vs the quantized-exact L2
  * top-k (q44). The seeded approximate pipelines must recover what the
  * exact queries surface.
  */
class MlLshSpec extends SparkTestBase {
  import spark.implicits._

  test("ml MinHashLSH recovers the exact high-jaccard pairs") {
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        transform(sequence(lit(0), size(col("toks")) - 3),
          i => array_join(slice(col("toks"), i + 1, lit(3)), " ")).as("shingles"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(docs)
      .filter(size(col("shingles")) > 0)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(feat)
    val pairs = model.approxSimilarityJoin(feat, feat, 0.6, "jaccard_dist")
      .select(col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"), col("jaccard_dist"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    // ground truth: q12's exact-verified candidates at jaccard >= 0.5
    val exact = graft.queries.TextOps.minhashPairs(spark, sf)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val exactN = exact.count()
    val found = exact.join(pairs, Seq("doc_a", "doc_b"), "left_semi").count()
    assert(exactN == 0 || found >= (exactN * 0.8).toLong,
      s"ml LSH recovered $found of $exactN exact pairs")
  }

  test("BucketedRandomProjectionLSH recovers the exact euclidean neighbours") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("fv"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("fv").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(emb)
    val hashed = model.transform(emb).cache()
    // per-probe top-5 via approxNearestNeighbors on each of the 10 probes
    val probes = emb.filter(col("vec_id") < 10).collect()
    val exact = graft.queries.PipelineOps.euclideanTopK(spark, sf)
    var found = 0L
    probes.foreach { row =>
      val pid = row.getLong(0)
      val key = row.getAs[org.apache.spark.ml.linalg.Vector]("fv")
      val ann = model.approxNearestNeighbors(hashed, key, 6) // self + 5
        .filter(col("vec_id") =!= pid)
        .select(col("vec_id")).as[Long].collect().toSet
      val want = exact.filter(col("probe_id") === pid)
        .select(col("cand_id")).as[Long].collect().toSet
      found += want.count(ann.contains)
    }
    val total = exact.count()
    assert(found >= (total * 0.6).toLong,
      s"BRP-LSH recovered $found of $total exact euclidean neighbours")
    hashed.unpersist()
    ()
  }
}
