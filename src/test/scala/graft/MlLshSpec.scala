package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** spark.ml MinHashLSH agreement with the engine's deterministic MinHash
  * (q12): both work on 3-token shingles; the seeded ml pipeline must
  * recover the high-Jaccard pairs the exact band join surfaces.
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
}
