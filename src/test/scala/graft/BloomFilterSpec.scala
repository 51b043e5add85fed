package graft

import graft.functions.expressions.BloomFilters
import org.apache.spark.sql.functions._

/** The bloom expression wrappers and the q88 bloom-prescreened
  * decontamination path: no false negatives ever, bounded false
  * positives, and result identity with the exact-broadcast q41.
  */
class BloomFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("bloomAgg/mightContain: every inserted key hits, FP rate bounded") {
    val keys = (0 until 2000).map(i => s"member-$i")
    val bloom = keys.toDF("k")
      .agg(BloomFilters.bloomAgg(col("k"), 2000L, 20000L))
      .head().getAs[Array[Byte]](0)
    // no false negatives — the contract the prescreen correctness rests on
    val hits = keys.toDF("k")
      .filter(BloomFilters.mightContain(bloom, col("k"))).count()
    assert(hits == keys.size)
    // false positives bounded: 10 bits/key ≈ 1% expected; allow 5%
    val probes = (0 until 2000).map(i => s"outsider-$i")
    val fps = probes.toDF("k")
      .filter(BloomFilters.mightContain(bloom, col("k"))).count()
    assert(fps < 100, s"FP count $fps out of 2000 probes")
  }

  test("q88 bloom-prescreened decontamination == q41 exact-broadcast result") {
    val got = queries.PipelineOps.bloomDecontaminate(spark, sf)
      .collect().toSeq
    val want = queries.PipelineOps.decontaminate(spark, sf)
      .collect().toSeq
    assert(got.nonEmpty)
    assert(got == want)
  }
}
