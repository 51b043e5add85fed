package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Plan-SHAPE regression gates for the flagship queries (round-10
  * verdict item 4): `tools/gen_plans.scala` renders these plans into
  * PLANS.md for humans, but nothing failed if a shape rotted — a Spark
  * conf change silently demoting q03's broadcasts to shuffles, or a
  * refactor un-pushing q02's scan filters, would keep every correctness
  * row green while the 100 TB plan quietly degraded. Each test here pins
  * the property PLANS.md narrates, on the same formatted explain text,
  * so a flagship plan regression fails the suite instead of waiting for
  * a bench diff.
  *
  * The assertions run on the PLANNED (pre-execution) plan at sf0.001 —
  * the same static-planning decisions a cluster driver makes; AQE can
  * only improve on them at runtime (demote a shuffle to broadcast,
  * never the reverse for these shapes).
  */
class PlanShapeSpec extends SparkTestBase {
  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(FormattedMode)
  }

  test("q02: both scan filters reach parquet as PushedFilters") {
    val p = plan("q02_filter_pushdown")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters: ["))
      .mkString("\n")
    assert(pushed.nonEmpty, "no PushedFilters section in the scan:\n" + p)
    assert(!pushed.contains("PushedFilters: []"),
      "scan pushed NO filters:\n" + pushed)
  }

  test("q03: star join broadcasts every dimension, no cartesian") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"),
      "star join lost its broadcasts:\n" + p)
    assert(!p.contains("CartesianProduct"), "cartesian product in q03")
    assert(!p.contains("SortMergeJoin"),
      "a dimension fell back to a sort-merge shuffle join:\n" + p)
  }

  test("q12: LSH band join never plans an all-pairs join") {
    val p = plan("q12_minhash_pairs")
    assert(!p.contains("CartesianProduct"),
      "minhash candidate generation degenerated to O(N^2):\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "minhash candidate generation planned a nested-loop join:\n" + p)
  }

  test("q72: z-order box pushes BOTH dimensions to the scan") {
    val p = plan("q72_zorder_scan")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters: ["))
      .mkString("\n")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_partkey"),
      "z-order box predicates not pushed to parquet:\n" + pushed)
  }

  test("q81: shuffle-shard computes through a single hash exchange") {
    val p = plan("q81_shuffle_shard")
    val hashEx = p.linesIterator
      .count(l => l.contains("Exchange") && l.contains("hashpartitioning"))
    // one computation exchange on shard; the trailing presentation
    // ORDER BY adds a rangepartitioning exchange, which is allowed
    assert(hashEx <= 1,
      s"q81 grew to $hashEx hash exchanges (expected <= 1):\n" + p)
    assert(!p.contains("Exchange SinglePartition"),
      "q81 planned a single-reducer stage:\n" + p)
  }

  test("q41: benchmark side of the decontamination join is broadcast") {
    val p = plan("q41_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "q41 lost its broadcast (bench side now shuffles):\n" + p)
  }

  test("q32: sketch aggregates never share an Aggregate with the " +
      "distinct rewrite") {
    // The r11 lesson (BUILD_NOTES round 11): countDistinct's Expand
    // makes the partial aggregate group by the distinct columns, and a
    // typed-imperative sketch (HLL, percentile_approx) sharing that
    // Aggregate allocates its object buffer per partial group — 57 s
    // and an OOM shape instead of 2 s. Pin the split: every
    // ObjectHashAggregate in the plan must aggregate by l_returnflag
    // alone, never by the distinct columns or the Expand's gid.
    val p = plan("q32_sketch_profile")
    assert(p.contains("Expand"),
      "exact distinct rewrite vanished from q32:\n" + p)
    assert(p.contains("ObjectHashAggregate"),
      "sketch aggregates vanished from q32:\n" + p)
    val objBlocks = p.split("\n\n").flatMap(_.split("\n\\(")).filter(b =>
      b.contains("ObjectHashAggregate") && b.contains("Keys"))
    assert(objBlocks.nonEmpty, "no ObjectHashAggregate detail blocks:\n" + p)
    objBlocks.foreach { b =>
      val keysLine = b.linesIterator.find(_.trim.startsWith("Keys")).get
      assert(!keysLine.contains("l_orderkey") &&
        !keysLine.contains("l_partkey") && !keysLine.contains("gid"),
        "sketch aggregate fused with the distinct rewrite's keys:\n" + b)
    }
  }

  test("q56/q69: scale-safe forms plan no single-reducer stage") {
    val p56 = plan("q56_quality_deciles_scale")
    assert(!p56.contains("Exchange SinglePartition"),
      "q56 planned a single-reducer stage:\n" + p56)
    val p69 = plan("q69_source_cap")
    assert(!p69.contains("Exchange SinglePartition"),
      "q69 planned a single-reducer stage:\n" + p69)
    assert(!p69.contains("Window"),
      "q69 regressed from the TopK aggregate to a window:\n" + p69)
  }

  test("q88: might_contain prescreen sits map-side, before the join") {
    val p = plan("q88_bloom_decontaminate")
    assert(p.contains("might_contain"),
      "bloom prescreen missing from the plan:\n" + p)
    assert(p.contains("Join"), "no join in q88's plan:\n" + p)
    assert(!p.contains("CartesianProduct"), "cartesian product in q88")
  }
}
