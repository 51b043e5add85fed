package graft

import graft.ops.ConnectedComponents
import graft.queries.ClusterOps
import org.apache.spark.sql.functions._

/** Connected components (large-star/small-star): labels must equal a
  * driver-side union-find on the same edges, including the adversarial
  * shapes — long chains (worst case for naive min-propagation, which
  * needs O(diameter) rounds; the star alternation needs O(log n)) and
  * random graphs. The q58 clustering plan must stay free of cartesian
  * products.
  */
class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference labeling: classic union-find over collected edges. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n.toInt)(_.toLong)
    def find(x: Long): Long = {
      var r = x
      while (parent(r.toInt) != r) r = parent(r.toInt)
      var c = x
      while (parent(c.toInt) != r) { val nx = parent(c.toInt); parent(c.toInt) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb).toInt) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i.toLong)).toMap
  }

  private def check(n: Int, edges: Seq[(Long, Long)]): Unit = {
    val expected = unionFind(n, edges)
    // both implementations must agree with the reference: the driver
    // union-find fast path (default threshold) and the distributed
    // star loop (threshold 0 forces it)
    for (driverMax <- Seq(ConnectedComponents.DriverSolveMaxEdges, 0L)) {
      val got = ConnectedComponents.label(edges.toDF("a", "b"),
          driverMaxEdges = driverMax)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // label() emits only non-isolated, non-root nodes; roots and
      // singletons label themselves
      (0 until n).map(_.toLong).foreach { v =>
        assert(got.getOrElse(v, v) == expected(v),
          s"node $v (driverMaxEdges=$driverMax)")
      }
    }
  }

  test("chain graph contracts to one component (log-round worst case)") {
    check(64, (0L until 63L).map(i => (i, i + 1)))
  }

  test("two stars plus a bridge merge into one component") {
    val s1 = (1L to 10L).map(i => (0L, i))
    val s2 = (12L to 20L).map(i => (11L, i))
    check(21, s1 ++ s2 :+ (10L, 12L))
  }

  test("disjoint components keep distinct minimum labels") {
    check(12, Seq((0L, 1L), (1L, 2L), (4L, 5L), (7L, 8L), (8L, 9L), (9L, 7L)))
  }

  test("random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    check(n, edges)
  }

  test("duplicate and reversed edges are harmless") {
    check(6, Seq((0L, 1L), (1L, 0L), (0L, 1L), (3L, 2L), (2L, 3L)))
  }

  test("intermediate rounds release their checkpoint RDDs; release() frees the final") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // driverMaxEdges = 0 forces the distributed loop this test is about
    val labels = ConnectedComponents.label(
      (0L until 31L).map(i => (i, i + 1)).toDF("a", "b"), driverMaxEdges = 0L)
    labels.count()
    val afterRun = sc.getPersistentRDDs.keySet -- before
    // a 32-node chain needs several alternation rounds, but only the
    // final round's checkpoint may remain cached
    assert(afterRun.size == 1, s"leaked intermediate checkpoints: $afterRun")
    ConnectedComponents.release(labels)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("driver fast path pins no RDDs and release() is a harmless no-op") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val labels = ConnectedComponents.label(
      (0L until 31L).map(i => (i, i + 1)).toDF("a", "b"))
    assert(labels.count() == 31)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "small-graph solve must not leave pinned RDDs")
    ConnectedComponents.release(labels)
    assert(labels.count() == 31, "frame stays usable after release")
  }

  test("empty and all-self-loop edge sets converge to no labels") {
    for (driverMax <- Seq(ConnectedComponents.DriverSolveMaxEdges, 0L)) {
      val empty = Seq.empty[(Long, Long)].toDF("a", "b")
      assert(ConnectedComponents.label(empty, driverMaxEdges = driverMax).count() == 0)
      val selfLoops = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
      assert(ConnectedComponents.label(selfLoops, driverMaxEdges = driverMax).count() == 0)
    }
  }

  test("incremental mergeClusters equals batch re-clustering") {
    import graft.queries.TextOps
    val docs = Tables.documents(spark, sf)
    val oldDocs = docs.filter(col("doc_id") % 2 === 0)
    // batch truth over the full corpus
    val full = ClusterOps.dupClusters(spark, sf)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // stage 1: cluster only the even half
    val oldEdges = TextOps.neardupPairsOf(oldDocs)
      .filter(col("jaccard") >= ClusterOps.clusterJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val oldLabels = graft.ops.ConnectedComponents.label(oldEdges)
      .select(col("node").as("doc_id"), col("label").as("root"))
    val oldMembers = oldDocs.select(col("doc_id"))
      .join(oldLabels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
    // stage 2: the odd half arrives; new candidate pairs are exactly the
    // full-corpus pairs touching at least one new doc (what an LSH probe
    // of the new docs against the band index returns)
    val newEdges = TextOps.neardupPairsOf(docs)
      .filter(col("jaccard") >= ClusterOps.clusterJaccard)
      .filter(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val merged = ClusterOps.mergeClusters(oldMembers, docs.select(col("doc_id")), newEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == full)
    assert(merged.nonEmpty && merged.exists { case (d, c) => d != c })
  }

  test("touchedRelabel delta applied to old members equals full mergeClusters") {
    import graft.queries.TextOps
    val docs = Tables.documents(spark, sf)
    val oldDocs = docs.filter(col("doc_id") % 2 === 0)
    val full = ClusterOps.dupClusters(spark, sf)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oldEdges = TextOps.neardupPairsOf(oldDocs)
      .filter(col("jaccard") >= ClusterOps.clusterJaccard)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val oldLabels = graft.ops.ConnectedComponents.label(oldEdges)
      .select(col("node").as("doc_id"), col("label").as("root"))
    val oldMembers = oldDocs.select(col("doc_id"))
      .join(oldLabels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
    val newEdges = TextOps.neardupPairsOf(docs)
      .filter(col("jaccard") >= ClusterOps.clusterJaccard)
      .filter(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    // the delta form: only touched components are relabeled; applying the
    // delta over the old membership (delta wins per key, absent docs keep
    // their old row or default to singleton) must equal the batch truth
    val relabel = ClusterOps.touchedRelabel(oldMembers, newEdges)
    val applied = oldMembers.join(relabel, Seq("doc_id"), "left_anti")
      .unionByName(relabel)
    val got = docs.select(col("doc_id"))
      .join(applied, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == full)
    // delta rows are genuinely bounded: only touched docs appear
    val deltaIds = relabel.collect().map(_.getLong(0)).toSet
    val unchanged = full.filter { case (d, c) => d == c }.keySet
      .filter(d => !deltaIds.contains(d))
    assert(unchanged.nonEmpty, "expected some untouched singletons outside the delta")
  }

  test("q58 clusters: canonical docs are component minima; plan has no cartesian product") {
    val df = ClusterOps.dupClusters(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "q58 must stay equi-join based")
    val rows = df.collect()
    // every cluster_id is a member of its own cluster and is its minimum
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid)
      // cluster_size is consistent
      assert(members.forall(_.getLong(2) == members.length))
      // exactly one canonical member per cluster: the minimum
      assert(members.count(_.getBoolean(3)) == 1)
    }
  }
}
