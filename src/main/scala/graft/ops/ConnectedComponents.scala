package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14
  * — the published shuffle-native CC algorithm). Converges in O(log n)
  * rounds; every round is two keyed aggregations + joins, no driver-side
  * graph state, so the same code runs a 100 TB edge set on a real cluster.
  *
  * Edges are kept oriented child→parent (`u` > `p`) throughout:
  *  - large-star(u): every strictly-larger neighbor of u re-attaches to
  *    m(u) = min(N(u) ∪ {u}) — halves tall trees;
  *  - small-star(u): u and all its (smaller) parents re-attach to
  *    m(u) = min parent — flattens local stars.
  * The fixpoint is a star forest: one edge (node, component-min) per
  * non-root node.
  *
  * Per-round materialization uses localCheckpoint (lineage would otherwise
  * double every round and overwhelm the planner); on a multi-node cluster
  * swap in `sc.setCheckpointDir` + `checkpoint()` for executor-loss safety
  * — the algorithm is unchanged. Convergence is detected with an
  * order-independent (count, hash-sum) checksum — two scalar aggregates per
  * round, never a collect of edge data.
  */
object ConnectedComponents {

  /** Label each node reachable through `edges` (columns `a`, `b`) with its
    * component's minimum node id. Returns (`node`, `label`) for every
    * non-isolated, non-minimum node; callers restore isolated nodes with a
    * left join + coalesce(label, own id). Ids must be orderable (long).
    *
    * Memory: each round's edge set is an eager localCheckpoint (lineage
    * would double per round otherwise); every intermediate round's backing
    * RDD is released as soon as the next round materializes — Dataset
    * .unpersist would be a no-op here because checkpoint caching is
    * RDD-level, so the release goes through the LogicalRDD handle. Only
    * the FINAL round's RDD stays cached: it backs the returned labels
    * (its lineage is truncated, so releasing it would invalidate them);
    * callers that are done with a labeling can free it eagerly with
    * [[release]]. On a multi-node cluster swap localCheckpoint for
    * `sc.setCheckpointDir` + `checkpoint()` — same structure, plus
    * executor-loss safety.
    */
  /** Graphs at or below this many (distinct, canonicalized) edges skip
    * the distributed star loop and solve with a driver-side union-find.
    * The loop's fixed cost is ~6 shuffles per round times O(log n)
    * rounds REGARDLESS of data size, so a small graph pays seconds of
    * scheduling for microseconds of work; below this threshold one
    * bounded collect (≤ 100k edges ≈ 1.6 MB — metadata-scale by
    * construction, same contract as MergeTable's bucket-id collect) plus
    * an in-memory union-find is orders of magnitude cheaper. The
    * streaming clustering sink's per-batch touched subgraphs are exactly
    * this shape; corpus-scale edge sets stay on the distributed path.
    */
  val DriverSolveMaxEdges = 100000L

  def label(edges: DataFrame, maxIter: Int = 50,
      driverMaxEdges: Long = DriverSolveMaxEdges): DataFrame = {
    // canonicalize ids to long up front so BOTH solve paths emit one
    // schema — node/label LongType regardless of graph size (the driver
    // union-find always produced long; the distributed loop used to
    // preserve the input type, making the output schema size-dependent)
    var e = edges
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).cast("long").as("u"),
        least(col("a"), col("b")).cast("long").as("p"))
      .distinct()
      .localCheckpoint(true)
    var prev = checksum(e)
    if (prev._1 <= driverMaxEdges) {
      val out = driverSolve(edges.sparkSession, e)
      release(e)
      return out
    }
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val c = checksum(next)
      // one alternation round is the paper's unit of progress; comparing
      // round-to-round is sound because the fixpoint is invariant under
      // BOTH stars, so an unchanged checksum means a true fixpoint
      converged = c == prev
      prev = c
      val old = e
      e = next
      release(old)
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    e.select(col("u").as("node"), col("p").as("label"))
  }

  /** Small-graph solve: collect the (bounded) canonical edge set, run
    * path-compressing union-find on the driver, emit the same
    * (node, label) contract as the distributed loop — non-isolated,
    * non-minimum nodes only. Output is a LocalRelation (no pinned RDD,
    * so [[release]] is a harmless no-op on it).
    */
  private def driverSolve(spark: SparkSession, canonEdges: DataFrame): DataFrame = {
    import spark.implicits._
    val es = canonEdges.select(col("u").cast("long"), col("p").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    es.foreach { case (u, p) =>
      val (ru, rp) = (find(u), find(p))
      if (ru != rp) parent(math.max(ru, rp)) = math.min(ru, rp)
    }
    val nodes = es.iterator.flatMap { case (u, p) => Iterator(u, p) }.toSet
    val out = nodes.iterator.map(n => (n, find(n)))
      .filter { case (n, l) => n != l }.toSeq.sorted
    out.toDF("node", "label")
  }

  /** Free the checkpointed RDD backing a frame returned by (or fed
    * through) [[label]]. The frame is unusable afterwards — its lineage
    * was truncated at checkpoint time. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Attach every strictly-larger neighbor v of each node u to
    * m(u) = min(N(u) ∪ {u}). Output stays child→parent oriented because
    * m(u) <= u < v. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("p").as("v"))
      .union(e.select(col("p").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.join(m, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("p"))
      .filter(col("u") =!= col("p"))
      .distinct()
  }

  /** Attach each node u and all its parents to its minimum parent. Input
    * and output are child→parent oriented (p < u). */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("u").agg(min(col("p")).as("m"))
    e.join(m, Seq("u"))
      .select(col("p").as("u"), col("m").as("p"))
      .union(m.select(col("u"), col("m").as("p")))
      .filter(col("u") =!= col("p"))
      .distinct()
  }

  /** Order-independent edge-set fingerprint: (row count, xor of per-edge
    * hashes — xor can't overflow under ANSI mode, unlike sum). Two scalar
    * aggregates — O(1) driver data. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, p))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
