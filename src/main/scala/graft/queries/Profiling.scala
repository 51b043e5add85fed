package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling, exact-moment statistics, sketches, and snapshot
  * diffing (CDC for the "updating datasets" theme).
  */
object Profiling {
  import Exact._

  /** Sketch-based profile under an oracle-checkable CONTRACT. The raw
    * HLL++ / approximate-quantile outputs have no portable oracle
    * (DuckDB's approx algorithms differ), so the query emits the
    * accuracy contract instead: each sketch value is compared against
    * its exact twin computed in the same aggregation, and the booleans
    * must all be true — which DuckDB can state literally, making the
    * query hash-comparable (the q57 recall-gate move). A sketch
    * implementation regression (or a tolerance violation at scale) flips
    * a boolean and fails the gate. Tolerances: HLL++ at default
    * rsd=0.05 → 10% (2σ); at rsd=0.01 → 3% (3σ); quantile sketches at
    * accuracy 10000 (rank error ≤ 0.01%) → median inside the exact IQR,
    * p25/p75 within 5% relative of their exact values.
    */
  def sketchProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // Exact percentile twins via the scale-safe per-value-count path
    // ([[exactPercentiles]]), NOT the built-in `percentile` aggregate:
    // that one buffers every (value, count) pair per group inside the
    // aggregation buffer AND rides the countDistinct Expand (x3 rows) —
    // measured 72 s at sf0.1 under a full-materialization action, OOM
    // fodder at scale. The exact twins are tiny per-group frames, so
    // they broadcast-join back onto the sketch aggregate.
    val exactPcts = exactPercentilesMulti(li, "l_returnflag", Seq(
      "l_quantity" -> Seq("eq25" -> 0.25, "eq75" -> 0.75),
      "l_extendedprice" -> Seq("ep25" -> 0.25, "ep75" -> 0.75)))
    // Each exact distinct count runs as its OWN single-distinct
    // aggregate — one countDistinct per Aggregate, never two. Two in
    // one Aggregate trigger Spark's multi-distinct rewrite: an Expand
    // (x3 rows) whose partial aggregate groups by (flag, orderkey,
    // partkey, gid) — ~|rows| partial groups whose spill behavior is
    // nondeterministic at scale (measured 20–108 s run-to-run spread at
    // 100x, BENCH_100X_r12). A single distinct plans as a plain
    // two-phase dedup (partial group by (flag, col), then count) with
    // NO Expand, and each pass prunes the parquet scan to its one
    // distinct column — the same per-column lesson as q65's profile.
    // The two 3-row results broadcast-join back together, and the
    // sketch functions stay in their own aggregate for the same reason
    // (an object-buffer aggregate sharing a distinct rewrite's
    // Aggregate allocates its buffer per partial group: 57 s fused vs
    // ~2 s split at sf0.1, OOM fodder at scale — BUILD_NOTES r11).
    def oneDistinct(c: String, as: String): DataFrame =
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col(c)).as(as))
    val exactDistinct = oneDistinct("l_orderkey", "eo")
      .join(broadcast(oneDistinct("l_partkey", "ep")), Seq("l_returnflag"))
    li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey")).as("ao"),
        approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("amq"),
        percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.75)), lit(10000)).as("apq"))
      // left joins: the exact twins cover every group by construction
      // (exactPercentilesMulti keeps all-NULL groups as carrier rows),
      // but an inner join would turn any future twin-side gap into a
      // silently dropped profile row instead of a visible NULL boolean.
      // The percentile twins attach NULL-SAFE (r19): a plain left join
      // infers `isnotnull(l_returnflag)` into its right side, which
      // lands in only ONE of the twins' two counts-frame branches (the
      // other sits behind the helper's null-safe internal join) — the
      // branches stop being canonically equal and the full
      // scan+stack+count pass runs twice instead of reusing one
      // exchange (plan-gated in PlanShapeSpec). l_returnflag is never
      // NULL in the data, and for a hypothetical NULL-keyed group the
      // null-safe attach is also the faithful one (groupBy keeps it).
      .join(broadcast(exactDistinct), Seq("l_returnflag"), "left")
      .join(broadcast(exactPcts.withColumnRenamed("l_returnflag", "__pctg")),
        col("l_returnflag") <=> col("__pctg"), "left")
      .drop("__pctg")
      .select(col("l_returnflag"),
        (abs(col("ao") - col("eo")) <= col("eo") * 0.10)
          .as("approx_orders_within_10pct"),
        (abs(col("ap") - col("ep")) <= col("ep") * 0.03)
          .as("approx_parts_within_3pct"),
        col("amq").between(col("eq25"), col("eq75"))
          .as("approx_median_qty_in_iqr"),
        (abs(col("apq").getItem(0) - col("ep25")) <= abs(col("ep25")) * 0.05)
          .as("approx_p25_price_within_5pct"),
        (abs(col("apq").getItem(1) - col("ep75")) <= abs(col("ep75")) * 0.05)
          .as("approx_p75_price_within_5pct"))
      .orderBy(col("l_returnflag"))
  }

  /** Scale-safe EXACT percentiles: per group, the same doubles as
    * Spark's `percentile` aggregate, without its aggregation buffer
    * that holds every distinct (value, count) pair of the group in
    * executor memory (and serializes it through the shuffle). The
    * decomposition is q56's decile machinery re-used for arbitrary
    * percentiles:
    *
    *  1. per-(group, value) counts — the only full-data pass, narrow
    *     rows, map-side combinable, output ∝ distinct values;
    *  2. a TWO-LEVEL prefix sum over the counts: cumulative within
    *     1024-wide value-range blocks (window partitioned by
    *     (group, block)) plus ONE linear window over the tiny per-block
    *     totals, partitioned by (group, kind) ordered by blk — no
    *     unpartitioned window anywhere, and no O(blocks²) pair work
    *     (an earlier form used a `bblk < blk` theta-join here);
    *  3. closed-form selection: the element at 0-based index k is the
    *     value whose cumulative range [cum_before, cum_before+cnt)
    *     covers k; each percentile needs the two indices
    *     floor(p·(n−1)) and ceil(p·(n−1)), picked with a conditional
    *     max in ONE per-group aggregate, then interpolated with
    *     Percentile.getPercentile's exact IEEE expression
    *     `(hi−pos)·lower + (pos−lo)·higher`.
    *
    * NULL and NaN semantics match the built-in: NULL measure values are
    * ignored (they ride through as zero-count carrier rows, so a group
    * whose values are ALL NULL still emits its row, with NULL
    * percentiles — never silently dropped), and NaN sorts GREATEST
    * (routed to a top sentinel block, the same rank the built-in's
    * comparator assigns). −0.0 is DELIBERATELY normalized to 0.0 on the
    * measure (`vd + 0.0` in the unpivot): Spark's float-key grouping
    * would collapse the two anyway, but implicitly — the explicit add
    * makes the behavior independent of Catalyst's NormalizeFloatingNumbers
    * internals. Documented, spec-pinned divergence from the built-in:
    * its counts map keeps −0.0 distinct, so p0 of {−0.0, 1.0} is −0.0
    * there and 0.0 here (ExactPercentileSpec). Suited to
    * discrete-valued measures (2-decimal money, integer counts) where
    * distinct values are bounded. For truly continuous doubles use
    * percentile_approx, the same guidance Spark's own docs give for
    * `percentile` — and the block-prefix build ENFORCES the domain: a
    * (group, measure) spanning more than [[pctMaxBlocksPerGroup]]
    * value blocks fails loudly (naming percentile_approx) instead of
    * bloating the broadcast block-prefix frame toward a driver OOM.
    */
  private val pctBlockWidth = 1024.0

  /** Loud domain guard for the exact-percentile machinery: the
    * per-block prefix frame `bp` is broadcast, so its size must stay
    * bounded. Blocks per (group, measure) ∝ min(distinct values,
    * value range / 1024) — tiny for the discrete measures this path
    * documents, unbounded for continuous wide-range doubles. 65536
    * blocks/group caps the broadcast at a few MB per group while
    * leaving ~67M of contiguous value range (or 64k distinct values
    * spread arbitrarily) of headroom. Exceeding it throws with a
    * message naming percentile_approx, during the broadcast-side
    * computation — an error message instead of a driver OOM.
    */
  private[graft] val pctMaxBlocksPerGroup = 65536L

  private[graft] def exactPercentiles(base: DataFrame, g: String,
      v: String, ps: Seq[(String, Double)]): DataFrame =
    exactPercentilesMulti(base, g, Seq(v -> ps))

  /** Multi-measure form of [[exactPercentiles]]: profiles SEVERAL value
    * columns' percentiles in ONE table scan. The measures unpivot via
    * `stack` into (group, kind, value) rows, the identical per-value-
    * count + two-level prefix-sum machinery runs keyed by
    * (group, kind), and a final per-group aggregate folds every
    * measure's bounding elements back into one row — so q32/q35 scan
    * lineitem once for quantity AND price instead of once per measure
    * (at 100 TB: one pass over the fact table, not |measures| passes).
    */
  private[graft] def exactPercentilesMulti(base: DataFrame, g: String,
      specs: Seq[(String, Seq[(String, Double)])]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `+ 0.0d` normalizes −0.0 to 0.0 (identity on every other double,
    // incl. NaN/±Inf; NULL stays NULL) — see the −0.0 paragraph above
    val stackExpr = "stack(" + specs.size + ", " +
      specs.map { case (c, _) => s"'$c', cast(`$c` as double) + 0.0d" }
        .mkString(", ") + ") as (kind, vd)"
    // cnt = count(vd): a NULL value contributes 0, so its row is a pure
    // group-existence carrier — the group survives to the output (with
    // NULL percentiles) even when every value is NULL, matching the
    // built-in. The carrier's blk gets a sentinel below every real
    // block (an equi-join key must be non-NULL to survive the join).
    // blk sentinels: NULL carriers to the bottom block (cnt = 0, never
    // selected), NaN to the TOP block — Spark's sort ordering and the
    // built-in `percentile`'s comparator both place NaN above every
    // finite double, so ranks land identically (all NaNs collapse to
    // one group row: float grouping keys are NaN-normalized). Finite
    // values can't collide with the NaN sentinel in a way that breaks
    // ordering: a ±huge double saturates the long cast at MinValue/
    // MaxValue, and within a shared block the window still orders by
    // vd (NaN last).
    // blk wrapped in coalesce(..., 0): the when-chain is exhaustive, so
    // the default never fires — it exists to make blk NON-NULLABLE. The
    // equi-join below otherwise infers `isnotnull(blk)` into only the
    // probe branch's scan filter, the two vc subtrees stop being
    // canonically equal, and ReuseExchange never fires — the r18 plans
    // show the whole scan+stack+partial-count pass duplicated for
    // exactly this reason. With blk provably non-null both consumers
    // share one Exchange (plan-gated in PlanShapeSpec).
    val vc = base.selectExpr(s"`$g`", stackExpr)
      .groupBy(col(g), col("kind"), col("vd"))
      .agg(count(col("vd")).as("cnt"))
      .withColumn("blk", coalesce(
        when(col("vd").isNull, lit(Long.MinValue))
          .when(isnan(col("vd")), lit(Long.MaxValue))
          .otherwise(floor(col("vd") / lit(pctBlockWidth)).cast("long")),
        lit(0L)))
    // per-(group, kind) block prefix: one linear windowed pass over the
    // tiny per-block totals (rows ∝ blocks), partitioned on the group
    // keys so it stays distributed
    val wBlk = Window.partitionBy(col(g), col("kind")).orderBy(col("blk"))
    // Domain guard folded INTO blk_before (a dropped/unused guard
    // column would be pruned by Catalyst and never evaluate): on
    // success assert_true is NULL → coalesce adds 0; over the
    // threshold it throws the percentile_approx redirect while the
    // broadcast side is still COMPUTING its rows — the driver never
    // accumulates an unbounded block-prefix frame.
    val guard = coalesce(assert_true(
      count(lit(1)).over(wBlk.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
        <= lit(pctMaxBlocksPerGroup),
      lit(s"exactPercentiles: a (group, measure) spans more than " +
        s"$pctMaxBlocksPerGroup value blocks — the measure looks " +
        "continuous/wide-range, outside this exact path's discrete-" +
        "measure domain; use percentile_approx instead"))
      .cast("long"), lit(0L))
    val blkPre = vc.groupBy(col(g), col("kind"), col("blk"))
      .agg(sum(col("cnt")).as("bcnt"))
      .withColumn("blk_before", coalesce(sum(col("bcnt")).over(
        wBlk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + guard)
      .withColumn("n_g", sum(col("bcnt")).over(
        wBlk.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // rank uses the row's own kind's n_g, and the kind guard on the
    // conditional max keeps measures from contaminating each other
    def rank(n: Column, p: Double): Column = lit(p) * (n - 1).cast("double")
    // k-TARGETED selection (r18 verdict item 1): a block can contribute
    // to the output only if it covers one of the percentile indices
    // floor(p·(n−1)) / ceil(p·(n−1)) — at most 2·|percentiles| blocks
    // per (group, measure) — or if it is the carrier block of an
    // all-NULL group (n_g = 0, kept so the group's row survives to the
    // output with NULL percentiles, matching the built-in). Every other
    // block's rows can never satisfy the selection predicate in the
    // final aggregate, so the broadcast keeps only the relevant blocks
    // and the join FILTERS the counts frame BEFORE the in-block
    // cumulation window and the conditional-max aggregate. In r18 both
    // ran over every distinct value (~600k rows at sf0.1); now they run
    // over the few target blocks' values.
    def covers(k: Column): Column =
      col("blk_before") <= k && k < col("blk_before") + col("bcnt")
    val relevant = specs.map { case (c, ps) =>
      col("kind") === c && ps.map { case (_, p) =>
        val r = rank(col("n_g"), p)
        covers(floor(r).cast("long")) || covers(ceil(r).cast("long"))
      }.reduce(_ || _)
    }.reduce(_ || _) || col("n_g") === 0L
    // NULL-SAFE on the group key: groupBy keeps a NULL-keyed group (so
    // does the built-in), but a plain equi-join would silently drop it
    // here — <=> keeps rank bookkeeping attached to the null group
    val bp = blkPre.filter(relevant)
      .select(col(g).as("__bg"), col("kind").as("__bkind"),
        col("blk").as("__bblk"), col("blk_before"), col("n_g"))
    // Join FIRST, cumulate AFTER: the join key is block-level, so a
    // surviving block keeps ALL its value rows — the running sum over
    // the post-join rows equals the pre-join value for every survivor,
    // and the window's sort now runs over target-block rows only.
    val wFine = Window.partitionBy(col(g), col("kind"), col("blk"))
      .orderBy(col("vd"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vc.join(broadcast(bp),
        col(g) <=> col("__bg") && col("kind") === col("__bkind") &&
          col("blk") === col("__bblk"))
      .drop("__bg", "__bkind", "__bblk")
      .withColumn("cum_in_blk", sum(col("cnt")).over(wFine))
      .withColumn("cum_before",
        col("blk_before") + col("cum_in_blk") - col("cnt"))
    val picks = specs.flatMap { case (c, ps) =>
      ps.flatMap { case (nm, p) =>
        val k1 = floor(rank(col("n_g"), p)).cast("long")
        val k2 = ceil(rank(col("n_g"), p)).cast("long")
        def at(k: Column): Column = max(when(
          col("kind") === c &&
            col("cum_before") <= k && k < col("cum_before") + col("cnt"),
          col("vd")))
        Seq(at(k1).as(s"__${nm}_lo"), at(k2).as(s"__${nm}_hi"))
      } :+ max(when(col("kind") === c, col("n_g"))).as(s"__n_$c")
    }
    val agged = cum.groupBy(col(g)).agg(picks.head, picks.tail: _*)
    val outs = specs.flatMap { case (c, ps) =>
      ps.map { case (nm, p) =>
        val pos = rank(col(s"__n_$c"), p)
        val lo = floor(pos)
        val hi = ceil(pos)
        when(hi === lo, col(s"__${nm}_lo"))
          .otherwise((hi - pos) * col(s"__${nm}_lo") +
            (pos - lo) * col(s"__${nm}_hi"))
          .as(nm)
      }
    }
    agged.select(col(g) +: outs: _*)
  }

  val sketchProfileSql: String =
    """SELECT l_returnflag,
      |  TRUE AS approx_orders_within_10pct,
      |  TRUE AS approx_parts_within_3pct,
      |  TRUE AS approx_median_qty_in_iqr,
      |  TRUE AS approx_p25_price_within_5pct,
      |  TRUE AS approx_p75_price_within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact second moments: variance, stddev, and correlation computed
    * from decimal sums (order-independent), combined in double with the
    * identical IEEE expression on both engines. Built-in var_samp/corr
    * use streaming partial aggregation whose fp order varies run to run —
    * this formulation is the deterministic equivalent.
    */
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // decimal -> string -> double: both engines parse strings with
    // correctly-rounded strtod, whereas native decimal->double casts can
    // disagree by 1 ulp once sums exceed ~2^53 (seen at 10x scale)
    def d(c: Column): Column = c.cast("string").cast("double")
    val g = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(dec2(col("l_quantity"))).as("sx"),
      sum(dec2(col("l_quantity")) * dec2(col("l_quantity"))).as("sxx"),
      sum(dec2(col("l_extendedprice"))).as("sy"),
      sum(dec2(col("l_extendedprice")) * dec2(col("l_extendedprice"))).as("syy"),
      sum(dec2(col("l_quantity")) * dec2(col("l_extendedprice"))).as("sxy"))
    val n = d(col("n"))
    val vx = (n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) / (n * (n - 1))
    val vy = (n * d(col("syy")) - d(col("sy")) * d(col("sy"))) / (n * (n - 1))
    val cov = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / (n * (n - 1))
    val corr = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
      (sqrt(n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
        sqrt(n * d(col("syy")) - d(col("sy")) * d(col("sy"))))
    g.select(col("l_returnflag"), col("n"),
      vx.as("var_qty"), sqrt(vx).as("stddev_qty"),
      vy.as("var_price"), cov.as("cov_qty_price"), corr.as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  val statsMomentsSql: String = {
    val sx = "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
    val sxx = "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
    val sy = "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
    val syy = "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
    val sxy = "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
    s"""WITH g AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    $sx AS sx, $sxx AS sxx, $sy AS sy, $syy AS syy, $sxy AS sxy
       |  FROM lineitem GROUP BY l_returnflag
       |)
       |SELECT l_returnflag, n,
       |  (CAST(n AS DOUBLE)*sxx - sx*sx) / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1)) AS var_qty,
       |  sqrt((CAST(n AS DOUBLE)*sxx - sx*sx) / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1))) AS stddev_qty,
       |  (CAST(n AS DOUBLE)*syy - sy*sy) / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1)) AS var_price,
       |  (CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)-1)) AS cov_qty_price,
       |  (CAST(n AS DOUBLE)*sxy - sx*sy) /
       |    (sqrt(CAST(n AS DOUBLE)*sxx - sx*sx) * sqrt(CAST(n AS DOUBLE)*syy - sy*sy)) AS corr_qty_price
       |FROM g ORDER BY l_returnflag""".stripMargin
  }

  /** Snapshot diff (CDC): added / removed / changed rows between two
    * dataset versions, via full-outer join on the key. The core primitive
    * for incrementally maintaining a 100 TB dataset: downstream consumers
    * get a delta stream instead of re-reading the snapshot.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val v1 = o.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey").as("key"), dec2(col("o_totalprice")).as("old_price"))
    val v2 = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("key"),
        when(col("o_orderkey") % 3 === 0, dec2(col("o_totalprice")) + lit(10).cast("decimal(18,2)"))
          .otherwise(dec2(col("o_totalprice"))).as("new_price"))
    v1.join(v2, Seq("key"), "full_outer")
      .withColumn("change_type",
        when(col("old_price").isNull, "added")
          .when(col("new_price").isNull, "removed")
          .when(col("old_price") =!= col("new_price"), "changed")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select(col("key"), col("change_type"),
        col("old_price").cast("double").as("old_price"),
        col("new_price").cast("double").as("new_price"))
      .orderBy(col("key"))
  }

  val snapshotDiffSql: String =
    """WITH v1 AS (
      |  SELECT o_orderkey AS key, CAST(o_totalprice AS DECIMAL(18,2)) AS old_price
      |  FROM orders WHERE o_orderkey % 5 <> 0
      |), v2 AS (
      |  SELECT o_orderkey AS key,
      |    CASE WHEN o_orderkey % 3 = 0
      |         THEN CAST(o_totalprice AS DECIMAL(18,2)) + CAST(10 AS DECIMAL(18,2))
      |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS new_price
      |  FROM orders WHERE o_orderkey % 7 <> 0
      |), d AS (
      |  SELECT coalesce(v1.key, v2.key) AS key, old_price, new_price,
      |    CASE WHEN old_price IS NULL THEN 'added'
      |         WHEN new_price IS NULL THEN 'removed'
      |         WHEN old_price <> new_price THEN 'changed'
      |         ELSE 'unchanged' END AS change_type
      |  FROM v1 FULL OUTER JOIN v2 ON v1.key = v2.key
      |)
      |SELECT key, change_type, CAST(old_price AS DOUBLE) AS old_price,
      |       CAST(new_price AS DOUBLE) AS new_price
      |FROM d WHERE change_type <> 'unchanged'
      |ORDER BY key""".stripMargin

  /** Exact interpolated quantiles (sort-based `percentile`) — both
    * engines use pos = p*(n-1) linear interpolation on the same doubles.
    */
  /** q35: EXACT group percentiles through [[exactPercentiles]] — the
    * built-in `percentile` aggregate's results without its
    * whole-group-in-the-buffer memory shape (see the helper's doc).
    * The oracle is DuckDB's `quantile_cont`, which interpolates with
    * the same IEEE expression, so the row hash pins the arithmetic. */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    exactPercentilesMulti(Tables.lineitem(spark, dir), "l_returnflag", Seq(
        "l_quantity" -> Seq("median_qty" -> 0.5),
        "l_extendedprice" -> Seq("p25_price" -> 0.25, "p75_price" -> 0.75)))
      .orderBy(col("l_returnflag"))

  val quantilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
      |  quantile_cont(l_extendedprice, 0.75) AS p75_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------- column profiling
  /** Whole-table column profile (q65): per column, row/null/distinct
    * counts and min/max rendered to strings — the data-quality snapshot a
    * pipeline records per dataset version (the ANALYZE/profile surface).
    * One pass over the table: a single wide aggregation computes all
    * columns' stats (the multi-distinct plan expands rows ×columns —
    * Spark's standard exact form; at 100 TB swap the distinct counts for
    * approx_count_distinct and the plan collapses to one partial agg),
    * then one row explodes to a (column, stats) long format. Min/max
    * rendering pins engine-portable forms: decimals via DECIMAL(18,2),
    * timestamps via an explicit shared pattern.
    */
  private val profileCols: Seq[(String, String)] = Seq(
    // (column, render kind)
    "o_orderkey" -> "plain",
    "o_custkey" -> "plain",
    "o_orderstatus" -> "plain",
    "o_totalprice" -> "dec2",
    "o_orderdate" -> "ts",
    "o_orderpriority" -> "plain")

  private def renderCol(kind: String)(c: Column): Column = kind match {
    case "dec2" => c.cast("decimal(18,2)").cast("string")
    case "ts" => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _ => c.cast("string")
  }

  private def renderSql(kind: String)(e: String): String = kind match {
    case "dec2" => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"
    case "ts" => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
    case _ => s"CAST($e AS VARCHAR)"
  }

  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    // One aggregate PER COLUMN, unioned (6 one-row frames), not one
    // wide multi-distinct aggregate: the fused form's distinct rewrite
    // expands rows ×(columns+1) and its every pass reads every
    // profiled column, while each per-column pass here prunes the
    // parquet scan to that single column and plans a plain two-phase
    // distinct — 3.9 s → 1.2 s at sf0.1, and at 100 TB it is the
    // difference between scanning the table (columns+1) times and
    // scanning each column once. Same q32 lesson, milder symptom
    // (min/max/count are codegen'd, so the fused form only wastes
    // I/O + Expand rows, it doesn't OOM).
    val per = profileCols.map { case (c, kind) =>
      Tables.orders(spark, dir)
        .agg(count(lit(1)).as("n"),
          count(col(c)).as("nn"),
          countDistinct(col(c)).as("nd"),
          renderCol(kind)(min(col(c))).as("mn"),
          renderCol(kind)(max(col(c))).as("mx"))
        .select(lit(c).as("col_name"), col("n").as("n_rows"),
          (col("n") - col("nn")).as("n_null"),
          col("nd").as("n_distinct"),
          col("mn").as("min_value"), col("mx").as("max_value"))
    }
    per.reduce(_.unionByName(_)).orderBy(col("col_name"))
  }

  val columnProfileSql: String =
    profileCols.map { case (c, kind) =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS n_distinct,
         |  ${renderSql(kind)(s"MIN($c)")} AS min_value,
         |  ${renderSql(kind)(s"MAX($c)")} AS max_value
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  // -------------------------------------------------------- histogram
  /** Equi-width histogram (q66): 20 bins over o_totalprice — the
    * distribution sketch a profiling pass attaches to every numeric
    * column. Two passes: one tiny min/max aggregate broadcast to a
    * map-side binning scan + one narrow groupBy — never a sort. The bin
    * arithmetic is a single shared double expression ((x−min)/width,
    * floored, clamped), so bin assignment is bit-identical on both
    * engines; empty bins simply don't appear.
    */
  val histBins = 20

  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val mm = o.agg(min(col("o_totalprice")).as("mn"),
      max(col("o_totalprice")).as("mx"))
    o.select(col("o_totalprice")).crossJoin(broadcast(mm))
      .withColumn("width", (col("mx") - col("mn")) / lit(histBins.toDouble))
      // degenerate single-value column: width 0 would make the bin
      // expression NaN (an error under ANSI int cast) — everything lands
      // in bin 0 instead, same rule as the oracle
      .withColumn("bin", when(col("width") === 0.0, lit(0)).otherwise(least(
        floor((col("o_totalprice") - col("mn")) / col("width")).cast("int"),
        lit(histBins - 1))))
      .withColumn("lo", col("mn") + col("bin") * col("width"))
      .withColumn("hi", col("mn") + (col("bin") + 1) * col("width"))
      .groupBy(col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("bin"))
  }

  val histogramSql: String =
    s"""WITH mm AS (
       |  SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
       |), b AS (
       |  SELECT CASE WHEN mx = mn THEN 0
       |         ELSE least(CAST(floor((o_totalprice - mn) / ((mx - mn) / $histBins.0)) AS INT),
       |                    ${histBins - 1}) END AS bin,
       |         mn, (mx - mn) / $histBins.0 AS width
       |  FROM orders, mm
       |)
       |SELECT bin, mn + bin * width AS lo, mn + (bin + 1) * width AS hi,
       |  COUNT(*) AS n_rows
       |FROM b GROUP BY bin, lo, hi
       |ORDER BY bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_column_profile" -> (columnProfile _),
    "q66_histogram" -> (histogram _),
    "q32_sketch_profile" -> (sketchProfile _),
    "q33_stats_moments" -> (statsMoments _),
    "q34_snapshot_diff" -> (snapshotDiff _),
    "q35_quantiles" -> (quantiles _))

  val oracle: Map[String, String] = Map(
    "q65_column_profile" -> columnProfileSql,
    "q66_histogram" -> histogramSql,
    "q32_sketch_profile" -> sketchProfileSql,
    "q33_stats_moments" -> statsMomentsSql,
    "q34_snapshot_diff" -> snapshotDiffSql,
    "q35_quantiles" -> quantilesSql)
}
