package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational surface: scan → filter/project (pushed down), hash
  * aggregate with map-side partial, broadcast + shuffle joins, window
  * top-k, and the reference's signature union-by-name upsert
  * (reference: scripts/spark_merge_dfs.py:82-83).
  *
  * Scale notes (100 TB): every query here shuffles at most once on its
  * natural key; dimension joins are explicit `broadcast()`; filters and
  * projections sit directly on the parquet scan so the source reads only
  * the referenced columns and row groups.
  */
object Relational {
  import Exact._

  /** TPC-H Q1-shaped pricing summary. One shuffle (group keys), partial
    * aggregation map-side; decimal sums are exact and order-independent.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= to_timestamp(lit("2000-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumD(col("l_quantity")).as("sum_qty"),
        sumD(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sumDSql("l_quantity")} AS sum_qty,
       |  ${sumDSql("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       |  COUNT(*) AS count_order,
       |  COUNT(DISTINCT l_orderkey) AS n_orders
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection that must reach the parquet scan (PushedFilters +
    * pruned ReadSchema) — the scan reads 4 of 11 columns and skips row
    * groups by the quantity predicate's min/max stats.
    */
  def filterPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 49.0 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val filterPushdownSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity >= 49.0 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Star-schema rollup: orders ⋈ customer (shuffle on custkey) with
    * nation and region broadcast — no shuffle for the dimension side.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sumD(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val revenueByNationSql: String =
    s"""SELECT r_name, n_name,
       |  ${sumDSql("o_totalprice")} AS revenue,
       |  COUNT(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** Top-10 customers by lifetime order value; deterministic tie-break on
    * the unique key so the boundary is stable across engines.
    */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.groupBy(col("o_custkey"))
      .agg(sumD(col("o_totalprice")).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .join(c, col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spent"), col("n_orders"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(10)
  }

  val topCustomersSql: String =
    s"""SELECT c_custkey, c_name, total_spent, n_orders FROM (
       |  SELECT o_custkey, ${sumDSql("o_totalprice")} AS total_spent,
       |         COUNT(*) AS n_orders
       |  FROM orders GROUP BY o_custkey
       |) JOIN customer ON o_custkey = c_custkey
       |ORDER BY total_spent DESC, c_custkey
       |LIMIT 10""".stripMargin

  /** The reference's signature operator, made deterministic: season ∪ delta
    * by name (missing columns null-filled), then one row per key with the
    * delta winning (reference keeps an arbitrary row —
    * scripts/spark_merge_dfs.py:82-83; here a priority window makes the
    * upsert reproducible). Single shuffle on the dedup key.
    */
  def upsertOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // season: the standing dataset; delta: re-scraped rows with a column the
    // season lacks (exercises allowMissingColumns null-fill) and an updated
    // priority marker.
    val season = o.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .withColumn("src", lit(1))
    val delta = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        lit("U").as("o_orderstatus"), col("o_totalprice"),
        lit("0-DELTA").as("o_orderpriority"), lit("fresh").as("batch_tag"))
      .withColumn("src", lit(0))
    val unioned = season.unionByName(delta, allowMissingColumns = true)
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("src"))
    unioned.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "src")
      .orderBy(col("o_orderkey"))
  }

  val upsertOrdersSql: String =
    """WITH season AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |         o_orderpriority, CAST(NULL AS VARCHAR) AS batch_tag, 1 AS src
      |  FROM orders WHERE o_orderkey % 3 <> 0
      |), delta AS (
      |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice,
      |         '0-DELTA' AS o_orderpriority, 'fresh' AS batch_tag, 0 AS src
      |  FROM orders WHERE o_orderkey % 2 = 0
      |), unioned AS (
      |  SELECT * FROM season UNION ALL SELECT * FROM delta
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY src) AS rn
      |  FROM unioned
      |)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |       o_orderpriority, batch_tag
      |FROM ranked WHERE rn = 1
      |ORDER BY o_orderkey""".stripMargin

  /** q82: the REAL [[graft.merge.Merge.mergeDeterministic]] API under the
    * oracle gate — q05 states the same priority-window shape inline, but
    * this row executes the library entry point itself, including its
    * full within-source tie-break (duplicate keys INSIDE the delta are
    * resolved by the remaining orderable columns in lexicographic column
    * order, so the winner never depends on shuffle order). The delta
    * deliberately carries two conflicting rows per even key ('0-DELTA'
    * beats '1-DELTA' on the o_orderpriority tie-break) plus a column the
    * season lacks (allowMissingColumns null-fill).
    */
  def mergeDeterministicOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val season = o.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
    def deltaVariant(status: String, prio: String) =
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          lit(status).as("o_orderstatus"), col("o_totalprice"),
          lit(prio).as("o_orderpriority"), lit("fresh").as("batch_tag"))
    val delta = deltaVariant("U", "0-DELTA")
      .unionByName(deltaVariant("V", "1-DELTA"))
    graft.merge.Merge.mergeDeterministic(season, delta, Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** Mirrors mergeDeterministic's window exactly: priority (src) first,
    * then the non-key orderable columns sorted BY NAME (batch_tag,
    * o_custkey, o_orderpriority, o_orderstatus, o_totalprice). NULLS
    * FIRST matches Spark's ascending default (DuckDB defaults to last).
    */
  val mergeDeterministicOrdersSql: String =
    """WITH season AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |         o_orderpriority, CAST(NULL AS VARCHAR) AS batch_tag, 1 AS src
      |  FROM orders WHERE o_orderkey % 3 <> 0
      |), delta AS (
      |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus, o_totalprice,
      |         '0-DELTA' AS o_orderpriority, 'fresh' AS batch_tag, 0 AS src
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 'V', o_totalprice,
      |         '1-DELTA', 'fresh', 0
      |  FROM orders WHERE o_orderkey % 2 = 0
      |), unioned AS (
      |  SELECT * FROM season UNION ALL SELECT * FROM delta
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |    ORDER BY src, batch_tag NULLS FIRST, o_custkey, o_orderpriority,
      |             o_orderstatus, o_totalprice) AS rn
      |  FROM unioned
      |)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |       o_orderpriority, batch_tag
      |FROM ranked WHERE rn = 1
      |ORDER BY o_orderkey""".stripMargin

  /** unionByName with allowMissingColumns over schema-drifted inputs
    * (reference: scripts/spark_merge_dfs.py:83) — null-fill semantics.
    */
  def unionByNameDrift(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("entity_id"), col("c_acctbal").as("cust_bal"))
    val s = Tables.supplier(spark, dir)
      .select((col("s_suppkey") + 1000000L).as("entity_id"),
        col("s_acctbal").as("supp_bal"))
    c.unionByName(s, allowMissingColumns = true)
      .orderBy(col("entity_id"))
  }

  val unionByNameDriftSql: String =
    """SELECT c_custkey AS entity_id, c_acctbal AS cust_bal,
      |       CAST(NULL AS DOUBLE) AS supp_bal
      |FROM customer
      |UNION ALL
      |SELECT s_suppkey + 1000000 AS entity_id, CAST(NULL AS DOUBLE),
      |       s_acctbal
      |FROM supplier
      |ORDER BY entity_id""".stripMargin

  /** Regional supply-chain revenue (q67, TPC-H Q5 shape): the 6-table
    * join-reorder stress — lineitem ⋈ orders ⋈ customer shuffle on their
    * keys while supplier/nation/region broadcast, the co-nation predicate
    * (customer and supplier in the same nation) rides the supplier join,
    * and the region filter + date range prune before any wide join.
    * Revenue = Σ extendedprice·(1−discount) in exact decimal. This is the
    * query Catalyst's join reordering, broadcast election, and pushdown
    * have to get right together; at 100 TB the only wide exchanges are
    * the two fact-key shuffles.
    */
  def regionalSupply(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).filter(
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val regionalSupplySql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_regional_supply" -> (regionalSupply _),
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_filter_pushdown" -> (filterPushdown _),
    "q03_revenue_by_nation" -> (revenueByNation _),
    "q04_top_customers" -> (topCustomers _),
    "q05_upsert_orders" -> (upsertOrders _),
    "q82_merge_deterministic" -> (mergeDeterministicOrders _),
    "q06_union_by_name" -> (unionByNameDrift _))

  val oracle: Map[String, String] = Map(
    "q67_regional_supply" -> regionalSupplySql,
    "q01_pricing_summary" -> pricingSummarySql,
    "q02_filter_pushdown" -> filterPushdownSql,
    "q03_revenue_by_nation" -> revenueByNationSql,
    "q04_top_customers" -> topCustomersSql,
    "q05_upsert_orders" -> upsertOrdersSql,
    "q82_merge_deterministic" -> mergeDeterministicOrdersSql,
    "q06_union_by_name" -> unionByNameDriftSql)
}
