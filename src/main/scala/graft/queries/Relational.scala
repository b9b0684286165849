package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational query surface over the driver test tables.
  *
  * These queries re-express the reference's OLAP surface (SURVEY.md §2.5,
  * reference requirements.md:42-53 — aggregations, top-k, rollups,
  * global-vs-group comparisons) against the TPC-H-ish star schema, and
  * cover the relational operator inventory: multi-way joins (broadcast
  * where the dimension is small), rollup/cube grouping sets, window
  * functions, semi/anti joins, set ops, distinct aggregation and top-k.
  *
  * Determinism contract with the DuckDB oracle (SparkEntry.oracleSql):
  *  - money sums go through DECIMAL(18,2) per RAW column, so the aggregate
  *    is exact and order-independent, then back to double for a stable
  *    schema; never cast a computed double product to decimal (the two
  *    engines round its low bits differently);
  *  - every result carries a total ORDER BY with a unique tie-breaker;
  *  - no raw timestamp columns are emitted (parquet nanos vs micros).
  *
  * Scale notes (100 TB design): every query here is a pure declarative
  * plan — shuffles only on group/join keys, dimension tables
  * (region/nation/supplier) broadcast explicitly, fact-fact joins left to
  * AQE/sort-merge. No driver-side collects.
  */
object Relational {

  /** Raw money/measure columns in the test tables are exact 2-decimal
    * values stored as double; casting THE RAW COLUMN to decimal(18,2) is
    * unambiguous in both Spark and DuckDB. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact, order-independent sum of a raw double money column. */
  def moneySum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact per-row revenue in decimal: price * (1 - discount). */
  private def revenue: Column =
    dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))

  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  // ---------------------------------------------------------------- q1
  /** q1: pricing summary — grouped aggregation with computed measures
    * (SURVEY §2.5 A1/A2 pattern; classic TPC-H Q1 shape). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM($revenueSql) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q2
  /** q2: revenue per region/nation — 4-way star join with broadcast
    * dimensions (SURVEY §2.6; reference Q2 "city with highest value"
    * pattern, requirements.md:44). region/nation are tiny at any scale →
    * explicit broadcast; customer⋈orders shuffles on the key. */
  def q2RegionRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))

  val q2Sql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q3
  /** q3: market-segment sales — join + multi-measure agg incl. exact
    * distinct (SURVEY §2.5 A1-A4). */
  def q3SegmentSales(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("revenue"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  val q3Sql: String =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q4
  /** q4: order revenue rolled up year → month → grand total (SURVEY §2.5
    * A3 multi-granularity rollup; reference requirements.md:12).
    *
    * Two-level shape: pre-aggregate to the FINEST grouping first
    * (year, month — O(#months) rows), then ROLLUP over that tiny
    * aggregate. A direct rollup makes Spark's Expand emit every fact
    * row × 3 grouping sets before the partial agg; here Expand runs
    * over dozens of pre-aggregated rows instead. Decimal partials keep
    * the re-aggregated sums exact, so results are bit-identical. */
  def q4TimeRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .agg(
        sum(dec(col("o_totalprice"))).as("rev_p"),
        count(lit(1)).as("n_p"))
      .rollup(col("o_year"), col("o_month"))
      .agg(
        sum(col("rev_p")).cast("double").as("revenue"),
        sum(col("n_p")).as("n_orders"))
      .orderBy(asc_nulls_first("o_year"), asc_nulls_first("o_month"))

  val q4Sql: String =
    """SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY ROLLUP(year(o_orderdate), month(o_orderdate))
      |ORDER BY o_year ASC NULLS FIRST, o_month ASC NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- q10
  /** q10: top-3 parts by revenue per supplier — ranking window over a
    * grouped aggregate (SURVEY §2.7/§2.8 top-k per group). Ties broken by
    * partkey so ranking is total. */
  def q10TopPartsPerSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(revenue).as("rev_dec"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("rev_dec").desc, col("l_partkey"))
    rev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("l_partkey"),
        col("rev_dec").cast("double").as("part_revenue"), col("rn"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  val q10Sql: String =
    s"""WITH rev AS (
      |  SELECT l_suppkey, l_partkey, SUM($revenueSql) AS rev_dec
      |  FROM lineitem GROUP BY l_suppkey, l_partkey)
      |SELECT l_suppkey, l_partkey, CAST(rev_dec AS DOUBLE) AS part_revenue, rn
      |FROM (SELECT *, ROW_NUMBER() OVER
      |        (PARTITION BY l_suppkey ORDER BY rev_dec DESC, l_partkey) AS rn
      |      FROM rev)
      |WHERE rn <= 3
      |ORDER BY l_suppkey, rn""".stripMargin

  // --------------------------------------------------------------- q11
  /** q11: customers who never placed a >$400k order — anti join
    * (SURVEY §2.6; NOT EXISTS shape). Filter is applied to the fact side
    * BEFORE the join so the anti-join probe is as small as possible. */
  def q11NoBigOrderCustomers(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
    Tables.customer(spark, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q11Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- q12
  /** q12: customers WITH a >$400k order — semi join (EXISTS). */
  def q12BigOrderCustomers(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
    Tables.customer(spark, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q12Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- q13
  /** q13: union-all of two order slices then re-aggregate (SURVEY §2.9
    * set operations; unionByName). */
  def q13UnionPriorities(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
    val high = o.filter(col("o_orderpriority") === "2-HIGH")
    urgent.unionByName(high)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q13Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
      |      UNION ALL
      |      SELECT * FROM orders WHERE o_orderpriority = '2-HIGH')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- q15
  /** q15: global top-k — Catalyst plans TakeOrderedAndProject, no full
    * sort at scale (SURVEY §2.8). */
  def q15TopOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val q15Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // --------------------------------------------------------------- q23
  /** q23: top supplier(s) by shipped revenue in a quarter (TPC-H Q15
    * shape) — the aggregate-equals-MAX selection `LIMIT 1` cannot
    * express (ties must ALL be returned). Shape: one shuffled rollup of
    * the date-filtered scan to O(suppliers), the 1-row max broadcast
    * back over that aggregate (never the fact table), an EQUALITY join
    * on the revenue value (an equi key — no nested loop), and the
    * supplier dimension joined after the reduction. Revenue sums are
    * decimal-exact before the one double cast, so the max-equality
    * comparison is engine-portable. */
  def q23TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue).cast("double").as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.join(broadcast(top), col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q23Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- q24
  /** q24: lapsed high-balance customers (TPC-H Q22 shape) — balance
    * above the average POSITIVE balance, yet no order since the cutoff
    * year, rolled up per nation. Shape: the global threshold is a
    * decimal-exact 1-row aggregate broadcast over the customer scan
    * (equality-free filter, still a broadcast hash-free pattern but
    * bounded by 1 row); the lapse test is an ANTI join whose fact side
    * is pre-filtered to recent orders and projected to the join key
    * only; the nation dimension broadcasts after the reduction. */
  def q24LapsedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((moneySum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) >= 2000)
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("n_name"))
  }

  val q24Sql: String =
    """WITH ab AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT n.n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer c CROSS JOIN ab
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_acctbal > ab.avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND year(o.o_orderdate) >= 2000)
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  // --------------------------------------------------------------- q25
  /** q25: sole-delayed-supplier blame report (TPC-H Q21 shape, with
    * "delayed" = shipped >90 days after the order date since this
    * schema carries no commit/receipt dates): suppliers who were the
    * ONLY delayed supplier in a multi-supplier order — the EXISTS ∧
    * NOT-EXISTS composition on one fact table. Shape: the delayed set
    * is derived once (fact ⋈ broadcast-able order dates, distinct to
    * (order, supplier) grain), multi-supplier orders are an aggregate
    * of the distinct grain, the "no OTHER delayed supplier" test is a
    * left-anti join of the delayed set against itself on the order key
    * with supplier inequality — every join hash-partitions on the
    * order key, nothing fans out beyond the (order, supplier) grain. */
  def q25SoleDelayedSupplier(spark: SparkSession, dir: String): DataFrame = {
    val delayed = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    // r16 (guide §2.4, VERDICT r15 #9): "no OTHER delayed supplier on
    // the order" ⟺ the order's delayed-(order, supplier)-distinct
    // count is exactly 1 — one aggregate over `delayed` replaces the
    // r15 left-anti SELF-join (which consumed `delayed` twice and
    // needed an eager localCheckpoint — the non-reliable-storage
    // concern — to avoid recomputing the fact⋈fact distinct). Single
    // consumer now: no materialization, no anti-join, 3 fact scans
    // instead of 4 + a checkpoint job, and the `delayed` distinct's
    // partitioning feeds the per-order aggregate. min(l_suppkey) IS
    // the sole supplier (the group has one row).
    val sole = delayed
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_delayed"), min(col("l_suppkey")).as("l_suppkey"))
      .filter(col("n_delayed") === 1)
      .select(col("l_orderkey"), col("l_suppkey"))
    val multi = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_supp"))
      .filter(col("n_supp") > 1)
      .select(col("l_orderkey"))
    sole
      .join(multi, "l_orderkey")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_solely_delayed"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_solely_delayed"))
      .orderBy(col("n_solely_delayed").desc, col("s_suppkey"))
  }

  val q25Sql: String =
    """WITH delayed AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey
      |  FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey
      |  WHERE l_shipdate > o_orderdate + INTERVAL '90 days'),
      |multi AS (
      |  SELECT l_orderkey
      |  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
      |  GROUP BY 1 HAVING COUNT(*) > 1)
      |SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_solely_delayed
      |FROM delayed d
      |JOIN multi USING (l_orderkey)
      |JOIN supplier s ON d.l_suppkey = s.s_suppkey
      |WHERE NOT EXISTS (SELECT 1 FROM delayed d2
      |                  WHERE d2.l_orderkey = d.l_orderkey
      |                    AND d2.l_suppkey <> d.l_suppkey)
      |GROUP BY 1, 2
      |ORDER BY n_solely_delayed DESC, s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q6
  /** q6: forecast-revenue-change — the pure scan-side query (TPC-H Q6
    * shape): conjunctive range predicates on date/discount/quantity and
    * one global sum, no join, no shuffle beyond the single-row final
    * agg. The predicates land in the parquet scan as PushedFilters
    * (date + quantity are min/max-prunable per row group), so at 100 TB
    * this reads only row groups intersecting one shipdate year — the
    * canonical pushdown showcase. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
        dec(col("l_discount")).between(dec(lit(0.03)), dec(lit(0.07))) &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("forecast_revenue"),
        count(lit(1)).as("n_items"))

  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS forecast_revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      |  AND CAST(l_discount AS DECIMAL(18,2))
      |        BETWEEN CAST(0.03 AS DECIMAL(18,2)) AND CAST(0.07 AS DECIMAL(18,2))
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q7
  /** q7: bilateral trade volume — supplier-nation × customer-nation ×
    * ship-year revenue matrix over DIFFERENT nations (TPC-H Q7
    * generalized: no 2-nation filter, the full antisymmetric matrix).
    * Both nation lookups broadcast; the only shuffles are the two fact
    * joins and the final rollup, whose cardinality is bounded by
    * nations² × years — independent of fact size. */
  def q7TradeVolume(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(revenue).cast("double").as("volume"), count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))

  val q7Sql: String =
    s"""SELECT s_nat.n_name AS supp_nation, c_nat.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(SUM($revenueSql) AS DOUBLE) AS volume, COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation s_nat ON s_nationkey = s_nat.n_nationkey
      |JOIN nation c_nat ON c_nationkey = c_nat.n_nationkey
      |WHERE s_nat.n_name <> c_nat.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q8
  /** q8: market share (TPC-H Q8 shape) — one nation's fraction of
    * regional revenue per order year, as a conditional aggregate ratio
    * (`sum(when)` / `sum`) over one join pass: both sums come from the
    * same shuffled aggregate, so the share costs nothing beyond the
    * base rollup. Decimal-exact numerator/denominator; one final
    * double division. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("n_name") === "NATION_0", dec(col("o_totalprice")))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(dec(col("o_totalprice"))).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("o_year"))

  val q8Sql: String =
    """SELECT r_name, year(o_orderdate) AS o_year,
      |  CAST(SUM(CASE WHEN n_name = 'NATION_0' THEN CAST(o_totalprice AS DECIMAL(18,2))
      |               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mkt_share,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q18
  /** q18: large-volume customers (TPC-H Q18 shape) — aggregate-then-
    * filter (HAVING) with a dimension join AFTER the reduction: the
    * per-customer rollup shrinks the facts to O(customers) before the
    * name lookup, so the join input is the aggregate, never the fact
    * table. */
  def q18LargeVolumeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(moneySum(col("o_totalprice")).as("total_value"),
        count(lit(1)).as("n_orders"))
      .filter(col("total_value") > 3000000.0)
    per.join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_value"), col("n_orders"))
      .orderBy(col("total_value").desc, col("c_custkey"))
  }

  val q18Sql: String =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY o_custkey
      |  HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 3000000.0)
      |SELECT c_custkey, c_name, total_value, n_orders
      |FROM per JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_value DESC, c_custkey""".stripMargin

  // ---------------------------------------------------------------- q5
  /** q5: revenue per nation where customer and supplier share the
    * nation, restricted to one region — the 6-table join chain
    * (fact⋈fact on orderkey, two key-equal dimension paths, broadcast
    * region/nation/supplier; TPC-H Q5 shape). The widest join plan in
    * the suite: exercises join reorder + AQE strategy choice. */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))

  val q5Sql: String =
    s"""SELECT n_name, CAST(SUM($revenueSql) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --------------------------------------------------------------- q14
  /** q14: order-count distribution over ALL customers — left outer join
    * (J-surface gap: preserves customers with zero orders), per-customer
    * count, then a histogram over the counts (TPC-H Q13 shape). */
  def q14OrderCountDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))

  val q14Sql: String =
    """WITH per AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT n_orders, COUNT(*) AS n_customers FROM per
      |GROUP BY n_orders ORDER BY n_orders""".stripMargin

  // --------------------------------------------------------------- q16
  /** q16: small-quantity order value per brand — join against a
    * per-part aggregate subquery with a threshold on its measure
    * (TPC-H Q17 shape: "lineitems below half their part's average
    * quantity"). The per-part avg is computed as an exact decimal sum /
    * count divided in DOUBLE, identically in both engines, so the
    * threshold comparison cannot drift. */
  def q16SmallQuantityValue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perPart = li.groupBy(col("l_partkey").as("p_key"))
      .agg((moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    li.join(perPart, col("l_partkey") === col("p_key"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(moneySum(col("l_extendedprice")).as("small_qty_value"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  val q16Sql: String =
    """WITH perpart AS (
      |  SELECT l_partkey AS p_key,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_value,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN perpart ON l_partkey = p_key
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_quantity < avg_qty * 0.5
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // --------------------------------------------------------------- q19
  /** q19: revenue from a disjunction of (brand × quantity-band ×
    * container-ish) predicates — the TPC-H Q19 shape: a complex OR of
    * conjunctions that Catalyst must simplify, partially push into the
    * scan, and keep inside one codegen span alongside the join. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 15) &&
          col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 25) &&
          col("p_size").between(1, 20)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 35) &&
          col("p_size").between(1, 30)))
      .agg(
        sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val q19Sql: String =
    s"""SELECT CAST(SUM($revenueSql) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15 AND p_size BETWEEN 1 AND 10)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35 AND p_size BETWEEN 1 AND 30)""".stripMargin

  /** Registry for SparkEntry. */
  // ---------------------------------------------------------------- q20
  /** q20 [§2.7 frame windows]: running (cumulative) daily revenue and
    * year-progress percentile within each order-year — an
    * unbounded-preceding ROWS frame plus `percent_rank` over the daily
    * pre-aggregate. Scale shape: facts are aggregated to O(#days) rows
    * BEFORE any window, and the window partitions by year, so no
    * fact-sized or single-task sort exists anywhere in the plan.
    * Decimal partials keep the running sums exact in both engines. */
  def q20RunningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("o_year"),
        col("o_orderdate").as("o_date"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_p"), count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col("o_year")).orderBy(col("o_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRank = Window.partitionBy(col("o_year")).orderBy(col("o_date"))
    daily
      .withColumn("cum_revenue", sum(col("rev_p")).over(wCum).cast("double"))
      .withColumn("year_frac", round(percent_rank().over(wRank), 6))
      .select(col("o_year"), col("o_date"), col("n"),
        col("cum_revenue"), col("year_frac"))
      .orderBy(col("o_year"), col("o_date"))
  }

  val q20Sql: String =
    """WITH d AS (
      |  SELECT year(o_orderdate) AS o_year, o_orderdate AS o_date,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_p, COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_year, o_date, n,
      |  CAST(SUM(rev_p) OVER (PARTITION BY o_year ORDER BY o_date
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue,
      |  round(percent_rank() OVER (PARTITION BY o_year ORDER BY o_date), 6) AS year_frac
      |FROM d ORDER BY o_year, o_date""".stripMargin

  // ---------------------------------------------------------------- q21
  /** q21 [§2.9 set ops beyond UNION]: 1994→1995 buyer-cohort movement
    * via INTERSECT (retained) and EXCEPT (churned / acquired) on the
    * distinct-buyer sets. Set ops plan as hash-partitioned
    * aggregate/join shapes on the custkey — the same bounded-shuffle
    * cost as a distinct, no row explosion. The year filter prunes at
    * the scan before any distinct. */
  def q21CustomerRetention(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def buyers(yr: Int) =
      o.filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey")).distinct()
    val a = buyers(1994)
    val b = buyers(1995)
    def tag(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("cohort"), col("n"))
    tag(a.intersect(b), "retained")
      .unionByName(tag(a.except(b), "churned"))
      .unionByName(tag(b.except(a), "acquired"))
      .orderBy(col("cohort"))
  }

  val q21Sql: String =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1994),
      |     b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
      |SELECT 'retained' AS cohort, COUNT(*) AS n FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |UNION ALL
      |SELECT 'churned', COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |UNION ALL
      |SELECT 'acquired', COUNT(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
      |ORDER BY cohort""".stripMargin

  // ---------------------------------------------------------------- q22
  /** q22 [§2.6 FULL OUTER]: daily order activity vs daily ship activity
    * on the calendar date — a full outer join whose exclusive rows are
    * real on BOTH sides (shipments trail the last order date by up to
    * ~4 months and the earliest orders predate the first shipment).
    * Both sides pre-aggregate to O(#days) before the join, so the full
    * outer join runs on two date dimensions, never on fact rows. */
  def q22OrderShipCalendar(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_orderdate").as("d"))
      .agg(count(lit(1)).as("n_orders"))
    val l = Tables.lineitem(spark, dir)
      .groupBy(col("l_shipdate").as("d"))
      .agg(count(lit(1)).as("n_ships"))
    o.join(l, Seq("d"), "full_outer")
      .select(col("d"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_ships"), lit(0L)).as("n_ships"))
      .orderBy(col("d"))
  }

  val q22Sql: String =
    """WITH o AS (SELECT o_orderdate AS d, COUNT(*) AS n_orders FROM orders GROUP BY 1),
      |     l AS (SELECT l_shipdate AS d, COUNT(*) AS n_ships FROM lineitem GROUP BY 1)
      |SELECT d, COALESCE(n_orders, 0) AS n_orders, COALESCE(n_ships, 0) AS n_ships
      |FROM o FULL OUTER JOIN l USING (d)
      |ORDER BY d""".stripMargin

  // ---------------------------------------------------------------- q26
  /** q26 [§2.7 RANGE frames]: trailing-30-day spend per customer — a
    * time-based RANGE window frame (`rangeBetween` over integer epoch
    * days), the frame class ROWS frames cannot express: the frame width
    * is a VALUE interval, so same-day orders enter each other's frames
    * and gaps in the order history shrink the frame to whatever actually
    * falls inside the 30 days. Scale shape: partitioned by `o_custkey`
    * (millions of small groups, no skew), sorted only within each
    * customer's own orders — no global or single-task sort anywhere.
    * Decimal partials keep the moving sums exact in both engines. */
  def q26TrailingSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_date(col("o_d")))
      .rangeBetween(-29, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("o_d"),
        dec(col("o_totalprice")).as("p"))
      .withColumn("trailing_spend", sum(col("p")).over(w).cast("double"))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .filter(col("n_in_window") >= 2)
      .select(col("o_custkey"), col("o_d").as("o_date"),
        col("trailing_spend"), col("n_in_window"))
      .orderBy(col("o_custkey"), col("o_date"), col("trailing_spend"))
  }

  val q26Sql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |      PARTITION BY o_custkey ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
      |      RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_spend,
      |    COUNT(*) OVER (
      |      PARTITION BY o_custkey ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
      |      RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS n_in_window
      |  FROM orders)
      |WHERE n_in_window >= 2
      |ORDER BY o_custkey, o_date, trailing_spend""".stripMargin

  // ---------------------------------------------------------------- q27
  /** q27 [§2.9 bag set ops]: quarter-over-quarter priority-mix movement
    * via EXCEPT ALL / INTERSECT ALL — multiset semantics, a different
    * operator (and plan) from q21's set-semantics INTERSECT/EXCEPT:
    * Spark plans these as a count-per-value aggregate followed by a
    * `Generate` replicating each value max(0, n₁−n₂) (resp. min) times,
    * so duplicates carry through without ever materializing either bag
    * row-by-row against the other. Both inputs prune at the scan on the
    * quarter predicate and aggregate map-side before the single shuffle
    * on the priority value. */
  def q27PriorityBagDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def prios(yr: Int, q: Int) =
      o.filter(year(col("o_orderdate")) === yr &&
          quarter(col("o_orderdate")) === q)
        .select(col("o_orderpriority"))
    val a = prios(1995, 1)
    val b = prios(1995, 2)
    def tag(df: DataFrame, name: String) =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(lit(name).as("arm"), col("o_orderpriority"), col("n"))
    tag(a.exceptAll(b), "q1_surplus")
      .unionByName(tag(b.exceptAll(a), "q2_surplus"))
      .unionByName(tag(a.intersectAll(b), "common"))
      .orderBy(col("arm"), col("o_orderpriority"))
  }

  val q27Sql: String =
    """WITH a AS (SELECT o_orderpriority FROM orders
      |           WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) = 1),
      |     b AS (SELECT o_orderpriority FROM orders
      |           WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) = 2)
      |SELECT 'q1_surplus' AS arm, o_orderpriority, COUNT(*) AS n
      |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2
      |UNION ALL
      |SELECT 'q2_surplus', o_orderpriority, COUNT(*)
      |FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a) GROUP BY 2
      |UNION ALL
      |SELECT 'common', o_orderpriority, COUNT(*)
      |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2
      |ORDER BY arm, o_orderpriority""".stripMargin

  // --------------------------------------------------------------- q28
  /** q28: cheapest supplier per part with ties (TPC-H Q2 shape) — the
    * groupwise-min + join-back class, distinct from [[q23TopSupplier]]'s
    * single GLOBAL max: here the min is computed PER GROUP and joined
    * back on (group, value) equality, returning every tied winner — a
    * correlated `= (SELECT MIN ...)` subquery expressed as two
    * aggregates and an equi join. Cost of (part, supplier) = the
    * decimal-exact MIN list price they ever shipped at.
    *
    * Scale shape: the fact table reduces to (part, supplier) grain
    * ONCE; the per-part min aggregates that reduced table (O(parts)),
    * and the join-back runs reduced⋈mins on the part key — both inputs
    * are post-reduction, the fact table is never re-scanned. The brand
    * predicate lands on the part dimension BEFORE the fact reduction
    * via a broadcast semi-ish inner join, so at 100 TB the reduction
    * only sees the selected parts' lineitems. */
  def q28MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val parts = broadcast(
      Tables.part(spark, dir).filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey"), col("p_name")))
    val cost = Tables.lineitem(spark, dir)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(dec(col("l_extendedprice"))).as("cost"))
    val best = cost.groupBy(col("p_partkey").as("b_partkey"))
      .agg(min(col("cost")).as("min_cost"))
    cost.join(best,
        col("p_partkey") === col("b_partkey") && col("cost") === col("min_cost"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("cost").cast("double").as("min_cost"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  val q28Sql: String =
    """WITH cost AS (
      |  SELECT p_partkey, p_name, l_suppkey,
      |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#1'
      |  GROUP BY 1, 2, 3)
      |SELECT p_partkey, p_name, s_name, n_name,
      |  CAST(cost AS DOUBLE) AS min_cost
      |FROM cost
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE cost = (SELECT MIN(c2.cost) FROM cost c2
      |              WHERE c2.p_partkey = cost.p_partkey)
      |ORDER BY p_partkey, s_name""".stripMargin

  // --------------------------------------------------------------- q29
  /** q29: parts holding an outsized share of a nation's shipped value
    * (TPC-H Q11 shape) — aggregate-vs-global HAVING: a part qualifies
    * when its value exceeds 2× the average per-part value. TPC-H's
    * literal `> fraction × total` cannot bind across scale factors (10×
    * more parts dilutes every share 10×); the avg-multiple form keeps
    * the identical plan shape and stays non-vacuous at every sf. The
    * comparison stays exact: decimal value × integer part count vs
    * 2 × decimal total — no float fraction ever enters the predicate
    * (cf. the float-determinism contract above).
    *
    * Scale shape: suppliers of the target nation reduce to a broadcast
    * key set; the fact table aggregates to part grain in one
    * hash-partitioned pass; the 1-row total derives from the SAME
    * per-part aggregate (no second fact scan) and broadcasts back. */
  def q29ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = broadcast(
      Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_9")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey")))
    val perPart = Tables.lineitem(spark, dir)
      .join(natSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("value"),
        count(lit(1)).as("n_lines"))
    val total = perPart.agg(sum(col("value")).as("total_value"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value") * col("n_parts") > col("total_value") * 2)
      .select(col("l_partkey"), col("value").cast("double").as("value"),
        col("n_lines"))
      .orderBy(col("l_partkey"))
  }

  val q29Sql: String =
    """WITH pp AS (
      |  SELECT l_partkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value,
      |    COUNT(*) AS n_lines
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_9'
      |  GROUP BY 1)
      |SELECT l_partkey, CAST(value AS DOUBLE) AS value, n_lines
      |FROM pp
      |WHERE value * (SELECT COUNT(*) FROM pp)
      |  > (SELECT SUM(value) FROM pp) * 2
      |ORDER BY l_partkey""".stripMargin

  // --------------------------------------------------------------- q30
  /** q30: cohort retention matrix — customers grouped by FIRST-order
    * year (the cohort), tracked across every later activity year: the
    * classic triangular retention view ([[q21CustomerRetention]] gives
    * one year-pair as sets; this gives the whole matrix with rates).
    *
    * Scale shape: the fact table reduces to (customer, year)-distinct
    * grain once; the cohort label is a customer-grain MIN re-aggregate
    * of that same table; the customer-keyed join is one hash
    * partitioning shared by both sides; cohort sizes are a years-sized
    * broadcast. Retention = exact-long count ÷ exact-long cohort size,
    * a single double division per emitted cell. */
  def q30CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .distinct()
    val first = active.groupBy(col("o_custkey")).agg(min(col("yr")).as("cohort"))
    val cohortSize = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_n"))
    active.join(first, "o_custkey")
      .groupBy(col("cohort"), col("yr"))
      .agg(count(lit(1)).as("active_n"))
      .join(broadcast(cohortSize), "cohort")
      .select(col("cohort"), col("yr"), col("active_n"), col("cohort_n"),
        (col("active_n").cast("double") / col("cohort_n")).as("retention"))
      .orderBy(col("cohort"), col("yr"))
  }

  val q30Sql: String =
    """WITH active AS (
      |  SELECT DISTINCT o_custkey, year(o_orderdate) AS yr FROM orders),
      |first AS (SELECT o_custkey, MIN(yr) AS cohort FROM active GROUP BY 1),
      |cs AS (SELECT cohort, COUNT(*) AS cohort_n FROM first GROUP BY 1)
      |SELECT cohort, yr, COUNT(*) AS active_n, cohort_n,
      |  COUNT(*)::DOUBLE / cohort_n AS retention
      |FROM active JOIN first USING (o_custkey) JOIN cs USING (cohort)
      |GROUP BY cohort, yr, cohort_n
      |ORDER BY cohort, yr""".stripMargin

  // --------------------------------------------------------------- q31
  /** q31: customer spend QUARTILES — `ntile(4)` semantics (equal
    * population, remainder spread to the first buckets) computed
    * WITHOUT a single-partition window, per VERDICT r7 #7: the
    * customer-grain aggregate is itself fact-sized at 100×, so the
    * old global-`ntile` exemption argued boundedness that does not
    * hold at scale. This is the exact two-pass distributed rank:
    * pass 1 range-partitions the spend table on the total order
    * (spend desc, custkey — range exchange, every partition window
    * PARTITIONED by its range id, fully parallel) and collects ONE
    * ROW PER SHUFFLE PARTITION of counts (the same bounded-collect
    * class as the distinct-day lists); pass 2 broadcast-joins the
    * driver-computed prefix offsets back on partition id, so
    * global rank = offset + local row_number, and the ntile bucket is
    * closed-form arithmetic on (rank, N). Range-partition ids are
    * monotone along the requested SortOrder, and the order is total
    * (custkey tiebreak), so ranks — and therefore bucket membership —
    * are unique, sample-bound-independent, and engine-identical: the
    * DuckDB `ntile` oracle hash-matches exactly. */
  def q31SpendQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("spend"))
    val ranked = spend
      .repartitionByRange(col("spend").desc, col("o_custkey"))
      .withColumn("pid", spark_partition_id())
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("pid"))
          .orderBy(col("spend").desc, col("o_custkey"))))
      .localCheckpoint() // two consumers: the pid-count pass and the final rollup
    val cnts = ranked.groupBy(col("pid"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = cnts.map(_._2).sum
    var acc = 0L
    val offsets = cnts.toSeq.map { case (pid, c) => val o = acc; acc += c; (pid, o) }
    import spark.implicits._
    val offDf = offsets.toDF("pid", "off")
    // ntile(4): q full buckets of size qz+1 for the first r, size qz after
    val qz = n / 4
    val r = n % 4
    val rank = col("off") + col("rn")
    val bucket = when(rank <= lit(r * (qz + 1)),
        floor((rank - 1) / lit((qz + 1).toDouble)) + 1)
      .otherwise(lit(r) + floor((rank - lit(r * (qz + 1)) - 1) /
        lit(math.max(qz, 1L).toDouble)) + 1)
    ranked.join(broadcast(offDf), "pid")
      .withColumn("quartile", bucket.cast("int"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("spend")).cast("double").as("min_spend"),
        max(col("spend")).cast("double").as("max_spend"),
        sum(col("spend")).cast("double").as("total_spend"))
      .orderBy(col("quartile"))
  }

  val q31Sql: String =
    """WITH s AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders GROUP BY 1),
      |t AS (SELECT spend,
      |        ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS quartile
      |      FROM s)
      |SELECT quartile, COUNT(*) AS n_customers,
      |  CAST(MIN(spend) AS DOUBLE) AS min_spend,
      |  CAST(MAX(spend) AS DOUBLE) AS max_spend,
      |  CAST(SUM(spend) AS DOUBLE) AS total_spend
      |FROM t GROUP BY quartile ORDER BY quartile""".stripMargin

  // --------------------------------------------------------------- q32
  /** q32: product-line PROFIT by nation × year (TPC-H Q9 shape) — the
    * class where the measure itself spans joined tables: profit =
    * revenue(lineitem) − cost(part × quantity), so no single-table
    * pre-aggregation can compute it; the arithmetic must happen on the
    * joined row. Also the one query joining BOTH fact tables
    * (lineitem ⋈ orders, for the order year) plus three dimensions.
    *
    * Scale shape: the part-name predicate prunes the part dimension
    * BEFORE its broadcast, so the fact scan only keeps matching parts'
    * lines (the join is the filter); supplier/nation broadcast; the one
    * genuine shuffle is lineitem ⋈ orders on the order key — fact-fact,
    * hash-partitioned, exactly where AQE's skew handling applies at
    * 100 TB. All money math stays decimal (exact integer-scaled in both
    * engines) until the final double cast. */
  def q32ProfitByNationYear(spark: SparkSession, dir: String): DataFrame = {
    val parts = broadcast(
      Tables.part(spark, dir).filter(col("p_name").contains("bolt"))
        .select(col("p_partkey"), col("p_retailprice")))
    val orderYears = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(spark, dir)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(orderYears, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(
        sum(revenue - dec(col("p_retailprice")) * dec(col("l_quantity")))
          .cast("double").as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"), col("o_year"))
  }

  val q32Sql: String =
    s"""SELECT n_name, year(o_orderdate) AS o_year,
      |  CAST(SUM($revenueSql
      |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q33
  /** q33: segment sales through the SALTED equi join
    * ([[Skew.saltedEquiJoin]]) — proves the skew-mitigation join rewrite
    * is a pure plan transform: the oracle is the PLAIN join's SQL, so
    * the hash gate shows salting changes nothing but the shuffle layout.
    * [[TxQueries]]' tx10 grades the salted AGGREGATION; this grades the
    * salted JOIN — the tool for a hot fact key against a dimension too
    * large to broadcast (where AQE skew-split only handles sort-merge).
    *
    * Here customer stands in for that dimension (hinted shuffle_hash;
    * replicated 8×), orders for the skewed fact. At 100 TB the same
    * call spreads a celebrity customer's orders over 8 reducers. */
  def q33SaltedSegmentSales(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    Skew.saltedEquiJoin(Tables.orders(spark, dir), cust,
        factKey = "o_custkey", dimKey = "c_custkey",
        saltFrom = xxhash64(col("o_orderkey")), salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(moneySum(col("o_totalprice")).as("total_sales"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  val q33Sql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q34
  /** q34: order-priority TRANSITION matrix — `first_value`/`last_value`
    * over an explicit unbounded ROWS frame (the frame-sensitive window
    * pair the registry didn't yet exercise: with the default RANGE
    * frame, last_value would see only up to the current row). Each
    * customer contributes (first priority, last priority) from their
    * order history, rolled into the priority × priority flow matrix —
    * the behavior-migration view (did ultra-urgent customers stay?).
    *
    * Scale shape: the window input is projected to 3 columns and
    * partitioned by customer (millions of small groups — no global
    * sort); the distinct reduces to customer grain before the final
    * priority²-sized aggregate. Ties inside a customer's history break
    * on the order key, so the frame endpoints are deterministic. */
  def q34PriorityTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority"))
      .select(col("o_custkey"),
        first(col("o_orderpriority")).over(w).as("first_pri"),
        last(col("o_orderpriority")).over(w).as("last_pri"))
      .distinct()
      .groupBy(col("first_pri"), col("last_pri"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("first_pri"), col("last_pri"))
  }

  val q34Sql: String =
    """WITH pc AS (
      |  SELECT DISTINCT o_custkey,
      |    first_value(o_orderpriority) OVER w AS first_pri,
      |    last_value(o_orderpriority)  OVER w AS last_pri
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |SELECT first_pri, last_pri, COUNT(*) AS n_customers
      |FROM pc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_profit_by_nation_year" -> q32ProfitByNationYear _,
    "q33_salted_segment_sales" -> q33SaltedSegmentSales _,
    "q34_priority_transitions" -> q34PriorityTransitions _,
    "q31_spend_quartiles" -> q31SpendQuartiles _,
    "q30_cohort_retention" -> q30CohortRetention _,
    "q28_min_cost_supplier" -> q28MinCostSupplier _,
    "q29_important_parts" -> q29ImportantParts _,
    "q26_trailing_spend" -> q26TrailingSpend _,
    "q27_priority_bag_diff" -> q27PriorityBagDiff _,
    "q22_order_ship_calendar" -> q22OrderShipCalendar _,
    "q21_customer_retention" -> q21CustomerRetention _,
    "q20_running_revenue" -> q20RunningRevenue _,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue _,
    "q5_nation_revenue" -> q5NationRevenue _,
    "q6_forecast_revenue" -> q6ForecastRevenue _,
    "q7_trade_volume" -> q7TradeVolume _,
    "q8_market_share" -> q8MarketShare _,
    "q18_large_volume_customers" -> q18LargeVolumeCustomers _,
    "q14_order_count_distribution" -> q14OrderCountDistribution _,
    "q16_small_quantity_value" -> q16SmallQuantityValue _,
    "q1_pricing_summary" -> q1PricingSummary _,
    "q2_region_revenue" -> q2RegionRevenue _,
    "q3_segment_sales" -> q3SegmentSales _,
    "q4_time_rollup" -> q4TimeRollup _,
    "q10_top_parts_per_supplier" -> q10TopPartsPerSupplier _,
    "q11_no_big_order_customers" -> q11NoBigOrderCustomers _,
    "q12_big_order_customers" -> q12BigOrderCustomers _,
    "q13_union_priorities" -> q13UnionPriorities _,
    "q15_top_orders" -> q15TopOrders _,
    "q23_top_supplier" -> q23TopSupplier _,
    "q24_lapsed_customers" -> q24LapsedCustomers _,
    "q25_sole_delayed_supplier" -> q25SoleDelayedSupplier _
  )

  val oracles: Map[String, String] = Map(
    "q32_profit_by_nation_year" -> q32Sql,
    "q33_salted_segment_sales" -> q33Sql,
    "q34_priority_transitions" -> q34Sql,
    "q31_spend_quartiles" -> q31Sql,
    "q30_cohort_retention" -> q30Sql,
    "q28_min_cost_supplier" -> q28Sql,
    "q29_important_parts" -> q29Sql,
    "q26_trailing_spend" -> q26Sql,
    "q27_priority_bag_diff" -> q27Sql,
    "q22_order_ship_calendar" -> q22Sql,
    "q21_customer_retention" -> q21Sql,
    "q20_running_revenue" -> q20Sql,
    "q19_disjunctive_revenue" -> q19Sql,
    "q5_nation_revenue" -> q5Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q7_trade_volume" -> q7Sql,
    "q8_market_share" -> q8Sql,
    "q18_large_volume_customers" -> q18Sql,
    "q14_order_count_distribution" -> q14Sql,
    "q16_small_quantity_value" -> q16Sql,
    "q1_pricing_summary" -> q1Sql,
    "q2_region_revenue" -> q2Sql,
    "q3_segment_sales" -> q3Sql,
    "q4_time_rollup" -> q4Sql,
    "q10_top_parts_per_supplier" -> q10Sql,
    "q11_no_big_order_customers" -> q11Sql,
    "q12_big_order_customers" -> q12Sql,
    "q13_union_priorities" -> q13Sql,
    "q15_top_orders" -> q15Sql,
    "q23_top_supplier" -> q23Sql,
    "q24_lapsed_customers" -> q24Sql,
    "q25_sole_delayed_supplier" -> q25Sql
  )
}
