package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational query surface over the driver test tables.
  *
  * These queries re-express the reference's OLAP surface (SURVEY.md §2.5,
  * reference requirements.md:42-53 — aggregations, top-k, rollups,
  * global-vs-group comparisons) against the TPC-H-ish star schema.
  *
  * Determinism contract with the DuckDB oracle (SparkEntry.oracleSql):
  *  - money sums go through DECIMAL(18,2) per element, so the aggregate is
  *    exact and order-independent, then back to double for a stable schema;
  *  - every result carries a total ORDER BY with a unique tie-breaker;
  *  - no raw timestamp columns are emitted (parquet nanos vs micros).
  */
object Relational {

  /** Raw money/measure columns in the test tables are exact 2-decimal
    * values stored as double; casting THE RAW COLUMN to decimal(18,2) is
    * unambiguous in both Spark and DuckDB. Derived arithmetic must then
    * stay in decimal (exact, order-independent) — never cast a computed
    * double product to decimal, the two engines round its low bits
    * differently. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact, order-independent sum of a raw double money column. */
  def moneySum(c: Column): Column = sum(dec(c)).cast("double")

  /** q1: pricing summary — grouped aggregation with computed measures
    * (SURVEY §2.5 A1/A2 pattern; classic TPC-H Q1 shape). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
