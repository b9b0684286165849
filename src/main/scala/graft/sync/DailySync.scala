package graft.sync

import graft.streaming.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The daily warehouse sync job — the one-job Spark replacement for the
  * reference's entire Airflow DAG (SURVEY §3.3,
  * bigquery_update_scheduler.py:59–148,163–282): its ~200 LoC of
  * recursive WebHDFS listing, regex partition-column reattachment,
  * pandas concat and XCom plumbing collapse into a partition-pruned
  * `spark.read.parquet(...).where(...)`, and the BigQuery
  * reorder-before-upload (:199–225) is the K6 select-order enforcement.
  *
  * Scale: the `where` on Year/Month/Day hits partition pruning (the
  * valid sink is `partitionBy("Year","Month","Day")`), so the job reads
  * exactly one day's files regardless of table size — PlanSpec asserts
  * `PartitionFilters` on this plan. The count is taken on the pruned
  * day frame before the append, mirroring the reference's row-count
  * verification log (:276–277).
  */
object DailySync {

  /** One day's partition of the valid stream, partition-pruned. */
  def dayPartition(spark: SparkSession, validDir: String,
                   year: Int, month: Int, day: Int): DataFrame =
    spark.read.parquet(validDir)
      .where(col("Year") === year && col("Month") === month && col("Day") === day)

  /** Sync one day into the warehouse table; returns the appended row
    * count (the reference's verification metric). */
  def syncDay(spark: SparkSession, validDir: String, warehouseDir: String,
              year: Int, month: Int, day: Int): Long = {
    val dayDf = dayPartition(spark, validDir, year, month, day)
    val n = dayDf.count()
    Sinks.warehouseAppend(dayDf, warehouseDir)
    n
  }
}
