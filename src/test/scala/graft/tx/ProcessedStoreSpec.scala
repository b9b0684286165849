package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The materialized 21-column layout must be indistinguishable from the
  * pure derive path — the write→read round trip (including the
  * Year/Month/Day partition encoding and the null-partition rows for
  * invalid dates) may not change a single value. */
class ProcessedStoreSpec extends SparkSpec {

  // Processed_Timestamp is wall-clock at materialization time; every
  // other column must round-trip exactly.
  private val cols = Enrichment.outputColumns.filterNot(_ == "Processed_Timestamp")

  test("materialized table equals the derive path row-for-row (20 stable columns)") {
    val derived = TxQueries.processed(spark, sf).select(cols.map(col): _*)
    val stored = TxQueries.processedTable(spark, sf).select(cols.map(col): _*)
    assert(stored.count() === derived.count())
    assert(stored.exceptAll(derived).count() === 0)
    assert(derived.exceptAll(stored).count() === 0)
  }

  test("re-derived validity flag and date agree with the enrichment's own") {
    val derived = TxQueries.processed(spark, sf)
    val stored = TxQueries.processedTable(spark, sf)
    assert(stored.filter(!col("is_valid_date")).count() ===
      derived.filter(!col("is_valid_date")).count())
    // date precision: the store's reconstructed transaction_date is the
    // calendar date of the derive path's timestamp, for every valid row
    val a = derived.filter(col("is_valid_date"))
      .groupBy(to_date(col("transaction_date")).as("d")).count()
    val b = stored.filter(col("is_valid_date"))
      .groupBy(to_date(col("transaction_date")).as("d")).count()
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("memoization returns the same materialized path within a session") {
    val p1 = TxQueries.processedTable(spark, sf).inputFiles.toSet
    val p2 = TxQueries.processedTable(spark, sf).inputFiles.toSet
    assert(p1 === p2 && p1.nonEmpty)
  }
}
