package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed warehouse tables — the co-located-join layout for fact
  * tables that are joined on the same key repeatedly (SURVEY §7 /
  * 100 TB design note: "co-locate joins via bucketing").
  *
  * Writing both sides bucketed (and sorted) by the join key into the
  * same bucket count lets Catalyst plan their equi-join with NO shuffle
  * exchange on either side — at warehouse scale that converts the
  * dominant repeated cost (a full shuffle of the fact table per join)
  * into a one-time cost at write. PlanSpec asserts the exchange-free
  * plan. The reference has no warehouse-side joins (its joins live in
  * Power BI), so this is extended surface, not parity.
  */
object Warehouse {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket keys. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
