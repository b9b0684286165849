package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously-maintained aggregate — a streaming MATERIALIZED VIEW:
  * an UPDATE-mode streaming aggregation emits, per micro-batch, only
  * the groups whose cumulative value changed, and `foreachBatch`
  * upserts exactly those rows into a bucketed parquet store. The store
  * therefore always equals the batch aggregate over everything
  * ingested so far — without ever rescanning history (the state store
  * carries the running totals; the view write is O(changed groups)).
  *
  * Scale shape: the store partitions by a hash bucket of the group
  * key, and a batch's upsert rewrites ONLY the buckets its changed
  * keys live in (partition-pruned read + dynamic partition overwrite —
  * the [[graft.sync.Compaction.purgeKeys]] pattern): untouched buckets
  * are never read or written. Lineage is severed before the overwrite
  * for the usual read-what-you-replace reason. Exactly-once comes from
  * the streaming checkpoint (a replayed batch re-upserts the same
  * cumulative values — idempotent by construction, since update-mode
  * rows carry absolute totals, not deltas).
  */
object MaterializedView {

  val NumBuckets = 16

  /** Per-merchant running (count, exact USD total) over the valid
    * stream, maintained into `storeDir`. */
  def startMerchantView(enriched: DataFrame, storeDir: String,
                        checkpoint: String,
                        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    graft.tx.Splitter.valid(enriched)
      .groupBy(col("Merchant_Name").as("merchant"))
      .agg(count(lit(1)).as("n_tx"),
        sum(col("Amount_USD").cast("decimal(18,2)")).cast("double").as("usd_total"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (delta: DataFrame, _: Long) =>
        upsert(delta, storeDir)
        ()
      }
      .start()

  /** Replace-by-key upsert of the changed groups into the bucketed
    * store. Public so a batch backfill can use the identical path.
    * Store mechanics (Hadoop-FS existence, dynamic-overwrite scaffold)
    * are the shared [[graft.sync.PartitionedStore]]. */
  def upsert(delta: DataFrame, storeDir: String): Unit = {
    val spark = delta.sparkSession
    if (delta.isEmpty) return
    val keyed = delta.withColumn("bucket",
      pmod(hash(col("merchant")), lit(NumBuckets)))
    val buckets = keyed.select(col("bucket")).distinct().collect()
      .map(_.getInt(0)).toSeq
    val existing =
      if (graft.sync.PartitionedStore.exists(spark, storeDir))
        spark.read.parquet(storeDir)
          .where(col("bucket").isin(buckets: _*))
      else keyed.limit(0)
    // null-SAFE anti join: a null merchant is a legitimate aggregation
    // group, and a plain key anti-join never matches null = null — the
    // old null row would survive next to every batch's new one,
    // accumulating duplicates
    val newKeys = keyed.select(col("merchant").as("m_new")).distinct()
    val merged = existing
      .join(newKeys, existing("merchant") <=> col("m_new"), "left_anti")
      .unionByName(keyed)
    graft.sync.PartitionedStore.overwritePartitions(merged, storeDir, Seq("bucket"))
  }
}
