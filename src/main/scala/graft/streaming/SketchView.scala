package graft.streaming

import graft.sync.{PartitionedStore, SketchTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously-maintained SKETCH table — the streaming twin of
  * [[graft.sync.SketchTable]]: each micro-batch reduces to per-day
  * partial rows (HLL sketch + exact additive measures) and MERGES them
  * into the stored table by re-aggregating store∪delta with
  * `hll_union_agg` — the sketch's own merge IS the upsert, so the
  * store always answers range-uniques over everything ingested so far
  * without rescanning history. This is what keeps "uniques this
  * month" live at 100 TB/day ingest: per-batch work is O(batch) + a
  * rewrite of only the touched day partitions.
  *
  * Differences from [[MaterializedView]] (absolute-total upsert):
  * here stored rows are PARTIALS that must combine with the delta, so
  * replaying a completed batch would double the additive measures
  * (sketch union alone is idempotent; sums are not). `foreachBatch`
  * re-delivers the last batch after a restart even when it committed —
  * the `_committed/<batchId>` marker (an underscore path, invisible to
  * parquet listings) makes that replay a no-op. The unguardable
  * remainder — a crash BETWEEN the store write and the marker write —
  * needs a transactional table format (Iceberg/Delta commit) and is
  * documented, not hidden.
  *
  * Scale shape: the store partitions by day; a batch rewrites only the
  * day partitions it touched (dynamic partition overwrite over a
  * lineage-severed merge, the [[MaterializedView.upsert]] pattern). */
object SketchView {

  /** Maintain the per-day sketch table from a streaming events frame
    * (`ts`, `user_id`, `event_id`, `value`). */
  def startDailySketchView(events: DataFrame, storeDir: String,
                           checkpoint: String,
                           trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, storeDir)
        ()
      }
      .start()

  /** Idempotent merge of one micro-batch into the stored sketch table.
    * Public so a batch backfill can use the identical path — pick a
    * batchId disjoint from the streaming query's (its ids start at 0
    * and increment; negative ids are a safe backfill convention).
    *
    * Single WRITER per store assumed (same contract as
    * [[graft.tx.ProcessedStore]]): the marker check and the merge are
    * not one atomic step, so two processes racing the SAME batchId can
    * both merge before either writes the marker — the loser's atomic
    * marker-create reports false, but its merge may already be in the
    * additive sums. True multi-writer safety needs a transactional
    * table format; this ledger targets the single-writer restart
    * re-delivery case.
    *
    * @return true if this call committed the batch; false if `batchId`
    *         was already committed (restart re-delivery, a backfill id
    *         colliding with the ledger, or a lost same-id race) —
    *         callers doing backfills MUST check this, a dropped shard
    *         is otherwise invisible. */
  def mergeBatch(batch: DataFrame, batchId: Long, storeDir: String): Boolean = {
    val spark = batch.sparkSession
    // all paths through the Hadoop FS API: the store lives on
    // HDFS/object storage in any real deployment, where java.io.File
    // answers are meaningless (PartitionedStore)
    val marker = s"$storeDir/_committed/$batchId"
    if (PartitionedStore.markerExists(spark, marker))
      return false // replayed completed batch: no-op
    // `day` is the store key: a null-ts row has no day to merge into —
    // excluded here (a null group would clobber, not merge, the
    // default partition: isin(days) can never match null). A pipeline
    // that cares about null-ts rows quarantines them upstream.
    val delta = SketchTable.buildDaily(batch.filter(col("ts").isNotNull))
      .persist() // one build serves isEmpty + days + merge (3 actions)
    try {
      if (!delta.isEmpty) {
        val days = delta.select(col("day")).distinct().collect()
          .map(_.getDate(0)).toSeq
        val existing =
          if (PartitionedStore.exists(spark, storeDir))
            spark.read.parquet(storeDir).where(col("day").isin(days: _*))
          else delta.limit(0)
        // store rows are partials: combining = the same union/re-sum
        // aggregation that built them (sketch merge is associative).
        // allowMissingColumns: a store written before a sketch column
        // existed (schema evolution) null-fills it — the merge then
        // skips those nulls, so pre-upgrade rows contribute nothing to
        // the NEW sketch until backfilled (degraded, never wedged)
        val merged = existing.unionByName(delta, allowMissingColumns = true)
          .groupBy(col("day"))
          .agg(
            hll_union_agg(col("users_sketch"), lit(false)).as("users_sketch"),
            call_function("qsample_merge", col("value_sketch"))
              .as("value_sketch"),
            sum(col("n")).as("n"),
            sum(col("value_total")).as("value_total"))
        PartitionedStore.overwritePartitions(merged, storeDir, Seq("day"))
      }
    } finally { delta.unpersist(); () }
    // the atomic create is the commit point: a lost same-id race
    // surfaces as false instead of a silent double-report
    PartitionedStore.createMarker(spark, marker)
  }
}
