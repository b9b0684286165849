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
  * parquet listings) makes that replay a no-op. A crash BETWEEN the
  * store write and the marker write is reconciled per-day: every
  * merged row is stamped with the committing batch id (`last_batch`),
  * so the replay skips days the interrupted commit already rewrote —
  * including the partial-commit case where only SOME day partitions
  * had swapped in — and merges only the rest. The one remaining
  * window is inside the file-commit protocol itself (a day directory
  * deleted but its replacement not yet renamed in); closing that
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
    * @return true if this call committed the batch (including
    *         completing a crash-interrupted commit whose data was
    *         already in place — the per-day `last_batch` stamp makes
    *         that replay merge nothing and just write the marker);
    *         false if `batchId` was already committed (restart
    *         re-delivery, a backfill id colliding with the ledger, or
    *         a lost same-id race) — callers doing backfills MUST check
    *         this, a dropped shard is otherwise invisible. */
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
        val existingRaw =
          if (PartitionedStore.exists(spark, storeDir))
            spark.read.parquet(storeDir).where(col("day").isin(days: _*))
          else delta.limit(0)
        // per-day commit stamp (legacy pre-stamp stores null-fill it):
        // a day already carrying THIS batch id absorbed the delta
        // before a crash that never reached the marker — re-merging it
        // would double the additive sums, so it is skipped
        val existing =
          if (existingRaw.columns.contains("last_batch")) existingRaw
          else existingRaw.withColumn("last_batch", lit(null).cast("long"))
        val doneDays = existing.filter(col("last_batch") === batchId)
          .select(col("day")).distinct().collect().map(_.getDate(0)).toSet
        val mergeDays = days.filterNot(doneDays.contains)
        if (mergeDays.nonEmpty) {
          // store rows are partials: combining = the same union/re-sum
          // aggregation that built them (sketch merge is associative).
          // allowMissingColumns: a store written before a sketch column
          // existed (schema evolution) null-fills it — the merge then
          // skips those nulls, so pre-upgrade rows contribute nothing to
          // the NEW sketch until backfilled (degraded, never wedged)
          val merged = existing.drop("last_batch")
            .where(col("day").isin(mergeDays: _*))
            .unionByName(delta.where(col("day").isin(mergeDays: _*)),
              allowMissingColumns = true)
            .groupBy(col("day"))
            .agg(
              hll_union_agg(col("users_sketch"), lit(false)).as("users_sketch"),
              call_function("qsample_merge", col("value_sketch"))
                .as("value_sketch"),
              sum(col("n")).as("n"),
              sum(col("value_total")).as("value_total"))
            .withColumn("last_batch", lit(batchId))
          PartitionedStore.overwritePartitions(merged, storeDir, Seq("day"))
        }
      }
    } finally { delta.unpersist(); () }
    // the atomic create is the commit point: a lost same-id race
    // surfaces as false instead of a silent double-report
    PartitionedStore.createMarker(spark, marker)
  }
}
