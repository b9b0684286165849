package graft.streaming

import graft.sync.SketchTable
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

  /** Maintain the per-day user-sketch table from a streaming events
    * frame (`ts`, `user_id`, `value`). */
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
    * Public so a batch backfill can use the identical path. */
  def mergeBatch(batch: DataFrame, batchId: Long, storeDir: String): Unit = {
    val spark = batch.sparkSession
    val marker = new java.io.File(s"$storeDir/_committed/$batchId")
    if (marker.exists()) return // replayed completed batch: no-op
    val delta = SketchTable.buildDaily(batch)
    if (!delta.isEmpty) {
      val days = delta.select(col("day")).distinct().collect()
        .map(_.getDate(0)).toSeq
      val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        val existing =
          if (new java.io.File(storeDir).exists())
            spark.read.parquet(storeDir).where(col("day").isin(days: _*))
          else delta.limit(0)
        // store rows are partials: combining = the same union/re-sum
        // aggregation that built them (sketch merge is associative)
        val merged = existing.unionByName(delta)
          .groupBy(col("day"))
          .agg(
            hll_union_agg(col("users_sketch"), lit(false)).as("users_sketch"),
            sum(col("n")).as("n"),
            sum(col("value_total")).as("value_total"))
          .localCheckpoint(true) // sever lineage: the write replaces its input
        merged.write.mode("overwrite").partitionBy("day").parquet(storeDir)
        spark.catalog.refreshByPath(storeDir)
      } finally
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    }
    marker.getParentFile.mkdirs()
    marker.createNewFile()
    ()
  }
}
