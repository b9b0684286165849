package graft.streaming

import graft.sync.{ManifestStore, SketchTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * COMMIT PROTOCOL (VERDICT r6 #4 — manifest commits over plain
  * parquet): stored rows are PARTIALS that must combine with each
  * delta, so replaying a completed batch would double the additive
  * measures (sketch union alone is idempotent; sums are not), and the
  * previous delete-then-rename partition overwrite left a residual
  * crash window INSIDE the file-commit protocol (a day directory
  * deleted but its replacement not yet renamed in). Both close at
  * once under the shared [[graft.sync.ManifestStore]] protocol:
  * per-batch immutable data directories, a `_manifest/<batchId>` file
  * renamed in LAST as the single commit point, and a read path that
  * trusts only manifest-listed files (highest manifest wins per day).
  * A crash at ANY point before the manifest rename leaves orphans no
  * reader can see; the replayed batch re-merges from the
  * manifest-visible state — by construction the exact pre-crash store
  * — and reaches the byte-equivalent of the uncrashed build
  * (SketchViewSpec kills between data and manifest and proves it).
  *
  * Superseded batch directories (days fully re-merged by later
  * commits) stay on disk unreferenced — they cost storage, never
  * correctness — until [[vacuum]] deletes every file the current
  * manifest composition does not reference (skipping ids above the
  * highest committed manifest: an in-flight replay owns those).
  *
  * Scale shape: the store is ONE partial row per day — the read path
  * unions a handful of per-batch directory reads (bounded by batches
  * whose days were never re-touched; any range rollup then scans
  * O(#days) rows), and a batch rewrites only the day rows it touched.
  *
  * Manifest history grows one small file per batch and each
  * read/merge replays it in full — at minute-grain batches over
  * months this listing becomes the dominant metadata cost. Folding it
  * needs a snapshot manifest, and the id-is-precedence scheme makes
  * that an operational step (a snapshot must outrank every committed
  * manifest while staying below the stream's NEXT batch id, so it can
  * only be written from the quiesced writer); documented as the
  * store's known operational task rather than hidden — the same
  * niche Iceberg/Delta metadata checkpoints fill.
  */
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

  /** Marker check: `batchId` is committed iff its manifest exists. */
  def committed(spark: SparkSession, storeDir: String, batchId: Long): Boolean =
    ManifestStore.committed(spark, storeDir, batchId)

  /** The store as of the last committed manifest — the ONLY sanctioned
    * read path: orphan files from a crashed commit are invisible here
    * by construction. Empty (schema-correct) frame when nothing has
    * committed yet. */
  def readStore(spark: SparkSession, storeDir: String): DataFrame =
    ManifestStore.readStore(spark, storeDir)
      .getOrElse(SketchTable.buildDaily(
        spark.range(0).select(
          lit(null).cast("timestamp").as("ts"),
          lit(null).cast("long").as("user_id"),
          lit(null).cast("long").as("event_id"),
          lit(null).cast("double").as("value"))))

  /** Delete data files no current manifest references — see
    * [[graft.sync.ManifestStore.vacuum]] for the safety rules. */
  def vacuum(spark: SparkSession, storeDir: String): (Int, Int) =
    ManifestStore.vacuum(spark, storeDir)

  /** Idempotent merge of one micro-batch into the stored sketch table.
    * Public so a batch backfill can use the identical path — pick a
    * batchId disjoint from the streaming query's (its ids start at 0
    * and increment; negative ids are NOT safe here because manifest
    * precedence is numeric order — use ids above the stream's range
    * for backfills that must win, and check the return value).
    *
    * Single WRITER per store assumed (same contract as
    * [[graft.tx.ProcessedStore]]): the manifest check and the merge are
    * not one atomic step, so two processes racing the SAME batchId can
    * both merge before either renames its manifest — the loser's
    * rename lands second and its files silently shadow the winner's
    * for those days (both computed from the same pre-commit state, so
    * content is equivalent for honest replays; true multi-writer
    * safety needs a transactional table format). This ledger targets
    * the single-writer restart re-delivery case.
    *
    * @return true if this call committed the batch (including
    *         completing a crash-interrupted commit: orphan data files
    *         from the crashed attempt are invisible to [[readStore]],
    *         so the re-merge runs from the exact pre-crash state and
    *         overwrites them); false if `batchId` was already
    *         committed (restart re-delivery, or a backfill id
    *         colliding with the ledger) — callers doing backfills MUST
    *         check this, a dropped shard is otherwise invisible. */
  def mergeBatch(batch: DataFrame, batchId: Long, storeDir: String): Boolean = {
    val spark = batch.sparkSession
    if (committed(spark, storeDir, batchId))
      return false // replayed completed batch: no-op
    mergedDelta(batch, storeDir) match {
      case Some(merged) =>
        ManifestStore.commit(merged, storeDir, batchId, "day")
      case None =>
        // empty delta: commit an empty manifest so the ledger still
        // records the batch (replay stays a no-op)
        ManifestStore.sealEmpty(spark, storeDir, batchId)
    }
    true
  }

  /** The store∪delta re-aggregation for one batch (None when the
    * batch contributes no day rows). `day` is the store key: a
    * null-ts row has no day to merge into — excluded (a pipeline that
    * cares about null-ts rows quarantines them upstream). Existing
    * rows come from the MANIFEST-visible store only, so a crashed
    * prior attempt's files never feed the re-merge. */
  private def mergedDelta(batch: DataFrame, storeDir: String): Option[DataFrame] = {
    val spark = batch.sparkSession
    val delta = SketchTable.buildDaily(batch.filter(col("ts").isNotNull))
      .persist() // one build serves isEmpty + days + merge (3 actions)
    try {
      if (delta.isEmpty) None
      else {
        val days = delta.select(col("day")).distinct().collect()
          .map(_.getDate(0)).toSeq
        val existing = readStore(spark, storeDir)
          .where(col("day").isin(days: _*))
        // store rows are partials: combining = the same union/re-sum
        // aggregation that built them (sketch merge is associative).
        // allowMissingColumns: a store written before a sketch column
        // existed (schema evolution) null-fills it — the merge then
        // skips those nulls, so pre-upgrade rows contribute nothing to
        // the NEW sketch until backfilled (degraded, never wedged)
        Some(existing
          .unionByName(delta, allowMissingColumns = true)
          .groupBy(col("day"))
          .agg(
            hll_union_agg(col("users_sketch"), lit(false)).as("users_sketch"),
            call_function("qsample_merge", col("value_sketch"))
              .as("value_sketch"),
            sum(col("n")).as("n"),
            sum(col("value_total")).as("value_total"))
          // the persist above only covers this plan's construction —
          // materialize through localCheckpoint inside the commit
          .localCheckpoint(true))
      }
    } finally { delta.unpersist(); () }
  }

  /** Test hook: run the data-write half of [[mergeBatch]] and CRASH
    * before the manifest lands — the on-disk state of a kill between
    * the two. Returns the days the doomed commit wrote. */
  private[streaming] def mergeBatchCrashBeforeManifest(
      batch: DataFrame, batchId: Long, storeDir: String): Seq[java.sql.Date] = {
    val spark = batch.sparkSession
    require(!committed(spark, storeDir, batchId), "batch already committed")
    mergedDelta(batch, storeDir) match {
      case Some(merged) =>
        val days = merged.select(col("day")).distinct().collect()
          .map(_.getDate(0)).toSeq
        ManifestStore.writeBatchData(merged, storeDir, batchId, "day")
        days // …and "crash": no manifest
      case None => Seq.empty
    }
  }
}
