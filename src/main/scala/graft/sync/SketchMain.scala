package graft.sync

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable job body that (re)builds the stored sketch table for an
  * events directory — the `spark-submit` entry a scheduler invokes
  * after each day's ingest lands, so every dashboard range-uniques /
  * range-quantiles query reads O(#days) sketch rows instead of the
  * facts ([[SketchTable]]; the streaming twin is
  * [[graft.streaming.SketchView]], this is its batch/backfill
  * sibling). Same out-of-engine scheduling stance as [[SyncMain]].
  *
  * Usage:
  * {{{
  *   spark-submit --class graft.sync.SketchMain \
  *     --conf spark.sql.extensions=graft.plans.GraftExtensions <jar> \
  *     <eventsDir> <storeDir>
  * }}}
  *
  * Exit contract: prints one JSON status line (days, rows, distinct
  * estimate over the whole table — the numbers an operator eyeballs
  * against yesterday's) and exits non-zero when the build covers zero
  * days, so an empty source pages instead of "succeeding". The write
  * replaces the store atomically per day partition
  * ([[PartitionedStore.overwritePartitions]]) — a concurrent reader
  * never sees a half-written table. */
object SketchMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SketchMain <eventsDir> <storeDir>")
    val (eventsDir, storeDir) = (args(0), args(1))
    val spark = SparkSession.builder()
      .appName("graft-sketch-build")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // exit decision AFTER the finally: System.exit doesn't unwind, so
    // calling it inside try would skip spark.stop()
    val emptyBuild =
      try {
        val daily = SketchTable.buildDaily(graft.Tables.events(spark, eventsDir))
          .persist()
        val days = daily.count()
        val (rows, users) =
          if (days == 0L) (0L, 0L) // nothing to write; a dynamic
          // overwrite of zero partitions would leave no store to read
          else {
            PartitionedStore.overwritePartitions(daily, storeDir, Seq("day"))
            val stats = spark.read.parquet(storeDir)
              .agg(sum(col("n")).as("rows"),
                hll_sketch_estimate(
                  hll_union_agg(col("users_sketch"), lit(false))).as("users"))
              .collect()(0)
            (stats.getLong(0), stats.getLong(1))
          }
        println(s"""{"job":"sketch_build","days":$days,"rows":$rows,""" +
          s""""est_users":$users}""")
        days == 0L
      } finally spark.stop()
    if (emptyBuild) sys.exit(2)
  }
}
