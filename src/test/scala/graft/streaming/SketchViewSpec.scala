package graft.streaming

import graft.{SparkSpec, Tables}
import graft.sync.SketchTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming sketch view must equal the batch-built sketch table
  * over everything ingested so far after EVERY incremental run, and a
  * replayed completed batch must be a no-op (the additive measures
  * would otherwise double). */
class SketchViewSpec extends SparkSpec {

  /** (day, estimates, n, value_total) normal form — HLL binaries
    * differ by merge order, estimates must not (and the quantile
    * sample's merge is exactly associative, so p50 compares equal
    * too). */
  private def normal(daily: DataFrame): DataFrame =
    daily.select(col("day"),
      hll_sketch_estimate(col("users_sketch")).as("est"),
      call_function("qsample_quantile", col("value_sketch"), lit(0.5))
        .as("p50"),
      col("n"), col("value_total").cast("double").as("v"))

  private def assertSame(store: String, sourceSoFar: DataFrame): Unit = {
    val got = normal(spark.read.parquet(store))
    val want = normal(SketchTable.buildDaily(sourceSoFar))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("view equals the batch-built sketch table across incremental runs; replay is a no-op") {
    val root = Files.createTempDirectory("graft-skv").toString
    val (inDir, store, ckpt) = (s"$root/in", s"$root/store", s"$root/ckpt")
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("event_id"), col("value"))
      .withColumn("h", pmod(xxhash64(col("user_id")), lit(2)))
      .cache()
    val half0 = ev.filter(col("h") === 0).drop("h").cache()
    val half1 = ev.filter(col("h") === 1).drop("h")
    half0.coalesce(1).write.mode("append").parquet(inDir)

    def run(): Unit = {
      val src = spark.readStream.schema(half0.schema).parquet(inDir)
      val q = SketchView.startDailySketchView(src, store, ckpt)
      q.awaitTermination()
    }
    // run 1: half the corpus
    run()
    assertSame(store, spark.read.parquet(inDir))

    // run 2: append the rest; checkpoint processes ONLY the new file,
    // yet the store equals the full batch build — stored partials merge
    half1.coalesce(1).write.mode("append").parquet(inDir)
    run()
    assertSame(store, spark.read.parquet(inDir))

    // replaying an already-committed batch (restart re-delivery) must
    // not double the additive measures
    val before = normal(spark.read.parquet(store)).collect().toSet
    assert(!SketchView.mergeBatch(half0, 0L, store)) // reports the no-op
    val after = normal(spark.read.parquet(store)).collect().toSet
    assert(after === before)

    // kill-between-write-and-marker: deleting a committed batch's
    // marker reproduces the exact on-disk state of a crash AFTER the
    // store write but BEFORE the marker write. The replay must
    // reconcile off the per-day last_batch stamps — merge nothing,
    // re-create the marker (reporting that it committed), and leave
    // every measure untouched
    assert(new java.io.File(s"$store/_committed/1").delete(),
      "batch 1's marker must exist to simulate the crash")
    assert(SketchView.mergeBatch(half1, 1L, store)) // completes the commit
    val recovered = normal(spark.read.parquet(store)).collect().toSet
    assert(recovered === before, "crash replay must not double-merge")
    assert(!SketchView.mergeBatch(half1, 1L, store)) // marker restored

    // sanity: the guard is what protected it — an unguarded re-merge of
    // the same rows WOULD have changed the table
    assert(SketchView.mergeBatch(half0, 999L, store))
    val doubled = normal(spark.read.parquet(store)).collect().toSet
    assert(doubled !== before)
    ev.unpersist(); half0.unpersist()
    ()
  }
}
