package graft.streaming

import graft.{SparkSpec, Tables}
import graft.sync.SketchTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming sketch view must equal the batch-built sketch table
  * over everything ingested so far after EVERY incremental run, a
  * replayed completed batch must be a no-op (the additive measures
  * would otherwise double), and — the manifest-commit property
  * (VERDICT r6 #4) — a crash at ANY point before the manifest rename
  * must leave the READ PATH on the exact pre-crash store, with the
  * replay reaching the same state as a run that never crashed. */
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
    val got = normal(SketchView.readStore(spark, store))
    val want = normal(SketchTable.buildDaily(sourceSoFar))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  private lazy val halves: (DataFrame, DataFrame) = {
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("event_id"), col("value"))
      .withColumn("h", pmod(xxhash64(col("user_id")), lit(2)))
      .cache()
    (ev.filter(col("h") === 0).drop("h").cache(),
      ev.filter(col("h") === 1).drop("h").cache())
  }

  test("view equals the batch-built sketch table across incremental runs; replay is a no-op") {
    val root = Files.createTempDirectory("graft-skv").toString
    val (inDir, store, ckpt) = (s"$root/in", s"$root/store", s"$root/ckpt")
    val (half0, half1) = halves
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
    val before = normal(SketchView.readStore(spark, store)).collect().toSet
    assert(!SketchView.mergeBatch(half0, 0L, store)) // reports the no-op
    val after = normal(SketchView.readStore(spark, store)).collect().toSet
    assert(after === before)

    // sanity: the manifest ledger is what protected it — an unguarded
    // re-merge of the same rows WOULD have changed the table
    assert(SketchView.mergeBatch(half0, 999L, store))
    val doubled = normal(SketchView.readStore(spark, store)).collect().toSet
    assert(doubled !== before)
  }

  test("kill between data write and manifest rename: readers never see the orphans, replay equals the uncrashed build") {
    val (half0, half1) = halves
    // reference: the build that never crashes
    val refStore = Files.createTempDirectory("graft-skv-ref").toString + "/store"
    assert(SketchView.mergeBatch(half0, 0L, refStore))
    assert(SketchView.mergeBatch(half1, 1L, refStore))
    val wanted = normal(SketchView.readStore(spark, refStore)).collect().toSet

    // crashed build: batch 1's data files land, its manifest never does
    val store = Files.createTempDirectory("graft-skv-crash").toString + "/store"
    assert(SketchView.mergeBatch(half0, 0L, store))
    val preCrash = normal(SketchView.readStore(spark, store)).collect().toSet
    val days = SketchView.mergeBatchCrashBeforeManifest(half1, 1L, store)
    assert(days.nonEmpty, "the doomed commit must have written day files")
    assert(new java.io.File(s"$store/data/b1").exists(),
      "orphan data files must exist on disk for the simulation to mean anything")
    assert(!SketchView.committed(spark, store, 1L))
    // the READ PATH trusts only manifest-listed files: the orphans are
    // invisible and the store still answers with the pre-crash state
    val seen = normal(SketchView.readStore(spark, store)).collect().toSet
    assert(seen === preCrash,
      "a crashed commit's partial files leaked into the read path")

    // restart re-delivers batch 1: the re-merge starts from the
    // manifest-visible (= pre-crash) state, overwrites the orphans,
    // and lands the manifest — byte-equivalent of the uncrashed build
    assert(SketchView.mergeBatch(half1, 1L, store))
    assert(SketchView.committed(spark, store, 1L))
    val recovered = normal(SketchView.readStore(spark, store)).collect().toSet
    assert(recovered === wanted, "crash replay must equal the uncrashed build")
    assertSame(store, half0.unionByName(half1))
    // and the completed commit replays as a no-op
    assert(!SketchView.mergeBatch(half1, 1L, store))
  }

  test("snapshot fold + vacuum: store reads unchanged, folded batch ids still replay as no-ops") {
    import graft.sync.ManifestStore
    val (half0, half1) = halves
    val store = Files.createTempDirectory("graft-skv-snap").toString + "/store"
    assert(SketchView.mergeBatch(half0, 0L, store))
    assert(SketchView.mergeBatch(half1, 1L, store))
    assert(SketchView.mergeBatch(half0, 2L, store))
    val before = normal(SketchView.readStore(spark, store)).collect().toSet

    assert(ManifestStore.snapshot(spark, store) === Some(2L))
    SketchView.vacuum(spark, store) // drops the folded 0/1/2 manifests
    val (snapId, replayed) = ManifestStore.readFootprint(spark, store)
    assert(snapId === Some(2L) && replayed === 0)
    assert(normal(SketchView.readStore(spark, store)).collect().toSet === before,
      "fold + vacuum changed the sketch store read")

    // the folded batches' manifests are GONE, yet a restart re-delivery
    // of batch 2 must still be a no-op — otherwise the additive
    // measures double exactly like the pre-manifest bug
    assert(!SketchView.mergeBatch(half0, 2L, store))
    assert(normal(SketchView.readStore(spark, store)).collect().toSet === before)
    // and the stream continues on top of the fold
    assert(SketchView.mergeBatch(half1, 3L, store))
    assertSame(store, half0.unionByName(half1).unionByName(half0)
      .unionByName(half1))
  }

  test("vacuum deletes only superseded/unreferenced files; reads unchanged, in-flight ids untouched") {
    val (half0, half1) = halves
    val store = Files.createTempDirectory("graft-skv-vac").toString + "/store"
    // batches 0 and 1 cover all days; batch 2 re-merges half0's days
    // (= all days), superseding every b0/b1 file
    assert(SketchView.mergeBatch(half0, 0L, store))
    assert(SketchView.mergeBatch(half1, 1L, store))
    assert(SketchView.mergeBatch(half0, 2L, store))
    // plus an in-flight orphan ABOVE the committed range: a crashed
    // batch 3 the writer will replay — vacuum must not touch it
    SketchView.mergeBatchCrashBeforeManifest(half1, 3L, store)
    val before = normal(SketchView.readStore(spark, store)).collect().toSet
    val (files, dirs) = SketchView.vacuum(spark, store)
    assert(files > 0, "superseded b0/b1 files must be deleted")
    assert(dirs === 2, "b0 and b1 must be fully removed (all days re-owned by b2)")
    assert(!new java.io.File(s"$store/data/b0").exists())
    assert(!new java.io.File(s"$store/data/b1").exists())
    assert(new java.io.File(s"$store/data/b3").exists(),
      "an id above the committed range is an in-flight replay's — untouchable")
    // the read is byte-for-byte untouched, and a second vacuum is a no-op
    val after = normal(SketchView.readStore(spark, store)).collect().toSet
    assert(after === before, "vacuum changed the store read")
    assert(SketchView.vacuum(spark, store) === ((0, 0)))
    // the skipped orphan replays fine afterwards
    assert(SketchView.mergeBatch(half1, 3L, store))
    assertSame(store, half0.unionByName(half1).unionByName(half0)
      .unionByName(half1))
  }
}
