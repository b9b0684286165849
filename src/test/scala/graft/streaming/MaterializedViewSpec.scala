package graft.streaming

import graft.SparkSpec
import graft.tx.{Enrichment, RawTransactions, Splitter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The materialized view must equal the batch aggregate of everything
  * ingested so far after EVERY incremental run, with the second run
  * processing only the new file (checkpoint) and upserting only its
  * changed groups. */
class MaterializedViewSpec extends SparkSpec {

  private val pinnedClock = to_timestamp(lit("2024-06-01 00:00:00"))

  private def batchAggregate(inputDir: String): DataFrame =
    Splitter.valid(Enrichment.enrich(
        TransactionParser.fromJsonValue(spark.read.text(inputDir)),
        Enrichment.DefaultRate, pinnedClock))
      .groupBy(col("Merchant_Name").as("merchant"))
      .agg(count(lit(1)).as("n_tx"),
        sum(col("Amount_USD").cast("decimal(18,2)")).cast("double").as("usd_total"))

  test("view stays equal to the batch aggregate across incremental runs") {
    val root = Files.createTempDirectory("graft-mv").toString
    val (inDir, store, ckpt) = (s"$root/in", s"$root/store", s"$root/ckpt")
    val msgs = TransactionParser.toJsonValue(
      RawTransactions.fromEvents(spark, sf)).select("value").cache()
    val ts = msgs // deterministic halves by line hash
      .withColumn("h", pmod(xxhash64(col("value")), lit(2)))
    ts.filter(col("h") === 0).select("value")
      .coalesce(1).write.mode("append").text(inDir)

    def run(): Unit = {
      val q = MaterializedView.startMerchantView(
        Enrichment.enrich(Pipeline.jsonFileSource(spark, inDir),
          Enrichment.DefaultRate, pinnedClock),
        store, ckpt)
      q.awaitTermination()
    }
    // run 1: half the corpus
    run()
    val view1 = MaterializedView.readStore(spark, store).drop("bucket")
    val expect1 = batchAggregate(inDir)
    // materialize NOW: view1's plan points at files run 2 will replace
    val view1Rows = view1.count()
    assert(view1Rows > 0)
    assert(view1.exceptAll(expect1).count() === 0)
    assert(expect1.exceptAll(view1).count() === 0)

    // run 2: append the second half; the checkpoint makes the stream
    // process ONLY the new file, yet the store must equal the full
    // batch aggregate — cumulative state + replace-by-key upsert
    ts.filter(col("h") === 1).select("value")
      .coalesce(1).write.mode("append").text(inDir)
    run()
    val view2 = MaterializedView.readStore(spark, store).drop("bucket")
    val expect2 = batchAggregate(inDir)
    assert(view2.count() >= view1Rows)
    assert(view2.exceptAll(expect2).count() === 0)
    assert(expect2.exceptAll(view2).count() === 0)
    msgs.unpersist()
    ()
  }

  test("a null-merchant group upserts by replacement, never accumulating") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-mv-null").toString + "/store"
    val d1 = Seq((Option.empty[String], 1L, 10.0), (Some("m1"), 2L, 5.0))
      .toDF("merchant", "n_tx", "usd_total")
    val d2 = Seq((Option.empty[String], 3L, 30.0))
      .toDF("merchant", "n_tx", "usd_total")
    MaterializedView.upsert(d1, 0L, store)
    MaterializedView.upsert(d2, 1L, store) // absolute totals replace the null row
    val rows = MaterializedView.readStore(spark, store).drop("bucket")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(rows === Set((None, 3L), (Some("m1"), 2L)))
  }

  test("kill between data write and manifest rename: the view never loses a bucket") {
    // r7: under dynamic partition overwrite a mid-commit crash could
    // lose a bucket's PREVIOUS files — silent data loss for absolute
    // per-merchant totals. Under the shared manifest protocol the
    // crashed commit's files are invisible, the pre-crash view stays
    // intact, and the replay reaches the uncrashed result.
    import spark.implicits._
    val store = Files.createTempDirectory("graft-mv-crash").toString + "/store"
    val d0 = Seq((Some("m1"), 1L, 10.0), (Some("m2"), 1L, 20.0))
      .toDF("merchant", "n_tx", "usd_total")
    val d1 = Seq((Some("m1"), 2L, 15.0), (Some("m3"), 1L, 7.0))
      .toDF("merchant", "n_tx", "usd_total")
    assert(MaterializedView.upsert(d0, 0L, store))
    val preCrash = MaterializedView.readStore(spark, store).drop("bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    MaterializedView.upsertCrashBeforeManifest(d1, 1L, store)
    val seen = MaterializedView.readStore(spark, store).drop("bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(seen === preCrash, "a crashed commit's files leaked into the view")
    // restart re-delivers batch 1; the replay must land the full merge
    assert(MaterializedView.upsert(d1, 1L, store))
    val recovered = MaterializedView.readStore(spark, store).drop("bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(recovered ===
      Set(("m1", 2L, 15.0), ("m2", 1L, 20.0), ("m3", 1L, 7.0)))
    // and the completed commit replays as a no-op
    assert(!MaterializedView.upsert(d1, 1L, store))
  }
}
