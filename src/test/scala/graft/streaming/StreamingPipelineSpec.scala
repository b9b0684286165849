package graft.streaming

import graft.SparkSpec
import graft.tx.{Enrichment, RawTransactions, Splitter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** STR (SURVEY §2.11): the streaming pipeline must produce exactly the
  * batch pipeline's outputs, because enrichment+split are stateless.
  * Input is the deterministic RawTransactions view serialized to JSON
  * lines (the Kafka message shape, minus the broker), drained with
  * `Trigger.AvailableNow` through the P1–P2 decode path.
  */
class StreamingPipelineSpec extends SparkSpec {

  private val pinnedClock = to_timestamp(lit("2024-06-01 00:00:00"))
  private val rate = Enrichment.DefaultRate

  private lazy val root = Files.createTempDirectory("graft-stream").toString
  private lazy val inputDir = s"$root/input"

  private lazy val raw = RawTransactions.fromEvents(spark, sf)

  /** Batch-side expected buckets over the same rows. */
  private lazy val expected =
    Enrichment.enrich(raw, rate, pinnedClock).cache()

  private def runFanOut(): Pipeline.OutputLayout = {
    TransactionParser.toJsonValue(raw).select("value")
      .coalesce(1).write.mode("overwrite").text(inputDir)
    val layout = Pipeline.OutputLayout(s"$root/fanout")
    val q = Pipeline.startFanOut(
      Pipeline.jsonFileSource(spark, inputDir), layout,
      rate, Trigger.AvailableNow, pinnedClock)
    q.awaitTermination()
    layout
  }

  private lazy val layout = runFanOut()

  test("fan-out streaming run produces the batch pipeline's bucket counts") {
    val validOut = spark.read.parquet(layout.valid)
    val fraudOut = spark.read.parquet(layout.fraud)
    val errorsOut = spark.read.option("header", "true").csv(layout.errors)
    val invalidOut = spark.read.option("header", "true").csv(layout.invalidLog)

    assert(validOut.count() === Splitter.valid(expected).count())
    assert(fraudOut.count() === Splitter.fraud(expected).count())
    assert(errorsOut.count() === Splitter.errors(expected).count())
    assert(invalidOut.count() === Splitter.invalid(expected).count())
  }

  test("streaming valid bucket matches batch values, not just counts") {
    val got = spark.read.parquet(layout.valid)
      .agg(
        sum(col("Amount_USD").cast("decimal(18,2)")).as("usd"),
        countDistinct(col("Card")).as("cards"))
      .collect()(0)
    val want = Splitter.valid(expected)
      .agg(
        sum(col("Amount_USD").cast("decimal(18,2)")).as("usd"),
        countDistinct(col("Card")).as("cards"))
      .collect()(0)
    assert(got === want)
  }

  test("valid sink is partitioned by Year/Month/Day on disk") {
    val topLevel = new java.io.File(layout.valid).list().toSeq
    assert(topLevel.exists(_.startsWith("Year=")))
    val yearDir = new java.io.File(layout.valid,
      topLevel.find(_.startsWith("Year=")).get)
    assert(yearDir.list().exists(_.startsWith("Month=")))
  }

  test("validation log carries exactly the reference's 5-column layout") {
    val invalidOut = spark.read.option("header", "true").csv(layout.invalidLog)
    assert(invalidOut.columns.toSeq === Sinks.validationLogColumns)
    // every logged reason is one of the two reference reasons
    val reasons = invalidOut.select("invalid_reason").distinct()
      .collect().map(_.getString(0)).toSet
    assert(reasons.subsetOf(Set("Invalid Date", "Data format invalid or missing")))
  }

  test("reference-faithful multi-query mode agrees with the fan-out run") {
    val layout2 = Pipeline.OutputLayout(s"$root/multiq")
    val qs = Pipeline.startMultiQuery(
      Pipeline.jsonFileSource(spark, inputDir), layout2,
      rate, Trigger.AvailableNow)
    qs.foreach(_.awaitTermination())
    assert(spark.read.parquet(layout2.valid).count() ===
      spark.read.parquet(layout.valid).count())
    assert(spark.read.option("header", "true").csv(layout2.invalidLog).count() ===
      spark.read.option("header", "true").csv(layout.invalidLog).count())
  }

  test("K1 console sink drains an AvailableNow stream") {
    val q = Sinks.console(
      Pipeline.jsonFileSource(spark, inputDir).select("Card", "Amount"),
      s"$root/_checkpoints/console", Trigger.AvailableNow, truncate = true)
    q.awaitTermination()
    assert(!q.isActive)
  }

  test("checkpoint recovery: a restarted query processes only new files, no duplicates") {
    layout // force the first fan-out run
    val firstCount = spark.read.parquet(layout.valid).count()
    // drop 2 more raw batches into the SAME input dir
    val extra = raw.limit(40)
    TransactionParser.toJsonValue(extra).select("value")
      .coalesce(1).write.mode("append").text(inputDir)
    // restart with the SAME checkpoint: only the new file may be processed
    val q = Pipeline.startFanOut(
      Pipeline.jsonFileSource(spark, inputDir), layout,
      rate, Trigger.AvailableNow, pinnedClock)
    q.awaitTermination()
    val expectedExtra = Splitter.valid(
      Enrichment.enrich(extra, rate, pinnedClock)).count()
    assert(spark.read.parquet(layout.valid).count() === firstCount + expectedExtra)
  }

  test("malformed JSON decodes to all-null rows that drop through every bucket") {
    import spark.implicits._
    val mixed = Seq("this is not json", "{\"Card\": \"oops").toDF("value")
    val enriched = Enrichment.enrich(
      TransactionParser.fromJsonValue(mixed), rate, pinnedClock)
    // PERMISSIVE parse: no crash, rows survive as all-null
    assert(enriched.count() === 2)
    // reference semantics: null User/Card + null Is_Fraud matches NO
    // bucket predicate — malformed messages silently vanish from every
    // sink (there is no dead-letter path; Splitter DROP-THROUGH note)
    assert(Splitter.errors(enriched).count() === 0)
    assert(Splitter.fraud(enriched).count() === 0)
    assert(Splitter.valid(enriched).count() === 0)
    assert(Splitter.invalid(enriched).count() === 0)
  }

  test("per-batch rate refresh: a new day's batch gets the new day's rate") {
    val root2 = Files.createTempDirectory("graft-rates").toString
    val in = s"$root2/in"
    val msgs = TransactionParser.toJsonValue(raw.limit(50)).select("value")
    msgs.coalesce(1).write.mode("append").text(in)

    val days = Iterator(
      java.time.LocalDate.parse("2024-06-01"),
      java.time.LocalDate.parse("2024-06-02"))
    var day = days.next()
    val rates = Map("2024-06-01" -> 25000.0, "2024-06-02" -> 26000.0)
    val layout2 = Pipeline.OutputLayout(s"$root2/out")

    def runOnce(): Unit = {
      val q = Pipeline.startFanOutWithRates(
        Pipeline.jsonFileSource(spark, in), layout2,
        d => rates(d.toString), Trigger.AvailableNow,
        pinnedClock, today = () => day)
      q.awaitTermination()
    }
    runOnce() // day 1
    day = days.next()
    msgs.coalesce(1).write.mode("append").text(in) // next day's traffic
    runOnce() // day 2 — checkpoint skips day 1's files

    val out = spark.read.parquet(layout2.valid)
      .select(col("Exchange_Rate")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(out === Set(25000, 26000))
  }

  test("K5 Kafka message shape round-trips through the P1-P2 decode path") {
    val msgs = TransactionParser.toJsonValue(raw)
    assert(msgs.columns.toSeq === Seq("key", "value")) // keyed by Card
    val back = TransactionParser.fromJsonValue(msgs.select("value"))
    assert(back.columns.toSeq === raw.columns.toSeq)
    def checksum(df: DataFrame) = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    assert(checksum(back) === checksum(raw))
  }

  test("K6 warehouse append enforces the 21-column select order") {
    val wh = s"$root/warehouse"
    Sinks.warehouseAppend(expected, wh)
    Sinks.warehouseAppend(expected, wh) // append semantics
    val out = spark.read.parquet(wh)
    assert(out.columns.toSeq === Enrichment.outputColumns)
    assert(out.count() === expected.count() * 2)
  }
}
