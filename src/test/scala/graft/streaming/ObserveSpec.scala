package graft.streaming

import graft.SparkSpec
import graft.tx.{Enrichment, RawTransactions, Splitter}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The observe() counters must equal independent full-scan counts — in
  * batch via the Observation handle, in streaming via the query's
  * per-batch observedMetrics — while leaving the observed rows
  * untouched. */
class ObserveSpec extends SparkSpec {

  private val pinnedClock = to_timestamp(lit("2024-06-01 00:00:00"))

  private lazy val enrichedBatch =
    Enrichment.enrich(RawTransactions.fromEvents(spark, sf),
      Enrichment.DefaultRate, pinnedClock).cache()

  test("batch observation reports the exact bucket counts of the scan it rode") {
    val obs = Observation("buckets")
    val out = enrichedBatch.observe(obs, Observe.bucketMetricCols.head,
      Observe.bucketMetricCols.tail: _*)
    val rows = out.count() // the action the metrics ride on
    val m = obs.get
    assert(m("n_total") === rows)
    assert(m("n_error") === Splitter.errors(enrichedBatch).count())
    assert(m("n_fraud") === Splitter.fraud(enrichedBatch).count())
    assert(m("n_valid") === Splitter.valid(enrichedBatch).count())
    assert(m("n_invalid") === Splitter.invalid(enrichedBatch).count())
    // overlap semantics: the four buckets intentionally over-count the total
    assert(m("n_error").asInstanceOf[Long] + m("n_fraud").asInstanceOf[Long] +
      m("n_valid").asInstanceOf[Long] + m("n_invalid").asInstanceOf[Long]
      >= rows)
  }

  test("streaming observedMetrics accumulate to the batch totals across micro-batches") {
    val dir = Files.createTempDirectory("graft-obs").toString + "/input"
    val msgs = TransactionParser.toJsonValue(
      RawTransactions.fromEvents(spark, sf)).select("value").cache()
    // two files ⇒ two micro-batches with maxFilesPerTrigger=1
    msgs.limit(100).coalesce(1).write.mode("append").text(dir)
    msgs.coalesce(1).write.mode("append").text(dir)

    val metrics = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val om = e.progress.observedMetrics
        if (om.containsKey("stream_buckets")) {
          val r = om.get("stream_buckets")
          metrics += ((r.getAs[Long]("n_total"), r.getAs[Long]("n_valid")))
        }
      }
      override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val stream = Enrichment.enrich(
        Pipeline.jsonFileSource(spark, dir, maxFilesPerTrigger = Some(1)),
        Enrichment.DefaultRate, pinnedClock)
      val q = Observe.bucketMetrics(stream, "stream_buckets")
        .writeStream.outputMode("append").format("memory")
        .queryName("obs_live").trigger(Trigger.AvailableNow).start()
      q.awaitTermination()
      // listener events deliver asynchronously after termination
      val deadline = System.currentTimeMillis() + 30000
      while (metrics.size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(metrics.size >= 2, "expected per-micro-batch metric events")
      val total = spark.read.text(dir).count()
      assert(metrics.map(_._1).sum === total)
      val expectValid = Splitter.valid(Enrichment.enrich(
        TransactionParser.fromJsonValue(spark.read.text(dir)),
        Enrichment.DefaultRate, pinnedClock)).count()
      assert(metrics.map(_._2).sum === expectValid)
    } finally {
      spark.streams.removeListener(listener)
      msgs.unpersist()
      ()
    }
  }
}
