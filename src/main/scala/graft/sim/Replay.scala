package graft.sim

import graft.streaming.TransactionParser
import graft.tx.Enrichment
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The producer/replay equivalent of the reference's POS simulator
  * (SURVEY §3.2, pos/pos_simulator.py:162–205): replays a raw 15-column
  * transaction CSV as keyed JSON messages, preserving the producer's
  * two semantic quirks exactly:
  *
  *  1. `Year/Month/Day` are OVERWRITTEN with the send date before the
  *     timestamp is synthesized (pos_simulator.py:124–128), so the
  *     emitted timestamp carries the send date + the historical CSV
  *     time-of-day (`Time` stays untouched — SURVEY §7.4).
  *  2. Messages are keyed by `Card` for per-card partition ordering
  *     (pos_simulator.py:122).
  *
  * Instead of a Kafka broker this emits micro-batch text files a
  * `readStream.text` source tails — the same message bytes the Kafka
  * value would carry, so [[graft.streaming.Pipeline.jsonFileSource]]
  * consumes replay output unchanged. Pacing is per-batch (`sleepMs`
  * between emissions) rather than the reference's 1–5 s random per-row
  * sleep — deterministic by design, since tests and harness contexts
  * forbid runtime randomness; the send date is injected for the same
  * reason.
  */
object Replay {

  /** Producer-side message transform: overwrite date parts, synthesize
    * the ISO timestamp (P18), serialize keyed by Card. */
  def toMessages(csvRaw: DataFrame, sendDate: Column): DataFrame = {
    val overwritten = csvRaw
      .withColumn("Year", year(sendDate))
      .withColumn("Month", month(sendDate))
      .withColumn("Day", dayofmonth(sendDate))
    TransactionParser.toJsonValue(
      Enrichment.withSynthesizedTimestamp(overwritten, sendDate.cast("timestamp")))
  }

  /** Replay the corpus into `dir` as `numBatches` sequential text files
    * (one emission each, `sleepMs` apart), in deterministic (Card, Time)
    * order — the single-stream paced emission the reference simulates.
    * Returns the number of messages sent. */
  def replayToDir(csvRaw: DataFrame, dir: String, sendDate: Column,
                  numBatches: Int = 5, sleepMs: Long = 0): Long = {
    val keyed = toMessages(csvRaw, sendDate)
      // Deliberately UNpartitioned window (the repo's only one, so Spark's
      // WindowExec single-partition warning is expected here): the
      // producer simulates the reference's single totally-ordered POS
      // stream, so a global order is the semantics, and the corpus is
      // producer-sized (the 123-row golden sample), never warehouse-sized.
      .withColumn("batch",
        ntile(numBatches).over(Window.orderBy(col("key"), col("value"))))
      .cache()
    try {
      val total = keyed.count()
      (1 to numBatches).foreach { b =>
        keyed.filter(col("batch") === b).select("value")
          .coalesce(1).write.mode("append").text(dir)
        if (sleepMs > 0) Thread.sleep(sleepMs)
      }
      total
    } finally keyed.unpersist()
  }
}
