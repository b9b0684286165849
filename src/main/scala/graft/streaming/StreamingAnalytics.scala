package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming aggregations — the "live" variants of Q1 (busiest hours)
  * and Q5 (rapid consecutive transactions) that SURVEY §2.11 marks as
  * the extended surface beyond the reference's stateless job: event-time
  * tumbling windows and per-user session windows, with watermarks
  * bounding state.
  *
  * Both functions are plan transformers over the enriched frame and work
  * identically in batch mode (`window`/`session_window` are ordinary
  * grouping expressions there) — StreamingAnalyticsSpec exploits that to
  * oracle streaming output against the batch result.
  *
  * State at 100 TB: tumbling-window counts keep one row per (window)
  * group; session state is per (user, open session) and is dropped once
  * the watermark passes the session gap — the watermark delay is the
  * knob bounding both state size and result lateness.
  */
object StreamingAnalytics {

  /** Q1 live: per-hour traffic + value over event time. Watermark only
    * binds in streaming append mode; harmless in batch. */
  def hourlyTraffic(enriched: DataFrame,
                    watermarkDelay: String = "10 minutes"): DataFrame =
    enriched
      .withWatermark("transaction_date", watermarkDelay)
      .groupBy(window(col("transaction_date"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("Amount_USD").cast("decimal(18,2)")).as("usd_total"))
      .select(col("w.start").as("hour_start"), col("n"),
        col("usd_total").cast("double").as("usd_total"))

  /** Streaming exact dedup: drop re-deliveries of the same (Card,
    * timestamp) — the at-least-once Kafka producer's duplicate shape —
    * with state bounded by the watermark (a duplicate arriving later
    * than the delay is passed through; unbounded keep-all state is not
    * an option on an infinite stream). Works in batch mode too, where
    * it degenerates to a plain dropDuplicates. */
  def dedupStream(enriched: DataFrame,
                  watermarkDelay: String = "10 minutes"): DataFrame =
    enriched
      .withWatermark("transaction_date", watermarkDelay)
      .dropDuplicatesWithinWatermark("Card", "timestamp")

  /** Q5 live: gap-based per-user sessions; sessions with ≥ minEvents
    * events are the streaming form of the rapid-consecutive-transaction
    * detector (requirements.md:47). */
  def userSessions(enriched: DataFrame,
                   gap: String = "5 minutes",
                   watermarkDelay: String = "10 minutes",
                   minEvents: Long = 2): DataFrame =
    enriched
      .withWatermark("transaction_date", watermarkDelay)
      .groupBy(col("User"), session_window(col("transaction_date"), gap).as("s"))
      .agg(
        count(lit(1)).as("n_tx"),
        sum(col("Amount_USD").cast("decimal(18,2)")).as("usd_total"))
      .filter(col("n_tx") >= minEvents)
      .select(col("User"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_tx"),
        col("usd_total").cast("double").as("usd_total"))
}
