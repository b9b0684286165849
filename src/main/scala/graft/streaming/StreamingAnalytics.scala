package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  case class CardTx(card: String, ts: java.sql.Timestamp, cents: Long)
  case class CardState(n: Long, cents: Long)
  case class VelocityAlert(card: String, n_tx: Long, total_usd: Double,
                           at: java.sql.Timestamp)

  /** Custom keyed state via `flatMapGroupsWithState` (SURVEY §2.11
    * extended surface): a per-card spending-velocity monitor that emits
    * an alert row each time a card's RUNNING lifetime total crosses
    * another `thresholdUsd` boundary — logic no windowed aggregation
    * expresses, because the state (cumulative cents + count) lives
    * across micro-batches and arbitrary gaps.
    *
    * Semantics/scale notes:
    *  - amounts are tracked in integer cents (exact, order-independent
    *    once per-group order is fixed); within an invocation rows are
    *    processed in deterministic (ts, cents) order;
    *  - ARRIVAL-ORDER CAVEAT: the (ts, cents) sort is per micro-batch
    *    only. A late-but-within-watermark row landing in a LATER trigger
    *    folds into the running total after rows it precedes in event
    *    time, so `n_tx`/`at` on boundary alerts reflect arrival order
    *    across batches (the cumulative TOTAL is unaffected — addition
    *    commutes). Exact event-time replay would require buffering rows
    *    in state until the watermark passes them; this operator trades
    *    that latency/state cost away, like most production velocity
    *    monitors. The batch twin (`tx12`) is fully event-time ordered;
    *  - state is ONE small record per card, expired by an event-time
    *    timeout `stateGapMs` past the card's latest activity (clamped
    *    above the current watermark, which Spark requires) — idle cards
    *    cost nothing forever;
    *  - in batch mode the same function runs with empty initial state
    *    and no timeouts, so StreamingStateSpec uses an independent
    *    window-based batch formulation as the oracle. */
  def velocityAlerts(enriched: DataFrame, thresholdUsd: Long = 1000L,
                     watermarkDelay: String = "10 minutes",
                     stateGapMs: Long = 30L * 60 * 1000): Dataset[VelocityAlert] = {
    val spark = enriched.sparkSession
    import spark.implicits._
    val thresholdCents = thresholdUsd * 100L
    enriched
      .withWatermark("transaction_date", watermarkDelay)
      .select(col("Card").as("card"), col("transaction_date").as("ts"),
        (col("Amount_USD").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .where(col("card").isNotNull && col("ts").isNotNull && col("cents").isNotNull)
      .as[CardTx]
      .groupByKey(_.card)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (card: String, rows: Iterator[CardTx], state: GroupState[CardState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(CardState(0L, 0L))
            val out = Seq.newBuilder[VelocityAlert]
            var maxTs = 0L
            rows.toArray.sortBy(r => (r.ts.getTime, r.cents)).foreach { r =>
              val boundariesBefore = st.cents / thresholdCents
              st = CardState(st.n + 1, st.cents + r.cents)
              if (st.cents / thresholdCents > boundariesBefore)
                out += VelocityAlert(card, st.n, st.cents / 100.0, r.ts)
              maxTs = math.max(maxTs, r.ts.getTime)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs()) + stateGapMs)
            out.result().iterator
          }
      }
  }

  /** Stream-stream interval join (SURVEY §2.11 extended surface): each
    * valid transaction matched to error-stream rows of the SAME card
    * within ± the interval — the cross-stream correlation (was a clean
    * transaction bracketed by technical glitches?) that needs join
    * state on BOTH sides. Watermarks on both inputs let Spark discard
    * buffered rows older than the interval + delay, so state is bounded
    * by (delay + interval) of stream history, not the stream's life.
    * Inner join ⇒ results stream out as matches arrive; batch mode runs
    * the identical plan as a plain interval equi-join (the oracle). */
  def errorCorrelation(valid: DataFrame, errors: DataFrame,
                       intervalMinutes: Int = 60,
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    val v = valid
      .select(col("Card").as("v_card"), col("transaction_date").as("v_ts"),
        col("Amount_USD").as("v_usd"))
      .withWatermark("v_ts", watermarkDelay)
    val e = errors
      .select(col("Card").as("e_card"), col("transaction_date").as("e_ts"),
        col("Errors").as("e_error"))
      .withWatermark("e_ts", watermarkDelay)
    v.join(e, expr(
      s"""v_card = e_card AND
         |e_ts BETWEEN v_ts - INTERVAL $intervalMinutes MINUTES
         |         AND v_ts + INTERVAL $intervalMinutes MINUTES""".stripMargin))
  }

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
