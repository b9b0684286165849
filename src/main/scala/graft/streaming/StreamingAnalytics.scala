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

  /** Q1 live, SLIDING variant: hopping event-time windows
    * (`window(ts, windowDur, slide)`) — the smooth-trend view tumbling
    * windows cannot give (a burst at :59 splits across two tumbling
    * hours; a 1h/15m hop sees it whole in four overlapping frames).
    * Each event lands in exactly windowDur/slide windows, so streaming
    * state holds that many open rows per group key instead of one —
    * the watermark still evicts every window whose end passes, keeping
    * state proportional to (windows open within the delay), not stream
    * life. Same batch≡streaming plan property as [[hourlyTraffic]];
    * StreamingAnalyticsSpec oracles it and asserts the per-event
    * window multiplicity. */
  def slidingTraffic(enriched: DataFrame,
                     windowDur: String = "1 hour",
                     slide: String = "15 minutes",
                     watermarkDelay: String = "10 minutes"): DataFrame =
    enriched
      .withWatermark("transaction_date", watermarkDelay)
      .groupBy(window(col("transaction_date"), windowDur, slide).as("w"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("Amount_USD").cast("decimal(18,2)")).as("usd_total"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("n"),
        col("usd_total").cast("double").as("usd_total"))

  /** CHAINED windowed aggregation — TWO stateful window aggregates in
    * ONE streaming query (the multiple-stateful-operator class Spark
    * supports since 3.4, append mode only): quarter-hour partials roll
    * up into hourly rows carrying the PEAK quarter's count — intra-hour
    * structure a single hourly aggregation cannot compute, and a
    * two-query pipeline could only compute with an intermediate sink.
    * `window(col, …)` accepts the upstream window STRUCT as its time
    * column, so the second aggregate groups finalized 15-min windows
    * into their enclosing hour.
    *
    * Scale/state: stage 1 holds one row per open quarter-hour, stage 2
    * one row per open hour; the single watermark drives both — an
    * hourly row emits once the watermark passes the hour end, by which
    * point all four quarters are final. In batch mode both windows are
    * ordinary grouping expressions, so the batch run of the same plan
    * is the spec's oracle. */
  def chainedTraffic(enriched: DataFrame,
                     watermarkDelay: String = "10 minutes"): DataFrame =
    enriched
      .withWatermark("transaction_date", watermarkDelay)
      .groupBy(window(col("transaction_date"), "15 minutes").as("w15"))
      .agg(
        count(lit(1)).as("n15"),
        sum(col("Amount_USD").cast("decimal(18,2)")).as("usd15"))
      .groupBy(window(col("w15"), "1 hour").as("w"))
      .agg(
        sum(col("n15")).as("n"),
        sum(col("usd15")).as("usd_total"),
        max(col("n15")).as("peak_quarter_n"))
      .select(col("w.start").as("hour_start"), col("n"),
        col("usd_total").cast("double").as("usd_total"),
        col("peak_quarter_n"))

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
  /** Folded running totals plus the not-yet-final rows held back until
    * the watermark passes them. */
  case class CardState(n: Long, cents: Long, buf: Seq[CardTx])
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
    *  - amounts are tracked in integer cents (exact);
    *  - OUT-OF-ORDER SAFE: rows are BUFFERED in state until the
    *    watermark passes their event time, then folded into the running
    *    total in exact (ts, cents) event-time order — so a
    *    late-but-within-watermark row arriving in a LATER trigger still
    *    folds in its event-time position and boundary alerts (`n_tx`,
    *    `at`) match the batch twin (`tx12`) exactly. The price is the
    *    standard watermark trade: alerts trail event time by the
    *    watermark delay, and state additionally holds the last delay's
    *    worth of rows per card (bounded by delay × per-card rate).
    *    Spark itself drops rows later than the watermark before they
    *    reach the function (EventTimeTimeout implies late-row
    *    filtering), so the fold never sees a row older than one it
    *    already applied;
    *  - the event-time timeout `stateGapMs` past the card's latest
    *    activity (clamped above the current watermark, which Spark
    *    requires) FLUSHES the remaining buffer — every buffered row is
    *    older than the fired watermark by construction, so the flush is
    *    the eviction-driven final emission, then state is dropped and
    *    idle cards cost nothing forever;
    *  - in batch mode `withWatermark` is a no-op and there IS no
    *    watermark (`getCurrentWatermarkMs` throws), so every row is
    *    treated as final: the single per-group invocation folds the
    *    whole group in event-time order — the fully-ordered batch
    *    semantics. StreamingStateSpec oracles both arrival orders
    *    against an independent cumulative-window formulation. */
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
          // fold rows the watermark has finalized, in event-time order
          def fold(st0: CardState, ripe: Seq[CardTx])
              : (CardState, Seq[VelocityAlert]) = {
            var n = st0.n; var cents = st0.cents
            val out = Seq.newBuilder[VelocityAlert]
            ripe.sortBy(r => (r.ts.getTime, r.cents)).foreach { r =>
              val boundariesBefore = cents / thresholdCents
              n += 1; cents += r.cents
              if (cents / thresholdCents > boundariesBefore)
                out += VelocityAlert(card, n, cents / 100.0, r.ts)
            }
            (CardState(n, cents, Seq.empty), out.result())
          }
          if (state.hasTimedOut) {
            // wm > maxTs + gap ≥ every buffered row: all final — flush
            val st = state.getOption.getOrElse(CardState(0L, 0L, Seq.empty))
            val (_, alerts) = fold(st.copy(buf = Seq.empty), st.buf)
            state.remove()
            alerts.iterator
          } else {
            val st = state.getOption.getOrElse(CardState(0L, 0L, Seq.empty))
            // batch mode: no watermark exists — every row is final
            val wm = scala.util.Try(state.getCurrentWatermarkMs())
              .getOrElse(Long.MaxValue)
            val all = st.buf ++ rows
            val (ripe, hold) = all.partition(_.ts.getTime < wm)
            val (folded, alerts) = fold(st.copy(buf = Seq.empty), ripe)
            state.update(CardState(folded.n, folded.cents, hold))
            if (wm != Long.MaxValue) {
              val maxTs = all.foldLeft(0L)((m, r) => math.max(m, r.ts.getTime))
              state.setTimeoutTimestamp(math.max(maxTs, wm) + stateGapMs)
            }
            alerts.iterator
          }
      }
  }

  case class Milestone(card: String, n_tx: Long, at: java.sql.Timestamp)

  /** Per-card transaction-count MILESTONES on the MODERN arbitrary
    * state API (`transformWithState` + [[MilestoneProcessor]]) — the
    * Spark 4 replacement for `flatMapGroupsWithState` that
    * [[velocityAlerts]] uses: state is named, schema'd, state-store
    * managed (RocksDB provider required), not an opaque user blob,
    * which is what unlocks state TTL, re-scaling, and the state reader
    * at 100 TB. Emits one row each time a card's cumulative
    * valid-transaction count crosses a multiple of `k` (the "every 5th
    * transaction earns a reward" shape).
    *
    * OUT-OF-ORDER SAFE like [[velocityAlerts]], expressed in the modern
    * API's vocabulary: a `ListState` buffers rows until the watermark
    * finalizes them (`TimeMode.EventTime`, so the input needs the
    * watermark this method sets), folds happen in exact (ts, cents)
    * event-time order, and a per-card event-time TIMER at
    * latest-activity + `stateGapMs` flushes the tail. The counter
    * itself lives in a `ValueState[Long]` and is never expired — a
    * returning card resumes its lifetime count. */
  def milestoneAlerts(enriched: DataFrame, k: Long = 5L,
                      watermarkDelay: String = "10 minutes",
                      stateGapMs: Long = 30L * 60 * 1000): Dataset[Milestone] = {
    val spark = enriched.sparkSession
    import spark.implicits._
    enriched
      .withWatermark("transaction_date", watermarkDelay)
      .select(col("Card").as("card"), col("transaction_date").as("ts"),
        (col("Amount_USD").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .where(col("card").isNotNull && col("ts").isNotNull && col("cents").isNotNull)
      .as[CardTx]
      .groupByKey(_.card)
      .transformWithState(new MilestoneProcessor(k, stateGapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  /** The [[milestoneAlerts]] state machine: a ValueState lifetime
    * counter + a ListState watermark buffer per card. Rows fold only
    * once the watermark passes them (event-time order within the
    * finalized set); a timer re-registered at each batch's
    * latest-activity + gap flushes whatever the watermark has finalized
    * by then. A stale timer firing early is harmless: the expiry
    * handler also folds only watermark-finalized rows and re-arms if a
    * buffer remains. */
  class MilestoneProcessor(k: Long, stateGapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, CardTx, Milestone] {
    import org.apache.spark.sql.streaming.{ListState, TimerValues, ValueState}
    @transient private var count: ValueState[Long] = _
    @transient private var buf: ListState[CardTx] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      buf = getHandle.getListState[CardTx]("buf",
        org.apache.spark.sql.Encoders.product[CardTx],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    /** Fold watermark-finalized rows into the counter; hold the rest. */
    private def drain(card: String, incoming: Seq[CardTx],
                      timerValues: TimerValues): Iterator[Milestone] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val all = buf.get().toSeq ++ incoming
      val (ripe, hold) = all.partition(_.ts.getTime < wm)
      var c = if (count.exists()) count.get() else 0L
      val out = Seq.newBuilder[Milestone]
      ripe.sortBy(r => (r.ts.getTime, r.cents)).foreach { r =>
        c += 1
        if (c % k == 0) out += Milestone(card, c, r.ts)
      }
      count.update(c)
      if (hold.isEmpty) buf.clear() else buf.put(hold.toArray)
      if (hold.nonEmpty || incoming.nonEmpty) {
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        val maxTs = all.foldLeft(0L)((m, r) => math.max(m, r.ts.getTime))
        getHandle.registerTimer(math.max(maxTs, wm) + stateGapMs)
      }
      out.result().iterator
    }
    override def handleInputRows(card: String, rows: Iterator[CardTx],
        timerValues: TimerValues): Iterator[Milestone] =
      drain(card, rows.toSeq, timerValues)
    override def handleExpiredTimer(card: String, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[Milestone] =
      drain(card, Seq.empty, timerValues)
  }

  // `ts` rides along unused by the fold: the watermark's event-time
  // column must survive into the stateful operator's input schema
  case class FunnelEvent(user_id: Long, event_type: String,
                         ts: java.sql.Timestamp, us: Long)
  case class FunnelState(t1: Long, t2: Long, done: Boolean)
  case class FunnelHit(user_id: Long, t1_us: Long, t2_us: Long, t3_us: Long)

  /** Streaming CONVERSION FUNNEL — the live twin of the batch
    * `ea18_funnel`: a per-user state machine over an events stream
    * (user_id, event_type, ts) that emits one row the moment a user
    * completes view → click-within-window → purchase-within-window,
    * with each stage anchored to the FIRST qualifying event (= the
    * batch query's min-aggregate chain under in-order delivery).
    *
    * Semantics/scale notes:
    *  - timestamps are tracked as exact microsecond longs (Spark's
    *    native timestamp precision), so stage-window comparisons are
    *    bit-identical to the batch twin's;
    *  - rows sort (us, event_type) within an invocation: ties process
    *    click < purchase < view, which matches the batch chain's
    *    STRICT ts inequalities at every stage;
    *  - state is ONE tiny record per user (two stage anchors + a done
    *    flag), expired by an event-time timeout past the user's latest
    *    activity (clamped above the watermark) — a converted or idle
    *    user costs nothing forever; a user who re-appears after
    *    eviction starts a fresh funnel, standard monitor semantics;
    *  - ARRIVAL-ORDER CAVEAT: a late-but-within-watermark event folding
    *    into a LATER trigger is applied after already-processed
    *    later-timestamped events, so a late first-view can be missed as
    *    an anchor. [[velocityAlerts]] shows the exact event-time-replay
    *    alternative (buffer in state until the watermark passes); this
    *    monitor keeps the low-latency trade because a funnel anchor
    *    emitted early is actionable while a velocity total is not. */
  def funnelConversions(events: DataFrame, windowHours: Int = 24,
                        watermarkDelay: String = "10 minutes",
                        stateGapMs: Long = 48L * 3600 * 1000): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val winUs = windowHours.toLong * 3600L * 1000000L
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("us"))
      .where(col("user_id").isNotNull && col("us").isNotNull)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L, done = false))
            val out = Seq.newBuilder[FunnelHit]
            var maxUs = Long.MinValue
            rows.toArray.sortBy(r => (r.us, r.event_type)).foreach { r =>
              maxUs = math.max(maxUs, r.us)
              if (!st.done) {
                if (st.t1 < 0) {
                  if (r.event_type == "view") st = st.copy(t1 = r.us)
                } else if (st.t2 < 0) {
                  if (r.event_type == "click" && r.us > st.t1 && r.us <= st.t1 + winUs)
                    st = st.copy(t2 = r.us)
                } else if (r.event_type == "purchase" && r.us > st.t2 &&
                    r.us <= st.t2 + winUs) {
                  out += FunnelHit(uid, st.t1, st.t2, r.us)
                  st = st.copy(done = true)
                }
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(maxUs / 1000, state.getCurrentWatermarkMs()) + stateGapMs)
            out.result().iterator
          }
      }
      .select(col("user_id"),
        timestamp_micros(col("t1_us")).as("t1"),
        timestamp_micros(col("t2_us")).as("t2"),
        timestamp_micros(col("t3_us")).as("t3"))
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

  /** LEFT-OUTER stream-stream interval join — [[errorCorrelation]]'s
    * audit-complete sibling: every valid transaction appears exactly
    * once per matching error row, OR once with null error columns when
    * no error bracketed it. The outer semantics are the genuinely
    * different state machine: an unmatched left row cannot emit until
    * the RIGHT watermark has passed its whole interval (only then is
    * "no match" a fact, not "not yet"), so null rows trail matched rows
    * by the watermark delay, and rows near the stream's end stay
    * buffered until a later batch advances the watermark past them —
    * the eviction-driven emission StreamingStateSpec drives with an
    * explicit watermark-advancing flush batch. Batch mode runs the
    * identical plan as a plain left-outer interval join (the oracle for
    * every row the watermark released). */
  def errorCorrelationOuter(valid: DataFrame, errors: DataFrame,
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
         |         AND v_ts + INTERVAL $intervalMinutes MINUTES""".stripMargin),
      "left_outer")
  }

  /** A static city-tier dimension derived from a BATCH frame — the
    * slowly-changing lookup side for [[cityTierTraffic]]. Deterministic
    * rule (name length) so every engine/re-run builds the same dim. */
  def cityTiers(batch: DataFrame): DataFrame =
    batch.select(col("Merchant_City")).distinct()
      .withColumn("tier",
        when(length(col("Merchant_City")) >= 8, "long").otherwise("short"))

  /** STREAM-STATIC dimension join: the live stream enriched against a
    * bounded batch-side dimension, then aggregated per tier. Unlike the
    * stream-stream [[errorCorrelation]], the static side needs no
    * watermark and builds NO join state — Spark re-plans the static
    * side per micro-batch and (with the explicit hint) broadcasts it,
    * so each batch pays one hash-map build of dimension size. That is
    * exactly the 100 TB warehouse shape: a fact stream decorated by a
    * dimension that fits an executor, join state zero, agg state one
    * row per group. For a dimension that mutates mid-stream, re-read it
    * inside `foreachBatch` instead (the per-batch rate refresh in
    * [[Pipeline]] shows that pattern); a plain stream-static join
    * resolves the static plan once per batch from the SAME source, so
    * file-backed updates are picked up, but a cached/derived frame like
    * this one stays frozen — which is the semantics a tier lookup
    * wants. Batch mode degenerates to an ordinary broadcast join:
    * StreamingAnalyticsSpec oracles streaming against batch and asserts
    * the BroadcastHashJoin. */
  def cityTierTraffic(enriched: DataFrame, cityDim: DataFrame): DataFrame =
    enriched
      .join(broadcast(cityDim), Seq("Merchant_City"), "left")
      .groupBy(coalesce(col("tier"), lit("unknown")).as("tier"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("Amount_USD").cast("decimal(18,2)")).as("usd_total"))
      .select(col("tier"), col("n"),
        col("usd_total").cast("double").as("usd_total"))

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
