package graft.streaming

import graft.SparkSpec
import graft.tx.{Enrichment, RawTransactions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

/** Event-time aggregation semantics: because `window`/`session_window`
  * are ordinary grouping expressions in batch mode, the batch run of the
  * same plan is the oracle for the streaming run. */
class StreamingAnalyticsSpec extends SparkSpec {

  private val pinnedClock = to_timestamp(lit("2024-06-01 00:00:00"))

  private lazy val inputDir = {
    val dir = Files.createTempDirectory("graft-sa").toString + "/input"
    TransactionParser.toJsonValue(RawTransactions.fromEvents(spark, sf))
      .select("value").coalesce(1).write.text(dir)
    dir
  }

  private def enrichedStream: DataFrame =
    Enrichment.enrich(Pipeline.jsonFileSource(spark, inputDir),
      Enrichment.DefaultRate, pinnedClock)

  private lazy val enrichedBatch: DataFrame =
    Enrichment.enrich(
      TransactionParser.fromJsonValue(spark.read.text(inputDir)),
      Enrichment.DefaultRate, pinnedClock).cache()

  private def drain(df: DataFrame, mode: String, table: String): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(table).trigger(Trigger.AvailableNow).start()
    q.awaitTermination()
    spark.table(table)
  }

  test("streaming hourly traffic (complete mode) equals the batch window aggregation") {
    val live = drain(StreamingAnalytics.hourlyTraffic(enrichedStream),
      "complete", "hourly_live")
    val batch = StreamingAnalytics.hourlyTraffic(enrichedBatch)
    assert(live.count() > 0)
    assert(live.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(live).count() === 0)
  }

  test("streaming sliding windows equal batch and give each event 4× multiplicity") {
    val live = drain(StreamingAnalytics.slidingTraffic(enrichedStream),
      "complete", "sliding_live").cache()
    val batch = StreamingAnalytics.slidingTraffic(enrichedBatch)
    assert(live.count() > 0)
    assert(live.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(live).count() === 0)
    // 1 h window hopping every 15 min ⇒ every event is counted in
    // exactly 4 overlapping windows
    val totalWindowed = live.agg(sum(col("n"))).collect()(0).getLong(0)
    val events = enrichedBatch.filter(col("transaction_date").isNotNull).count()
    assert(totalWindowed === events * 4)
  }

  test("chained window aggregation: hourly rollup of quarter partials equals batch") {
    val live = drain(StreamingAnalytics.chainedTraffic(enrichedStream),
      "append", "chained_live").cache()
    val batch = StreamingAnalytics.chainedTraffic(enrichedBatch).cache()

    // append mode: every emitted hour must be batch-identical
    assert(live.exceptAll(batch).count() === 0)

    // hours closed strictly before the final watermark must all emit
    val maxTs = enrichedBatch.agg(max(col("transaction_date"))).collect()(0)
      .getTimestamp(0)
    val wm = new Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val mustEmit = batch.filter(
      col("hour_start") + expr("INTERVAL 1 HOUR") < lit(wm))
    assert(mustEmit.count() > 0)
    assert(mustEmit.exceptAll(live).count() === 0,
      "a watermark-closed hour was never emitted")

    // the peak quarter is genuinely intra-hour structure: for some hour
    // it differs from n/4 (the flat-traffic value), and it never exceeds n
    assert(batch.filter(col("peak_quarter_n") > col("n")).count() === 0)
    assert(batch.filter(col("peak_quarter_n") * 4 =!= col("n")).count() > 0)
    // cross-check against the single-level hourly aggregation
    val hourly = StreamingAnalytics.hourlyTraffic(enrichedBatch)
    assert(batch.select(col("hour_start"), col("n"), col("usd_total"))
      .exceptAll(hourly).count() === 0)
  }

  test("streaming dedup drops at-least-once redeliveries within the watermark") {
    // duplicate every message: the input dir written twice
    val dupDir = Files.createTempDirectory("graft-dedup").toString + "/in"
    val msgs = spark.read.text(inputDir)
    msgs.coalesce(1).write.mode("append").text(dupDir)
    msgs.coalesce(1).write.mode("append").text(dupDir)

    val stream = Enrichment.enrich(Pipeline.jsonFileSource(spark, dupDir),
      Enrichment.DefaultRate, pinnedClock)
    val live = drain(StreamingAnalytics.dedupStream(stream)
      .select("Card", "timestamp"), "append", "dedup_live")

    val distinctExpected = enrichedBatch.select("Card", "timestamp").distinct()
    assert(live.count() === distinctExpected.count())
    assert(live.exceptAll(distinctExpected).count() === 0)
  }

  test("stream-static tier join equals batch and broadcasts the dimension") {
    val dim = StreamingAnalytics.cityTiers(enrichedBatch).cache()
    val live = drain(StreamingAnalytics.cityTierTraffic(enrichedStream, dim),
      "complete", "tier_live")
    val batch = StreamingAnalytics.cityTierTraffic(enrichedBatch, dim)
    assert(live.count() > 0)
    assert(live.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(live).count() === 0)
    // every stream row is accounted for exactly once (left join + coalesce)
    assert(live.agg(sum(col("n"))).collect()(0).getLong(0) ===
      enrichedBatch.count())
    // the batch twin of the plan must broadcast the dimension side
    assert(batch.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("streaming near-dup gate emits the batch candidate set with zero join state") {
    import spark.implicits._
    import graft.llmdata.Dedup
    // incoming shard: one exact copy of corpus doc 0, one unique doc
    val srcText = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L).collect()(0).getAs[String]("text")
    val shard = Seq((200000L, srcText),
      (200001L, (0 until 60).map(i => s"nv$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-gate").toString + "/in"
    shard.coalesce(1).write.parquet(dir)
    val index = Dedup.corpusBandIndex(spark, sf).cache()
    try {
      val stream = spark.readStream.schema(shard.schema).parquet(dir)
      val live = drain(Dedup.streamingNearDupGate(stream, index),
        "append", "gate_live")
      val batch = Dedup.streamingNearDupGate(shard, index)
      assert(live.count() > 0)
      assert(live.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(live).count() === 0)
      assert(live.filter(col("doc_id") === 200000L && col("corpus_id") === 0L)
        .count() > 0)
      assert(live.filter(col("doc_id") === 200001L).count() === 0)
    } finally { index.unpersist(); () }
  }

  test("streaming EMBEDDING gate: stream = batch, exact copy collides in all 8 bands") {
    import spark.implicits._
    import graft.llmdata.Dedup
    // incoming shard: one exact copy of corpus vector 0's embedding
    val srcVec = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L).collect()(0).getSeq[Float](1)
    val shard = Seq((400000L, srcVec)).toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft-embgate").toString + "/in"
    shard.coalesce(1).write.parquet(dir)
    val index = Dedup.corpusEmbedBandIndex(spark, sf)
    index.keys.cache()
    try {
      val stream = spark.readStream.schema(shard.schema).parquet(dir)
      val live = drain(Dedup.streamingEmbedGate(stream, index),
        "append", "embgate_live")
      // the non-broadcast deployment shape (an index too big to
      // broadcast shuffles on (band, bucket)) must agree exactly
      val batch = Dedup.streamingEmbedGate(shard, index,
        broadcastIndex = false)
      assert(live.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(live).count() === 0)
      // identical vector ⇒ identical sign bits ⇒ every band collides
      assert(live.filter(col("vec_id") === 400000L && col("corpus_id") === 0L)
        .select("band").distinct().count() === 8L)
    } finally { index.keys.unpersist(); () }
  }

  test("streaming EMBEDDING gate at the 10x scale point: shuffle-join deployment, stream = batch (r9 #4)") {
    import graft.llmdata.Dedup
    // the synth10x corpus (20k vectors — the curve's largest scale
    // point) with the index NOT broadcast: the deployment shape an
    // unbroadcastable index actually runs (per-micro-batch equi-join
    // shuffling on (band, bucket)); previously spec-gated only on a
    // 1-row shard at sf0.001
    val dir = Files.createTempDirectory("graft-embgate10x").toString
    graft.tools.SynthCorpus.embeddings(spark, 20000L)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    // a micro-batch-sized shard (20 rows) against the FULL-SCALE
    // index: the index side is what grows in deployment; the raw
    // candidate stream for a whole 10% slice (~20M rows at these
    // bucket widths) belongs in the registered rollup form, not a
    // driver-side memory sink
    val shard = e.filter(col("vec_id") % 1000 === 3)
    val shardDir = Files.createTempDirectory("graft-embgate10x-in").toString + "/in"
    shard.coalesce(2).write.parquet(shardDir)
    val index = Dedup.corpusEmbedBandIndex(spark, dir)
    index.keys.cache()
    try {
      val stream = spark.readStream.schema(shard.schema).parquet(shardDir)
      val live = drain(
        Dedup.streamingEmbedGate(stream, index, broadcastIndex = false),
        "append", "embgate10x_live")
      val batch = Dedup.streamingEmbedGate(shard, index,
        broadcastIndex = false)
      assert(live.count() > 0, "the 10% shard must collide at 20k")
      assert(live.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(live).count() === 0)
      // non-vacuous beyond self-matches: the planted twins (and
      // organic band collisions) must surface cross-id candidates
      assert(live.filter(col("vec_id") =!= col("corpus_id")).count() > 0)
    } finally { index.keys.unpersist(); () }
  }

  test("streaming gates reload their PERSISTED index across a checkpoint restart: output identical (r10 #7)") {
    import spark.implicits._
    import graft.llmdata.Dedup
    // the deployment story: the gate's corpus index lives ON DISK
    // (GenDir-committed); a restarted stream loads it instead of
    // re-keying the corpus, resumes from its checkpoint, and must
    // emit exactly what an unbroken run would have
    val idxDir = Files.createTempDirectory("graft-gateidx").toString
    Dedup.writeEmbedBandIndex(spark, sf, idxDir)
    val memoIdx = Dedup.corpusEmbedBandIndex(spark, sf)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val shard1 = e.filter(col("vec_id") % 10 === 3)
    val shard2 = e.filter(col("vec_id") % 10 === 7)
    val inDir = Files.createTempDirectory("graft-gateidx-in").toString + "/in"
    val cp = Files.createTempDirectory("graft-gateidx-cp").toString
    // a FILE sink (checkpoint-recoverable, unlike the memory sink) —
    // the same exactly-once file-sink shape the pipeline sinks use
    val outDir = Files.createTempDirectory("graft-gateidx-out").toString + "/out"
    shard1.coalesce(1).write.mode("append").parquet(inDir)
    def run(): Unit = {
      // a fresh LOAD each run — the restarted process's view
      val loaded = Dedup.loadEmbedBandIndex(spark, idxDir)
      assert(loaded.bitsPerBand === memoIdx.bitsPerBand,
        "the stored index must carry its keying width")
      val stream = spark.readStream.schema(shard1.schema).parquet(inDir)
      val q = Dedup.streamingEmbedGate(stream, loaded, broadcastIndex = false)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow).start()
      q.awaitTermination()
    }
    def rowsOut(): Set[(Long, Long, Int)] =
      spark.read.parquet(outDir)
        .select(col("vec_id"), col("corpus_id"), col("band"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    run()
    val r1 = rowsOut()
    // the "crash": the first process is gone; new files arrive
    shard2.coalesce(1).write.mode("append").parquet(inDir)
    run()
    val rAll = rowsOut()
    val r2 = rAll -- r1
    assert(r1.nonEmpty && r2.nonEmpty)
    def rowSet(df: DataFrame): Set[(Long, Long, Int)] =
      df.select(col("vec_id"), col("corpus_id"), col("band"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // run 2 resumed from the checkpoint: it emits EXACTLY the new
    // shard's collisions (batch oracle), nothing reprocessed
    val batch2 = rowSet(Dedup.streamingEmbedGate(shard2, memoIdx,
      broadcastIndex = false))
    assert(r2 === batch2)
    // and the union across the restart equals the unbroken batch run
    val batchAll = rowSet(Dedup.streamingEmbedGate(
      shard1.unionByName(shard2), memoIdx, broadcastIndex = false))
    assert(rAll === batchAll)
    // the shingle gate's stored index round-trips the same way
    // (built through the spark-submit twin's entry point)
    val sDir = Files.createTempDirectory("graft-bandidx").toString
    assert(graft.llmdata.GateMain.run(spark, "shingle", sf, sDir) > 0L)
    intercept[IllegalArgumentException] {
      graft.llmdata.GateMain.run(spark, "nope", sf, sDir)
    }
    val someDocs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(50)
    // probe at the PERSISTED index's own keying (adaptive since r13)
    // and compare against a from-scratch index at the same keying
    val (gb, gr) = Dedup.gateBandParams(spark, sDir)
    val viaStored = Dedup.streamingNearDupGate(someDocs,
      Dedup.loadBandIndex(spark, sDir), bands = gb, rows = gr)
      .collect().toSeq
    val viaMemo = Dedup.streamingNearDupGate(someDocs,
      Dedup.corpusBandIndex(spark, sf, gb, gr), bands = gb, rows = gr)
      .collect().toSeq
    assert(viaStored.toSet === viaMemo.toSet)
  }

  test("streaming bloom gate: literal-sketch filter, stream = batch, no false negatives") {
    import spark.implicits._
    import graft.llmdata.Dedup
    val srcText = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") === 0L).collect()(0).getAs[String]("text")
    val shard = Seq((300000L, srcText),
      (300001L, (0 until 60).map(i => s"bv$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-bloomgate").toString + "/in"
    shard.coalesce(1).write.parquet(dir)
    val bloom = Dedup.corpusBloom(spark, sf)
    val stream = spark.readStream.schema(shard.schema).parquet(dir)
    val live = drain(Dedup.streamingBloomGate(stream, bloom),
      "append", "bloomgate_live")
    val batch = Dedup.streamingBloomGate(shard, bloom)
    assert(live.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(live).count() === 0)
    // the corpus copy MUST flag (no false negatives); the novel doc
    // must pass (deterministic hashes: measured non-FP, guards drift)
    assert(live.filter(col("doc_id") === 300000L && col("might_dup")).count() === 1)
    assert(live.filter(col("doc_id") === 300001L && !col("might_dup")).count() === 1)
  }

  test("streaming user sessions (append mode) emit exactly the watermark-closed batch sessions") {
    val live = drain(StreamingAnalytics.userSessions(enrichedStream),
      "append", "sessions_live").cache()
    val batch = StreamingAnalytics.userSessions(enrichedBatch).cache()

    // every emitted session must be a real (batch-identical) session
    assert(live.count() > 0)
    assert(live.exceptAll(batch).count() === 0)

    // sessions that closed strictly before the final watermark
    // (max event time - 10 min delay) must all have been emitted
    val maxTs = enrichedBatch.agg(max(col("transaction_date"))).collect()(0)
      .getTimestamp(0)
    val wm = new Timestamp(maxTs.getTime - 10 * 60 * 1000)
    val mustEmit = batch.filter(col("session_end") < lit(wm))
    assert(mustEmit.exceptAll(live).count() === 0,
      "a watermark-closed session was never emitted")
  }
}
