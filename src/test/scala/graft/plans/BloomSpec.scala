package graft.plans

import graft.{SparkSpec, Tables}
import graft.llmdata.Dedup
import org.apache.spark.sql.functions._

/** Correctness gates for the Bloom membership sketch (the registered
  * `dd_bloom_delta` stays oracle-exact because the filter only prunes
  * the plan — these gates pin the sketch itself): the no-false-negative
  * guarantee, the sized false-positive bound, canonical bitwise-OR
  * merging, and loud rejection of malformed inputs. */
class BloomSpec extends SparkSpec {

  private def sketchOf(n: Long) =
    spark.range(n).toDF("id")
      .agg(call_function("bloom_sketch", col("id")).as("bf"))

  test("no false negatives: every inserted member tests true") {
    val misses = spark.range(5000).toDF("id")
      .crossJoin(sketchOf(5000))
      .filter(!call_function("bloom_contains", col("bf"), col("id")))
      .count()
    assert(misses === 0L)
  }

  test("false-positive rate is bounded at default sizing (5k keys, 2^18 bits)") {
    // expected FP ≈ (1 − e^(−kn/m))^k ≈ 6e-6 here; 50/10k = 0.5% is a
    // regression guard two orders above it, deterministic hashes ⇒ fixed
    val fps = spark.range(1000000L, 1010000L).toDF("id")
      .crossJoin(sketchOf(5000))
      .filter(call_function("bloom_contains", col("bf"), col("id")))
      .count()
    assert(fps <= 50L, s"$fps false positives in 10k non-member probes")
  }

  test("sketch bytes are identical regardless of partitioning (merge = bitwise OR)") {
    def bytes(parts: Int): Seq[Byte] =
      spark.range(50000).toDF("id").repartition(parts)
        .agg(call_function("bloom_sketch", col("id")).as("bf"))
        .collect()(0).getAs[Array[Byte]](0).toSeq
    assert(bytes(1) === bytes(32))
  }

  test("string keys: every corpus content hash round-trips through the sketch") {
    val docs = Tables.documents(spark, sf)
      .select(md5(col("text").cast("binary")).as("h"))
    val sk = docs.agg(call_function("bloom_sketch", col("h")).as("bf"))
    assert(docs.crossJoin(sk)
      .filter(!call_function("bloom_contains", col("bf"), col("h")))
      .count() === 0L)
  }

  test("bloom delta verdicts equal the plain exact left join (the filter never changes the answer)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    val exm = docs.filter(col("doc_id") % 5 =!= 4)
      .groupBy(col("h")).agg(min(col("doc_id")).as("m"))
    val ref = docs.filter(col("doc_id") % 5 === 4)
      .join(exm, Seq("h"), "left")
      .select(col("doc_id"),
        when(col("m").isNotNull, "exact_dup").otherwise("new").as("status"),
        col("m").as("match_id"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val out = Dedup.bloomDelta(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out === ref)
    assert(out.nonEmpty)
  }

  test("malformed inputs fail cleanly: bad sizing at analysis, junk binary at runtime") {
    val tooSmall = intercept[Exception] {
      spark.range(10).toDF("id")
        .agg(call_function("bloom_sketch", col("id"), lit(8), lit(5)))
        .collect()
    }
    assert(tooSmall.getMessage.contains("numBits"))
    val junk = intercept[Exception] {
      spark.range(1)
        .select(call_function("bloom_contains",
          lit(Array[Byte](1, 2, 3)), lit(5L)))
        .collect()
    }
    def chain(e: Throwable): Iterator[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
    assert(chain(junk).exists(t =>
      t.getMessage != null && t.getMessage.contains("not a bloom sketch")))
  }

  test("batch-shape bloom gate: every corpus member flags, novel docs pass") {
    val incoming = Tables.documents(spark, sf).select("doc_id", "text")
    val bloom = Dedup.corpusBloom(spark, sf)
    val gated = Dedup.streamingBloomGate(incoming, bloom)
    assert(gated.filter(!col("might_dup")).count() === 0L,
      "a document IN the corpus can never test negative")
    import incoming.sparkSession.implicits._
    val novel = (0 until 500).map(i =>
      (900000L + i, s"novel text $i " + ("x" * (i % 7))))
      .toDF("doc_id", "text")
    val fps = Dedup.streamingBloomGate(novel, bloom)
      .filter(col("might_dup")).count()
    assert(fps <= 5L, s"$fps false positives in 500 novel docs")
  }

  test("broadcast-carrier gate at a multi-MB sketch ≡ literal gate (r8 #5)") {
    // a production-size filter (2^24 bits = 2 MiB) is over the plan-
    // literal ceiling: the literal gate must REFUSE it loudly...
    val incoming = Tables.documents(spark, sf).select("doc_id", "text")
    val big = Dedup.corpusBloom(spark, sf, numBits = 1 << 24)
    assert(big.length > Dedup.BloomLiteralMaxBytes)
    val refused = intercept[IllegalArgumentException] {
      Dedup.streamingBloomGate(incoming, big)
    }
    assert(refused.getMessage.contains("broadcast"),
      "the guard must point at the broadcast carrier")
    // ...and the broadcast carrier must run it with verdicts identical
    // to the small-sketch literal gate's exactness contract: no false
    // negatives on corpus members, FP-bounded on novel docs, and
    // byte-equal hashing (same sketch probed both ways on a small one)
    val bc = spark.sparkContext.broadcast(big)
    val gated = Dedup.streamingBloomGateBroadcast(incoming, bc)
    assert(gated.filter(!col("might_dup")).count() === 0L,
      "no false negatives through the broadcast carrier")
    import incoming.sparkSession.implicits._
    val novel = (0 until 500).map(i =>
      (900000L + i, s"novel text $i " + ("x" * (i % 7))))
      .toDF("doc_id", "text")
    assert(Dedup.streamingBloomGateBroadcast(novel, bc)
      .filter(col("might_dup")).count() <= 5L)
    // parity: the SAME small sketch through both carriers agrees row-
    // for-row (proves the mapPartitions md5+probe path hashes exactly
    // like md5(cast(text AS binary)) |> bloom_contains)
    val small = Dedup.corpusBloom(spark, sf)
    val lit0 = Dedup.streamingBloomGate(incoming.union(novel), small)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val bcast = Dedup.streamingBloomGateBroadcast(
      incoming.union(novel), spark.sparkContext.broadcast(small))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(lit0 === bcast, "broadcast and literal carriers must agree exactly")
    // null text AND null doc_id: both carriers emit a NULL verdict for
    // the null text and pass a null id THROUGH; the broadcast one must
    // not kill the query on either bad row (review r9 + ADVICE r9: a
    // primitive Long decode died on null ids, breaking row parity)
    val dirty = Seq(
      (java.lang.Long.valueOf(1L), "some text"),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[String]),
      (null.asInstanceOf[java.lang.Long], "orphan text"))
      .toDF("doc_id", "text")
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toSet
    assert(verdicts(Dedup.streamingBloomGate(dirty, small)) ===
      verdicts(Dedup.streamingBloomGateBroadcast(
        dirty, spark.sparkContext.broadcast(small))))
    bc.destroy()
  }
}
