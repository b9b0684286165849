package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Correctness gates for the KMV distinct sketch (ea17 is rows-only in
  * CORRECTNESS — DuckDB cannot reproduce xxhash sketches): exactness
  * below capacity, bounded error above it, partition-order-independent
  * merging, and intersection estimates against known ground truth. */
class KmvSpec extends SparkSpec {

  private def sketch(c: String) = call_function("kmv_sketch", col(c))

  test("below capacity the sketch cardinality is exact per group") {
    val per = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(call_function("kmv_card", sketch("user_id")).as("est"),
        countDistinct(col("user_id")).as("exact"))
    assert(per.count() > 0)
    // the corpus has < k=256 distinct users per type: exact path
    assert(per.filter(col("est") =!= col("exact")).count() === 0)
  }

  test("estimation path stays within 3 standard errors on 100k distincts") {
    val est = spark.range(100000).toDF("id")
      .agg(call_function("kmv_card", sketch("id")).as("est"))
      .collect()(0).getLong(0)
    val relErr = math.abs(est - 100000.0) / 100000.0
    // KMV stderr ≈ 1/sqrt(k-2) ≈ 6.3% at k=256; deterministic hashes ⇒
    // this is a fixed measured value, the bound guards regressions
    assert(relErr <= 3.0 / math.sqrt(254.0), s"relative error $relErr")
  }

  test("sketch bytes are identical regardless of partitioning (merge is canonical)") {
    def bytes(parts: Int): Seq[Byte] = {
      val df = spark.range(50000).toDF("id").repartition(parts)
      df.agg(sketch("id").as("sk")).collect()(0).getAs[Array[Byte]](0).toSeq
    }
    assert(bytes(1) === bytes(32))
  }

  test("intersection estimate tracks a known overlap, and is exact below capacity") {
    def sk(from: Long, to: Long) =
      spark.range(from, to).toDF("id").agg(sketch("id").as("sk"))
    // estimation path: |A|=60k, |B|=60k, overlap 20k, union 100k
    val big = sk(0, 60000).crossJoin(sk(40000, 100000).withColumnRenamed("sk", "sk_b"))
      .select(call_function("kmv_intersect", col("sk"), col("sk_b")).as("est"))
      .collect()(0).getLong(0)
    // J=0.2 sampled with k'=256 → 3σ ≈ ±0.075 absolute on J → est in
    // [12.5k, 27.5k]; deterministic, bound guards regressions
    assert(big > 12000 && big < 28000, s"intersection estimate $big for true 20000")
    // exact path: both sketches under capacity hold every hash
    val small = sk(0, 200).crossJoin(sk(100, 300).withColumnRenamed("sk", "sk_b"))
      .select(call_function("kmv_intersect", col("sk"), col("sk_b")).as("est"))
      .collect()(0).getLong(0)
    assert(small === 100L)
  }

  test("malformed inputs fail cleanly: k < 2 at analysis, junk binary at runtime") {
    val degenerate = intercept[Exception] {
      spark.range(10).toDF("id")
        .agg(expr("kmv_sketch(id, 1)")).collect()
    }
    assert(degenerate.getMessage.contains("k >= 2"), degenerate.getMessage)
    val junk = intercept[Exception] {
      spark.range(10).toDF("id")
        .select(expr("kmv_card(CAST('not a sketch' AS BINARY))")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(junk).exists(m => m != null && m.contains("not a kmv sketch")),
      s"expected a clear sketch-format error, got: ${messages(junk)}")
  }

  test("ea17 overlap rows are internally consistent") {
    val rows = graft.queries.EventAnalytics.ea17KmvOverlap(spark, sf).collect()
    assert(rows.length === 10) // C(5 event types, 2)
    rows.foreach { r =>
      val (a, b, both) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(both <= math.min(a, b), s"overlap $both exceeds a side: $r")
      assert(both >= 0)
    }
  }
}
