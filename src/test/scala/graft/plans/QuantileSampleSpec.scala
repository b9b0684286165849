package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The quantile sample sketch must be exact below capacity, merge
  * EXACTLY (byte-identical to a direct build — the lattice property of
  * bottom-k by a global hash order), deterministic across builds, and
  * rank-accurate above capacity. */
class QuantileSampleSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf)
    .select(col("event_id"), col("ts"), col("value")).cache()

  /** Exact percentile_cont-style reference on the full data. */
  private def exactQuantile(vs: Array[Double], p: Double): Double = {
    val s = vs.sorted
    val h = p * (s.length - 1)
    val lo = math.floor(h).toInt
    val hi = math.min(lo + 1, s.length - 1)
    s(lo) + (s(hi) - s(lo)) * (h - lo)
  }

  test("below capacity the sketch quantile IS the exact percentile") {
    val n = events.count().toInt
    val sk = events.agg(
      call_function("qsample_sketch", col("event_id"), col("value"),
        lit(n + 10)).as("sk"))
    val got = Seq(0.0, 0.25, 0.5, 0.9, 1.0).map(p =>
      sk.select(call_function("qsample_quantile", col("sk"), lit(p)))
        .collect()(0).getDouble(0))
    val vs = events.select(col("value")).collect().map(_.getDouble(0))
    val want = Seq(0.0, 0.25, 0.5, 0.9, 1.0).map(exactQuantile(vs, _))
    assert(got === want)
  }

  test("day sketches merge to the byte-identical direct sketch") {
    val fromDays = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(call_function("qsample_sketch", col("event_id"), col("value")).as("sk"))
      .agg(call_function("qsample_merge", col("sk")).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val direct = events
      .agg(call_function("qsample_sketch", col("event_id"), col("value")).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(fromDays, direct))
  }

  test("two independent builds are byte-identical (no runtime randomness)") {
    def build() = events.repartition(7)
      .agg(call_function("qsample_sketch", col("event_id"), col("value")).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(), build()))
  }

  test("above capacity the estimate's true rank stays near p") {
    val vs = events.select(col("value")).collect().map(_.getDouble(0)).sorted
    val sk = events.agg(
      call_function("qsample_sketch", col("event_id"), col("value")).as("sk"))
    Seq(0.5 -> 0.10, 0.9 -> 0.06).foreach { case (p, tol) =>
      val est = sk.select(call_function("qsample_quantile", col("sk"), lit(p)))
        .collect()(0).getDouble(0)
      val rank = vs.count(_ <= est).toDouble / vs.length
      assert(math.abs(rank - p) <= tol,
        s"p=$p: estimated value $est has true rank $rank")
    }
  }

  test("empty input yields null quantiles; malformed binaries are rejected") {
    val empty = events.filter(col("event_id") < 0).agg(
      call_function("qsample_sketch", col("event_id"), col("value")).as("sk"))
    assert(empty.select(
      call_function("qsample_quantile", col("sk"), lit(0.5))).collect()(0).isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT qsample_quantile(cast('junk' as binary), 0.5d)").collect()
    }
    assert(err.getMessage.contains("qsample") ||
      err.getCause != null && err.getCause.getMessage.contains("qsample"))
  }

  test("all-null groups merge as the empty wildcard sketch, never crash or poison capacities") {
    import spark.implicits._
    // all-null sketch column: the partial stage serializes the k=0
    // empty buffer — the merge side must accept it (CONFIRMED crash
    // before the fix) and quantiles come back null
    val allNull = Seq(1, 2, 3).toDF("g")
      .select(lit(null).cast("binary").as("sk"))
      .agg(call_function("qsample_merge", col("sk")).as("m"))
    assert(allNull.select(
      call_function("qsample_quantile", col("m"), lit(0.5)))
      .collect()(0).isNullAt(0))
    // and the stored empty output is a capacity WILDCARD: merging it
    // with a non-default k must work, not throw "mixed capacities"
    val emptySk = allNull.collect()(0).getAs[Array[Byte]](0)
    val k16 = events.limit(50).agg(call_function("qsample_sketch",
      col("event_id"), col("value"), lit(16)).as("sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val merged = Seq(emptySk, k16).toDF("sk")
      .agg(call_function("qsample_merge", col("sk")).as("m"))
      .select(call_function("qsample_quantile", col("m"), lit(0.5)))
      .collect()(0)
    assert(!merged.isNullAt(0))
  }

  test("equal-key inserts keep a merge-order-independent winner (min value)") {
    // duplicate row-ids (or a 64-bit hash collision) hit the same slot;
    // last-write-wins would make the survivor depend on partial-agg
    // order (ADVICE r05) — the buffer must keep min regardless of order
    def buf() = new QSample.Buf(4, new java.util.TreeMap[java.lang.Long, java.lang.Double])
    val a = buf(); QSample.add(a, 10L, 1.0); QSample.add(a, 10L, 2.0)
    val b = buf(); QSample.add(b, 10L, 2.0); QSample.add(b, 10L, 1.0)
    assert(QSample.serialize(a).toSeq === QSample.serialize(b).toSeq)
    assert(a.m.get(10L) === 1.0)
  }

  test("mixed-capacity merges fail loudly instead of degrading the bound") {
    val a = events.limit(50).agg(call_function("qsample_sketch",
      col("event_id"), col("value"), lit(16)).as("sk"))
    val b = events.limit(50).agg(call_function("qsample_sketch",
      col("event_id"), col("value"), lit(32)).as("sk"))
    val err = intercept[Exception] {
      a.unionByName(b).agg(call_function("qsample_merge", col("sk"))).collect()
    }
    assert(err.getMessage.contains("mixed capacities") ||
      err.getCause != null && err.getCause.getMessage.contains("mixed capacities"))
  }
}
