package graft.sync

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The sketch table must (a) estimate within HLL error of exact
  * distinct counts, (b) merge EXACTLY — a month rolled from stored
  * day sketches equals the sketch built from the month's raw facts —
  * and (c) keep the additive measures exact. */
class SketchTableSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf).cache()
  private lazy val daily = SketchTable.buildDaily(events).cache()

  test("weekly estimates are within 5% of exact distinct users") {
    val est = SketchTable.rollup(daily, "week")
      .select(col("period"), col("est_users")).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = events
      .groupBy(trunc(to_date(col("ts")), "week").as("period"))
      .agg(countDistinct(col("user_id")).as("users")).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (m, ex) =>
      val e = est(m)
      assert(math.abs(e - ex).toDouble / ex <= 0.05,
        s"week $m: estimate $e vs exact $ex")
    }
  }

  test("day sketches union to EXACTLY the directly-built month sketch") {
    val fromDays = SketchTable.rollup(daily, "month")
      .select(col("period"), col("est_users"))
    val direct = events
      .groupBy(trunc(to_date(col("ts")), "month").as("period"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("est_users"))
    assert(fromDays.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(fromDays).count() === 0)
  }

  test("incremental append: new days extend the table without touching old rows") {
    val cut = "2024-01-15"
    val before = SketchTable.buildDaily(events.filter(to_date(col("ts")) < lit(cut)))
    val after = SketchTable.buildDaily(events.filter(to_date(col("ts")) >= lit(cut)))
    val unioned = before.unionByName(after)
    // the appended table answers range queries identically to a full rebuild
    val a = SketchTable.rollup(unioned, "week")
    val b = SketchTable.rollup(daily, "week")
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("range quantiles from stored day sketches equal a direct build exactly") {
    // the qsample merge is exactly associative, so the stored-table
    // path must give the SAME doubles as sketching the raw range —
    // compared per period so the test holds on any fixture span
    val got = SketchTable.rollup(daily, "month")
      .select(col("period"), col("est_p50"), col("est_p99"))
    val direct = events
      .groupBy(trunc(to_date(col("ts")), "month").as("period"))
      .agg(call_function("qsample_sketch", col("event_id"), col("value")).as("sk"))
      .select(col("period"),
        call_function("qsample_quantile", col("sk"), lit(0.5)).as("est_p50"),
        call_function("qsample_quantile", col("sk"), lit(0.99)).as("est_p99"))
    assert(got.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(got).count() === 0)
  }

  test("additive measures on the sketch row are exact") {
    val got = daily.agg(
      sum(col("n")).as("n"),
      sum(col("value_total")).cast("double").as("v")).collect()(0)
    val exp = events.agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("v")).collect()(0)
    assert(got.getLong(0) === exp.getLong(0))
    assert(got.getDouble(1) === exp.getDouble(1))
  }

  test("range query touches only the sketch table and matches exact") {
    val got = SketchTable.rangeUsers(daily, "2024-01-01", "2024-01-15")
      .collect()(0)
    val exact = events
      .filter(to_date(col("ts")) >= lit("2024-01-01") &&
        to_date(col("ts")) < lit("2024-01-15"))
      .agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(got.getLong(0) - exact).toDouble / math.max(exact, 1) <= 0.05)
  }
}
