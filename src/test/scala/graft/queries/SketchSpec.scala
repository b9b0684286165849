package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Error-bound gate for the HLL++ sketch path (ea13, rows-only in
  * CORRECTNESS because HLL implementations differ across engines). */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct stays within 5% of the exact per-type cardinality") {
    val approx = EventAnalytics.ea13ApproxUsers(spark, sf)
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "event_type")
      .withColumn("rel_err",
        abs(col("approx_users") - col("exact_users")) /
          col("exact_users").cast("double"))
    assert(joined.count() > 0)
    val worst = joined.agg(max(col("rel_err"))).collect()(0).getDouble(0)
    assert(worst <= 0.05, s"worst relative error $worst")
  }

  test("approx_percentile tracks the exact ea15 percentiles (the 100 TB swap-in)") {
    // exact `percentile` buffers whole groups; at warehouse scale ea15
    // swaps in the mergeable t-digest. Gate: on this corpus the sketch's
    // p50/p90 sit within 5% relative error of the exact interpolated
    // values (p99 is noisier on small groups, so it is not gated here).
    val approx = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, 0.5, 1000)").as("a50"),
        expr("approx_percentile(value, 0.9, 1000)").as("a90"))
    val joined = EventAnalytics.ea15ValuePercentiles(spark, sf)
      .join(approx, "event_type")
      .withColumn("e50", abs(col("a50") - col("p50")) / col("p50"))
      .withColumn("e90", abs(col("a90") - col("p90")) / col("p90"))
    assert(joined.count() > 0)
    val worst = joined.agg(max(greatest(col("e50"), col("e90"))))
      .collect()(0).getDouble(0)
    assert(worst <= 0.05, s"worst relative error $worst")
  }

  test("sketch result is deterministic across runs") {
    val a = EventAnalytics.ea13ApproxUsers(spark, sf).collect().toSeq
    val b = EventAnalytics.ea13ApproxUsers(spark, sf).collect().toSeq
    assert(a === b)
  }
}
