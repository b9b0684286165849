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

  test("sketch result is deterministic across runs") {
    val a = EventAnalytics.ea13ApproxUsers(spark, sf).collect().toSeq
    val b = EventAnalytics.ea13ApproxUsers(spark, sf).collect().toSeq
    assert(a === b)
  }
}
