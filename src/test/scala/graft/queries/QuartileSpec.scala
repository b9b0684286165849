package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** VERDICT r7 #7: q31's distributed two-pass rank must reproduce the
  * global-`ntile` window EXACTLY — same buckets, same rollup — while
  * its plan carries no single-partition exchange (PlanAuditSpec covers
  * the lint; this pins the semantics the lint cannot see). */
class QuartileSpec extends SparkSpec {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  test("distributed two-pass rank quartiles equal the ntile window form") {
    val got = Relational.q31SpendQuartiles(spark, sf).collect().toSeq

    val spend = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("spend"))
    val w = Window.orderBy(col("spend").desc, col("o_custkey"))
    val want = spend.withColumn("quartile", ntile(4).over(w))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("spend")).cast("double").as("min_spend"),
        max(col("spend")).cast("double").as("max_spend"),
        sum(col("spend")).cast("double").as("total_spend"))
      .orderBy(col("quartile"))
      .collect().toSeq

    assert(got === want)
    assert(got.size === 4)
    // equal population with the remainder spread to the FIRST buckets
    val sizes = got.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    assert(sizes === sizes.sortBy(-_))
  }
}
