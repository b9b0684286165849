package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The UDF registration path must reproduce UDF #1's semantics exactly
  * and agree with the native P4 expression the engine actually uses. */
class UdfsSpec extends SparkSpec {

  test("registered usd_to_vnd matches the native P4 expression on all edge cases") {
    import spark.implicits._
    Udfs.register(spark, rate = 25057.0)
    val df = Seq(Some(125.5), Some(0.0), Some(-3.0), None, Some(2500.0))
      .toDF("usd")
      .withColumn("via_udf", call_udf("usd_to_vnd", col("usd")))
      .withColumn("via_native",
        when(col("usd").isNotNull && col("usd") > 0, col("usd") * lit(25057.0)))
    assert(df.filter(!(col("via_udf") <=> col("via_native"))).count() === 0)
    // spot values: null/≤0 → null, 125.5 → 3144652.35
    val got = df.select("via_udf").collect().map(r => Option(r.get(0)))
    assert(got(0) === Some(125.5 * 25057.0))
    assert(got(1).isEmpty && got(2).isEmpty && got(3).isEmpty)
  }

  test("registration is visible through the SQL surface") {
    Udfs.register(spark)
    val out = spark.sql("SELECT usd_to_vnd(CAST(2.0 AS DOUBLE)) AS v").collect()(0)
    assert(out.getDouble(0) === 2.0 * 25057.0)
  }

  test("typed WeightedMeanAgg equals the Column formulation bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(("a", 1050L, 3L), ("a", 200L, 1L), ("b", 99L, 2L),
      ("b", 1L, 5L), ("a", 7L, 31L))
    val typed = rows.toDF("k", "cents", "w").as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.functions.WeightedMeanAgg.toColumn.name("wavg"))
      .collect().toMap
    val column = rows.toDF("k", "cents", "w")
      .groupBy("k")
      .agg((sum(col("cents") * col("w")).cast("double") / lit(100.0) /
        sum(col("w"))).as("wavg"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed === column)
    // zero-weight group surfaces NaN rather than masking it
    val nan = Seq(("z", 10L, 0L)).toDF("k", "cents", "w")
      .as[(String, Long, Long)].groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.functions.WeightedMeanAgg.toColumn.name("wavg"))
      .collect()(0)._2
    assert(nan.isNaN)
  }
}
