package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salted aggregation must be a pure plan rewrite: identical results to
  * the unsalted group-by, two exchanges in the plan (partial + merge). */
class SkewSpec extends SparkSpec {

  test("salted sum/count equals the plain groupBy on a real table") {
    val ev = Tables.events(spark, sf)
    val salted = Skew.saltedSumCount(ev, Seq("user_id"),
      Relational.dec(col("value")), xxhash64(col("event_id")), salts = 8)
      .withColumn("total", col("total").cast("double"))
    val plain = ev.groupBy(col("user_id"))
      .agg(sum(Relational.dec(col("value"))).cast("double").as("total"),
        count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salting degenerates gracefully: salts=1 is the plain aggregation") {
    val ev = Tables.events(spark, sf)
    val one = Skew.saltedSumCount(ev, Seq("event_type"), col("value"),
      xxhash64(col("event_id")), salts = 1)
    val plain = ev.groupBy("event_type")
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n"))
    assert(one.exceptAll(plain).count() === 0)
  }
}
