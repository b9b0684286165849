package graft

import org.apache.spark.sql.types.TimestampType

class TablesSpec extends SparkSpec {
  test("all test tables load with rows") {
    val loaders = Seq(
      Tables.region _, Tables.nation _, Tables.customer _, Tables.supplier _,
      Tables.part _, Tables.orders _, Tables.lineitem _, Tables.events _,
      Tables.documents _, Tables.embeddings _)
    loaders.foreach { ld => assert(ld(spark, sf).count() > 0) }
  }

  test("events.ts is exposed as a usable timestamp") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    import org.apache.spark.sql.functions._
    val r = ev.agg(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(r.getInt(0) >= 2020 && r.getInt(1) <= 2030)
  }
}
