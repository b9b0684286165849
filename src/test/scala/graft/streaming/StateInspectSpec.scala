package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Offline state reads must reproduce exactly the running aggregate
  * the streaming query holds — proven against the batch aggregate of
  * everything the query has ingested. */
class StateInspectSpec extends SparkSpec {

  test("aggregation state read from the checkpoint equals the batch aggregate") {
    val root = Files.createTempDirectory("graft-state").toString
    val (inDir, ckpt) = (s"$root/in", s"$root/ckpt")
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("value"))
    ev.coalesce(1).write.mode("append").parquet(inDir)

    val src = spark.readStream.schema(ev.schema).parquet(inDir)
    // group on a materialized column: the state key struct carries the
    // grouping ATTRIBUTE's name (an expression would surface as the
    // anonymous `_groupingexpression`)
    val q = src
      .withColumn("bucket", pmod(col("user_id"), lit(10)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // the value struct carries the aggregation BUFFER's field names
    // (`count`), not the query's output aliases
    val st = StateInspect.aggregationState(spark, ckpt)
      .select(col("bucket"), col("count").as("n"))
    val want = ev.groupBy(pmod(col("user_id"), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n"))
    assert(st.exceptAll(want).count() === 0)
    assert(want.exceptAll(st).count() === 0)
  }
}
