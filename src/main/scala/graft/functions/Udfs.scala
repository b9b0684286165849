package graft.functions

import org.apache.spark.sql.SparkSession

/** The demonstrative Scala-UDF registration path (SURVEY §2.12).
  *
  * The engine's hot paths never use UDFs — the reference's four Python
  * UDFs are native Column expressions in [[graft.tx.Enrichment]] (single
  * codegen span). This registration exists for API-surface parity: a
  * user of the reference who had `spark.udf.register`-style extension
  * points gets the same hook here, with UDF #1's exact semantics
  * (spark_streaming_consumer.py:72–86) as the worked example.
  */
object Udfs {

  /** Register `usd_to_vnd(usd)` — null/≤0 → null, else usd × rate. */
  def register(spark: SparkSession, rate: Double = 25057.0): Unit =
    spark.udf.register("usd_to_vnd", (usd: java.lang.Double) =>
      if (usd == null || usd.doubleValue() <= 0) null
      else java.lang.Double.valueOf(usd.doubleValue() * rate))
}
