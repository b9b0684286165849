package graft.plans

import graft.{SparkSpec, Tables}
import graft.llmdata.Similarity
import org.apache.spark.sql.functions._

/** The custom Catalyst expression must be registered by
  * GraftExtensions, agree bit-for-bit with the composable form, and
  * handle nulls/degenerate inputs like a native function. */
class CosineSimSpec extends SparkSpec {

  test("GraftExtensions registers cosine_sim in the session") {
    assert(spark.catalog.functionExists("cosine_sim"))
  }

  test("native expression is bit-identical to the composable aggregate/zip_with form") {
    val e = Tables.embeddings(spark, sf)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va")).limit(50)
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb")).limit(50)
    val cross = a.crossJoin(b)
      .withColumn("s_native", round(call_function("cosine_sim", col("va"), col("vb")), 6))
      .withColumn("s_composed", Similarity.cosine(col("va"), col("vb")))
    assert(cross.filter(!(col("s_native") <=> col("s_composed"))).count() === 0)
  }

  test("null inputs yield null, not a crash") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (None, Some(Array(1.0f, 0.0f))),
      (Some(Array(1.0f, 0.0f)), None))
      .toDF("a", "b")
      .withColumn("s", call_function("cosine_sim", col("a"), col("b")))
    val got = df.select("s").collect().map(r => Option(r.get(0)))
    assert(got(0) === Some(1.0))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("expression is usable straight from SQL") {
    val out = spark.sql(
      "SELECT cosine_sim(array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)))").collect()(0)
    assert(math.abs(out.getDouble(0) - 1.0) < 1e-12)
  }
}
