package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.AnalysisException

/** Correctness gates for the Count-Min frequency sketch (txt_cms_terms
  * is rows-only in CORRECTNESS — DuckDB cannot reproduce xxhash
  * sketches): one-sided error (never undercounts), the εN overcount
  * bound, canonical merging, and clean failure on malformed input. */
class CmsSpec extends SparkSpec {

  private def sketch(c: String) = call_function("cms_sketch", col(c))

  test("estimates never undercount and respect the εN bound (term corpus)") {
    val terms = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
    val total = terms.count()
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n_exact"))
    val sk = terms.agg(sketch("term").as("sk"))
    val joined = exact.crossJoin(sk)
      .select(col("term"), col("n_exact"),
        call_function("cms_estimate", col("sk"), col("term")).as("n_cms"))
      .cache()
    try {
      assert(joined.count() > 0)
      assert(joined.filter(col("n_cms") < col("n_exact")).count() === 0,
        "CMS must never undercount")
      // classic bound: overcount ≤ e/w · N with prob 1−e^−d; with d=4,
      // w=512 and deterministic hashes this is a fixed measured margin
      val eps = math.E / Cms.DefaultWidth
      val over = joined.filter(col("n_cms") - col("n_exact") > eps * total).count()
      assert(over === 0, s"$over terms exceed the εN overcount bound")
    } finally { joined.unpersist(); () }
  }

  test("sketch bytes are identical regardless of partitioning (merge is canonical)") {
    def bytes(parts: Int): Seq[Byte] = {
      val df = spark.range(50000).toDF("id").repartition(parts)
      df.agg(sketch("id").as("sk")).collect()(0).getAs[Array[Byte]](0).toSeq
    }
    assert(bytes(1) === bytes(32))
  }

  test("small exact case: unique values estimate exactly 1 when w ≫ n") {
    val est = spark.range(100).toDF("id")
      .agg(call_function("cms_sketch", col("id"), lit(4), lit(4096)).as("sk"))
      .select(call_function("cms_estimate", col("sk"), lit(7L)).as("e"),
        call_function("cms_estimate", col("sk"), lit(1234567L)).as("missing"))
      .collect()(0)
    assert(est.getLong(0) === 1L)
    // an absent value may collide but is bounded by the same εN ≈ 0.07
    assert(est.getLong(1) <= (math.E / 4096 * 100).ceil.toLong)
  }

  test("malformed inputs fail cleanly: bad dims at analysis, junk binary at runtime") {
    val df = spark.range(10).toDF("id")
    intercept[AnalysisException] {
      df.agg(call_function("cms_sketch", col("id"), lit(0), lit(16))).collect()
    }
    val junk = df.select(lit(Array[Byte](1, 2, 3)).as("sk"))
    val err = intercept[Exception] {
      junk.select(call_function("cms_estimate", col("sk"), lit(1L))).collect()
    }
    assert(err.getMessage != null)
  }

  test("txt_cms_terms pairs exact counts with non-undercounting estimates") {
    val df = graft.llmdata.TextAnalysis.cmsTermCounts(spark, sf).cache()
    try {
      assert(df.count() === 20)
      assert(df.filter(col("n_cms") < col("n_exact")).count() === 0)
    } finally { df.unpersist(); () }
  }
}
