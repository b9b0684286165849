package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The native n-gram generator must be indistinguishable from the
  * composable transform-and-explode form — same rows, same
  * multiplicities, same tokenization quirks — and plan through
  * `Generate` like any built-in generator. */
class WordNgramsSpec extends SparkSpec {

  private def composable(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val grams = when(size(col("_toks")) >= n,
      transform(sequence(lit(0), size(col("_toks")) - n),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(col("_toks"), i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))
    df.select(col("doc_id"), split(col("text"), " ").as("_toks"))
      .select(col("doc_id"), explode(grams).as("ngram"))
  }

  test("generator n-grams equal the composable form on the real corpus") {
    assert(spark.catalog.functionExists("word_ngrams"),
      "GraftExtensions must register word_ngrams on the test session")
    val docs = Tables.documents(spark, sf)
    for (n <- Seq(2, 3, 5)) {
      val gen = docs.select(col("doc_id"),
        expr(s"word_ngrams(text, $n)"))
      val ref = composable(docs, n)
      assert(gen.columns.toSeq === Seq("doc_id", "ngram"))
      assert(gen.count() === ref.count(), s"n=$n cardinality")
      assert(gen.exceptAll(ref).count() === 0, s"n=$n: generator extras")
      assert(ref.exceptAll(gen).count() === 0, s"n=$n: generator misses")
    }
  }

  test("edge cases: short docs, empty text, null text, n=1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),          // 3 tokens → one 3-gram
      (2L, "a b"),            // shorter than n → nothing
      (3L, ""),               // splits to [""] → nothing for n=3
      (4L, null.asInstanceOf[String]),
      (5L, "x  y")            // double space → empty middle token kept
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ngram_edge")
    val got = spark.sql(
      "SELECT doc_id, word_ngrams(text, 3) FROM ngram_edge")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a b c"), (5L, "x  y")))
    // n=1 degenerates to the token stream
    val uni = spark.sql("SELECT word_ngrams(text, 1) FROM ngram_edge")
      .count()
    assert(uni === 3 + 2 + 1 + 0 + 3)
  }

  test("duplicated phrases keep their multiplicity (occurrence grain)") {
    import spark.implicits._
    val one = Seq((1L, "p q p q p q")).toDF("doc_id", "text")
    one.createOrReplaceTempView("ngram_dup")
    val grams = spark.sql(
      "SELECT word_ngrams(text, 2) AS g FROM ngram_dup")
    assert(grams.count() === 5)
    assert(grams.filter(col("g") === "p q").count() === 3)
  }

  test("generator plans through Generate and rejects bad arguments") {
    val p = Tables.documents(spark, sf)
      .select(expr("word_ngrams(text, 3)"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Generate"), s"expected Generate in:\n$p")
    // a REAL registered view, so the failures below are the argument
    // checks, never a missing-table error masking a regressed builder
    Tables.documents(spark, sf).limit(3).createOrReplaceTempView("ngram_args")
    val nonLiteral = intercept[Exception] {
      spark.sql("SELECT word_ngrams(text, n_chars) FROM ngram_args").collect()
    }
    assert(nonLiteral.getMessage.contains("literal"), nonLiteral.getMessage)
    val fractional = intercept[Exception] {
      spark.sql("SELECT word_ngrams(text, 2.9) FROM ngram_args").collect()
    }
    assert(fractional.getMessage.contains("integer literal"), fractional.getMessage)
    intercept[Exception] {
      Tables.documents(spark, sf).select(expr("word_ngrams(doc_id, 3)"))
        .collect()
    }
  }
}
