package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucket-semantics properties of the 4-way split over the deterministic
  * events-derived corpus (SURVEY §2.4 quirk: buckets overlap; union
  * covers everything). */
class SplitterSpec extends SparkSpec {

  private lazy val processed = TxQueries.processed(spark, sf).cache()

  test("F1-F4 union covers every row") {
    val total = processed.count()
    val uncovered = processed
      .exceptAll(Splitter.valid(processed))
      .exceptAll(Splitter.fraud(processed))
      .exceptAll(Splitter.errors(processed))
      .exceptAll(Splitter.invalid(processed).drop("invalid_reason"))
      .count()
    assert(total > 0)
    assert(uncovered === 0)
  }

  test("buckets overlap (fraud rows with valid fields appear in both)") {
    val fraudAndValid = Splitter.fraud(Splitter.valid(processed)).count()
    assert(fraudAndValid > 0)
    val sumBuckets = Splitter.valid(processed).count() +
      Splitter.fraud(processed).count() +
      Splitter.errors(processed).count() +
      Splitter.invalid(processed).count()
    assert(sumBuckets > processed.count())
  }

  test("invalid bucket excludes fraud and error rows") {
    val inv = Splitter.invalid(processed)
    assert(inv.filter(col("Is_Fraud") === "Yes").count() === 0)
    assert(inv.filter(col("Errors") =!= "").count() === 0)
  }

  test("invalid_reason distinguishes bad dates from bad fields") {
    val reasons = Splitter.invalid(processed)
      .groupBy("invalid_reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons.keySet === Set("Invalid Date", "Data format invalid or missing"))
  }

  test("valid bucket rejects short cards, non-positive and null amounts, bad dates") {
    val v = Splitter.valid(processed)
    assert(v.filter(length(col("Card")) < 16).count() === 0)
    assert(v.filter(col("Amount_USD").isNull || col("Amount_USD") <= 0).count() === 0)
    assert(v.filter(!col("is_valid_date")).count() === 0)
  }
}
