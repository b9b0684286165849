package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The typed facade must round-trip the 21-column layout losslessly and
  * agree with the untyped split predicates. */
class TypedSpec extends SparkSpec {

  private lazy val enriched = Enrichment.enrich(
    RawTransactions.fromEvents(spark, sf), Enrichment.DefaultRate,
    to_timestamp(lit("2024-06-01 00:00:00"))).cache()

  test("typed dataset carries every row with the exact 21-column schema") {
    val ds = Typed.processed(enriched)
    assert(ds.columns.toSeq === Enrichment.outputColumns)
    assert(ds.count() === enriched.count())
  }

  test("typed predicates agree with the Column-based splitter") {
    val ds = Typed.processed(enriched)
    assert(ds.filter(_.Is_Fraud == "Yes").count() ===
      Splitter.fraud(enriched).count())
    assert(ds.filter(t => t.Errors != null && t.Errors.nonEmpty).count() ===
      Splitter.errors(enriched).count())
    // typed map path: object round-trip preserves values
    val usdTyped = ds.filter(_.Amount_USD.exists(_ > 0))
      .map(_.Amount_USD.get)(org.apache.spark.sql.Encoders.scalaDouble)
      .reduce(_ + _)
    val usdCols = enriched.filter(col("Amount_USD") > 0)
      .agg(sum(col("Amount_USD"))).collect()(0).getDouble(0)
    assert(math.abs(usdTyped - usdCols) < 1e-6 * math.abs(usdCols))
  }
}
