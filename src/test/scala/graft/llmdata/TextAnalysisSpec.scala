package graft.llmdata

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Gates for the rolling-hash fingerprint family (rows-only in
  * CORRECTNESS — xxhash64 token hashes aren't DuckDB-reproducible). */
class TextAnalysisSpec extends SparkSpec {

  test("rolling fingerprints are order-sensitive where bag fingerprints are not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha"), // same bag, reversed
      (3L, "alpha beta gamma delta epsilon zeta")) // identical to 1
      .toDF("doc_id", "text")
    // run the operator over a table-shaped temp corpus
    val tmp = java.nio.file.Files.createTempDirectory("graft-roll").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val byId = TextAnalysis.rollingFingerprints(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // identical docs share ALL windows; the reversed doc shares none
    assert(byId(1L) === byId(3L))
    assert((byId(1L) & byId(2L)).isEmpty)
  }

  test("rolling overlap pairs find the corpus' near-duplicate passages") {
    val overlap = TextAnalysis.rollingOverlapPairs(spark, sf, 3)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every high-Jaccard near-dup pair shares passages of ≥ window length
    val nearDups = Dedup.jaccardPairs(spark, sf, 0.8)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nearDups.nonEmpty)
    assert(nearDups.subsetOf(overlap),
      s"missing ${(nearDups -- overlap).size} of ${nearDups.size} near-dup pairs")
  }

  test("quality scores: ratios bounded in [0,1] and consistent with counts") {
    val q = TextAnalysis.qualityScores(spark, sf)
    assert(q.filter(col("type_token_ratio") > 1 || col("type_token_ratio") <= 0)
      .count() === 0)
    assert(q.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1)
      .count() === 0)
    assert(q.filter(col("n_types") > col("n_tokens")).count() === 0)
    assert(q.count() === Tables.documents(spark, sf).count())
  }
}
