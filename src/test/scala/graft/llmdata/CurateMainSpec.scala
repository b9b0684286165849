package graft.llmdata

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The curation job body must materialize the three artifacts, account
  * for every document exactly once, and agree with the registered
  * final-corpus query. */
class CurateMainSpec extends SparkSpec {

  test("curate run materializes fates, shards, and mixture consistently") {
    val out = Files.createTempDirectory("graft-curate").toString
    val kept = CurateMain.run(spark, sf, out)
    assert(kept > 0L)

    val fates = spark.read.parquet(s"$out/final_corpus")
    // every document accounted exactly once
    assert(fates.agg(sum(col("n_docs"))).collect()(0).getLong(0) ===
      Tables.documents(spark, sf).count())
    // materialized result equals the registered query
    val direct = TextAnalysis.finalCorpus(spark, sf,
      0.2, Some(LlmQueries.JaccardDocFreqCap))
    assert(fates.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(fates).count() === 0)

    val shards = spark.read.parquet(s"$out/shards")
    assert(shards.count() > 0)
    val mixture = spark.read.parquet(s"$out/mixture")
    assert(mixture.count() ===
      Tables.documents(spark, sf).select("source").distinct().count())
  }
}
