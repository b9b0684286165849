package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The persisted ANN index must change WHERE the index lives, never
  * the answer: stored-path results row-for-row equal the memoized
  * path's, the cell partition key physically prunes unprobed files,
  * and the build is an idempotent overwrite. */
class AnnIndexSpec extends SparkSpec {

  private lazy val indexDir = {
    val d = Files.createTempDirectory("graft-annindex").toString
    AnnIndex.write(spark, sf, d)
    d
  }

  test("meta round-trips and matches the corpus") {
    val meta = AnnIndex.readMeta(spark, indexDir)
    assert(meta.n === graft.Tables.embeddings(spark, sf).count())
    assert(meta.cells === Similarity.ivfModelCellsFor(spark, sf).length)
    assert(meta.dims === 64)
  }

  test("stored-index query ≡ memoized-index query row-for-row") {
    val stored = AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10).collect()
    val memo = Similarity.ivfPqTopK(spark, sf, 5, 10).collect()
    assert(stored.length === memo.length)
    stored.zip(memo).foreach { case (a, b) =>
      assert(a === b, "persistence must not change any row")
    }
  }

  test("probed-cell filter prunes parquet partitions: unprobed cell files are never read") {
    val codes = s"$indexDir/codes.parquet"
    val allCells = spark.read.parquet(codes)
      .select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
    assert(allCells.size > 4, "need enough cells for pruning to mean anything")
    val probed = allCells.toSeq.sorted.take(2)
    val files = spark.read.parquet(codes)
      .filter(col("cell").isin(probed: _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(probed.exists(c => f.contains(s"cell=$c/")),
        s"file outside the probed partitions was read: $f")
    }
    // and the full (unfiltered) scan does touch more partitions
    val allFiles = spark.read.parquet(codes)
      .select(input_file_name().as("f")).distinct().count()
    assert(allFiles > files.length.toLong)
  }

  test("rebuild is an idempotent overwrite; IndexMain.run reports the same meta") {
    val meta2 = IndexMain.run(spark, sf, indexDir)
    assert(meta2 === AnnIndex.readMeta(spark, indexDir))
    val stored = AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10).collect()
    val memo = Similarity.ivfPqTopK(spark, sf, 5, 10).collect()
    assert(stored.toSeq === memo.toSeq)
  }
}
