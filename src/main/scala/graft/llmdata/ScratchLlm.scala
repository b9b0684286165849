package graft.llmdata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** llmdata-private arm of the disposable [[graft.tools.Scratch]]
  * profiler (r16) — NOT part of any driver contract; exists so scratch
  * modes can time `private[llmdata]` build phases without widening
  * their visibility. */
object ScratchLlm {
  def run(spark: SparkSession, sfDir: String, mode: String,
          timed: String => (=> Unit) => Unit,
          drive: DataFrame => Unit): Unit = mode match {
    case "2l" =>
      val corpus = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      timed("flat coarse (ivfCentroidsFor)") {
        Similarity.ivfCentroidsFor(spark, sfDir); ()
      }
      val coarse = Similarity.ivfCentroidsFor(spark, sfDir)
      val n = corpus.count()
      val width = math.max(1L, n / Similarity.ivfDefaultCells(n).toLong)
      timed("twoLevelCentroids (8 iters)") {
        Similarity.twoLevelCentroids(spark, corpus, coarse, width); ()
      }
      timed("full ivfTwoLevelFor (memoized)") {
        Similarity.ivfTwoLevelFor(spark, sfDir); ()
      }
      timed("2l query (warm model)") {
        drive(Similarity.ivfTopK(spark, sfDir, 5, 10, forceTable = true))
      }
    case "ddl" =>
      timed("dd_clusters (1)") {
        drive(Dedup.nearDupClusters(spark, sfDir, 0.2,
          maxDocFreq = Some(LlmQueries.JaccardDocFreqCap)))
      }
      timed("dd_clusters (2)") {
        drive(Dedup.nearDupClusters(spark, sfDir, 0.2,
          maxDocFreq = Some(LlmQueries.JaccardDocFreqCap)))
      }
      timed("dd_delta (1)") {
        drive(Dedup.dedupDelta(spark, sfDir, 0.2,
          maxDocFreq = Some(LlmQueries.JaccardDocFreqCap)))
      }
      timed("dd_delta (2)") {
        drive(Dedup.dedupDelta(spark, sfDir, 0.2,
          maxDocFreq = Some(LlmQueries.JaccardDocFreqCap)))
      }
    case other =>
      println(s"[scratch-llm] unknown mode $other")
  }
}
