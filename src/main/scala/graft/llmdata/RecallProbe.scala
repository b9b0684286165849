package graft.llmdata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: measures each approximate ANN path's recall@k
  * against [[Similarity.bruteForceTopK]] on a corpus dir, across a
  * small grid of the knob that governs that path's cost/recall trade
  * (IVF probes, PQ rerank pool, PCA dims × shortlist). Used to SET the
  * SimilaritySpec recall floors from measurements instead of hope —
  * run it whenever the index structure or the corpus generator
  * changes:
  *
  * {{{
  * sbt -batch "runMain graft.llmdata.RecallProbe /root/testdata/sf0.001"
  * sbt -batch "runMain graft.llmdata.RecallProbe synth:20000"   // 10x corpus
  * }}}
  *
  * `synth:<nVecs>` generates the deterministic
  * [[graft.tools.SynthCorpus]] embeddings at that size into a temp dir
  * first (VERDICT r6 #7: the recall floors must hold on the 10×
  * corpus, not just the driver scales).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spec = args.headOption.getOrElse("/root/testdata/sf0.001")
    val (nQ, k) = (args.lift(1).map(_.toInt).getOrElse(5),
      args.lift(2).map(_.toInt).getOrElse(10))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir =
      if (spec.startsWith("synth:")) {
        val n = spec.stripPrefix("synth:").toLong
        val d = java.nio.file.Files
          .createTempDirectory(s"graft-recall-synth$n").toString
        graft.tools.SynthCorpus.embeddings(spark, n)
          .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
        d
      } else if (spec.startsWith("synthc:")) {
        // planted-cluster corpus (VERDICT r9 #2): the regime where
        // recall is governed by probe targeting, not scanned fraction
        val n = spec.stripPrefix("synthc:").toLong
        val d = java.nio.file.Files
          .createTempDirectory(s"graft-recall-synthc$n").toString
        graft.tools.SynthCorpus.clusteredEmbeddings(spark, n)
          .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
        d
      } else spec

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(spark, dir, nQ, k))
    def recall(df: DataFrame): Double =
      (exact & pairs(df)).size.toDouble / exact.size

    val n = Similarity.corpusCount(spark, dir)
    val (cells, ivfP, ivfpqP) = Similarity.ivfIndexStatsAt(n)
    println(f"corpus=$dir nQ=$nQ k=$k exact_pairs=${exact.size} " +
      f"cells=$cells ivf_probes=$ivfP ivfpq_probes=$ivfpqP")
    for (p <- Seq(2, 4, 6, 8))
      println(f"ivf   probes=$p%-2d                recall=${
        recall(Similarity.ivfTopK(spark, dir, nQ, k, probes = p))}%.3f")
    // scanned-fraction grid (VERDICT r9 #2): recall at 25%/10%/3% of
    // the cells — on the clustered corpus (synthc:) these justify the
    // log-growth probe ceiling; on the structure-free corpora recall
    // tracks the fraction by construction
    for (frac <- Seq(0.25, 0.10, 0.03)) {
      val p = math.max(1, math.ceil(frac * cells).toInt)
      println(f"ivf   probes=$p%-3d (${frac * 100}%2.0f%% scanned)  recall=${
        recall(Similarity.ivfTopK(spark, dir, nQ, k, probes = p))}%.3f")
      println(f"ivfpq probes=$p%-3d (${frac * 100}%2.0f%% scanned)  recall=${
        recall(Similarity.ivfPqTopK(spark, dir, nQ, k, probes = p))}%.3f")
    }
    println(f"ivf   corpus-scaled default      recall=${
      recall(Similarity.ivfTopK(spark, dir, nQ, k))}%.3f")
    println(f"ivf   forced two-level table     recall=${
      recall(Similarity.ivfTopK(spark, dir, nQ, k, forceTable = true))}%.3f")
    for (rf <- Seq(4, 8, 12, 16, 64, 200, 300))
      println(f"pq    rerankFactor=$rf%-3d         recall=${
        recall(Similarity.pqTopK(spark, dir, nQ, k, rerankFactor = rf))}%.3f")
    println(f"pq    corpus-scaled default      recall=${
      recall(Similarity.pqTopK(spark, dir, nQ, k))}%.3f")
    for (rp <- Seq(64, 160, 256, 512))
      println(f"ivfpq rerankPool=$rp%-4d          recall=${
        recall(Similarity.ivfPqTopK(spark, dir, nQ, k, rerankPool = rp))}%.3f")
    for (p <- Seq(8, 10, 12))
      println(f"ivfpq probes=$p%-2d pool=256        recall=${
        recall(Similarity.ivfPqTopK(spark, dir, nQ, k, probes = p, rerankPool = 256))}%.3f")
    println(f"ivfpq fixed default              recall=${
      recall(Similarity.ivfPqTopK(spark, dir, nQ, k))}%.3f")
    for ((d, c) <- Seq((8, 50), (16, 50), (16, 100), (24, 100), (32, 100),
        (24, 400), (32, 400), (32, 1000), (32, 2000)))
      println(f"pca   dims=$d%-2d cands=$c%-4d       recall=${
        recall(Similarity.pcaTopK(spark, dir, nQ, k, pcaDims = d, nCandidates = c))}%.3f")
    println(f"pca   corpus-scaled default      recall=${
      recall(Similarity.pcaTopK(spark, dir, nQ, k))}%.3f")
    for (mp <- Seq(false, true))
      println(f"lsh   multiProbe=$mp%-5s          recall=${
        recall(Similarity.lshTopK(spark, dir, nQ, k, multiProbe = mp))}%.3f")
    println(f"lsh   fixed radius=1 (at-scale)  recall=${
      recall(Similarity.lshTopK(spark, dir, nQ, k, probeRadius = 1))}%.3f")
    spark.stop()
  }
}
