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
    case "flat" =>
      // replicate ivfCentroids step by step with timing
      import spark.implicits._
      val corpus0 = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val numCells = Similarity.ivfFlatCells(corpus0.count())
      println(s"[scratch-llm] numCells=$numCells")
      val vecs = corpus0.cache()
      timed("cache + count") { vecs.count(); () }
      val nn = vecs.count()
      val step = math.max(1L, nn / numCells)
      var cents: Array[(Int, Seq[Float])] = null
      timed("seed collect") {
        cents = vecs.filter(col("vec_id") % step === 0 &&
            col("vec_id") < step * numCells)
          .orderBy(col("vec_id")).collect().zipWithIndex
          .map { case (r, i) => i -> r.getSeq[Float](r.fieldIndex("embedding")) }
      }
      for (i <- 0 until 8) {
        timed(s"flat iter $i") {
          val bc = spark.sparkContext.broadcast(
            cents.sortBy(_._1).map(_._2.toArray))
          val means = vecs.as[(Long, Array[Float])]
            .mapPartitions { it =>
              val ct = bc.value
              it.map { case (_, v) => (Similarity.nearestCellLocal(ct, v), v) }
            }
            .toDF("cell", "embedding")
            .select(col("cell"), posexplode(col("embedding")))
            .groupBy(col("cell"), col("pos"))
            .agg((sum(col("col").cast("decimal(28,12)")) / count(lit(1))).as("m"))
            .collect()
            .map(r => (r.getInt(0), r.getInt(1), r.getDecimal(2).doubleValue.toFloat))
            .groupBy(_._1)
          cents = cents.map { case (cid, old) =>
            cid -> means.get(cid).fold(old)(_.sortBy(_._2).map(_._3).toSeq)
          }
        }
      }
      vecs.unpersist()
    case "2li" =>
      val corpus = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      timed("corpus count") { corpus.count(); () }
      timed("flat coarse (cold)") {
        Similarity.ivfCentroidsFor(spark, sfDir); ()
      }
      val coarse = Similarity.ivfCentroidsFor(spark, sfDir)
      println(s"[scratch-llm] coarse cells = ${coarse.length}")
      val n = corpus.count()
      val width = math.max(1L, n / Similarity.ivfDefaultCells(n).toLong)
      println(s"[scratch-llm] n=$n width=$width")
      var base: org.apache.spark.sql.DataFrame = null
      timed("base = withCoarseCell + ckpt") {
        base = Similarity.withCoarseCell(spark, corpus, coarse)
          .localCheckpoint()
      }
      println(s"[scratch-llm] base partitions = ${base.rdd.getNumPartitions}")
      var cents: org.apache.spark.sql.DataFrame = null
      timed("seeds + ckpt") {
        cents = Similarity.twoLevelSeeds(spark, base, width)
          .repartition(1).localCheckpoint()
      }
      println(s"[scratch-llm] cents rows = ${cents.count()}")
      for (i <- 0 until 3) {
        timed(s"iteration $i") {
          cents = Similarity.twoLevelIteration(spark, base, cents)
        }
      }
      // fixed job-latency probes: how much does ANY action cost here?
      for (i <- 0 until 3)
        timed(s"trivial action $i (range.count)") {
          spark.range(100).toDF("id").count(); ()
        }
      for (i <- 0 until 3)
        timed(s"tiny 2-stage agg $i") {
          spark.range(1000).toDF("id")
            .groupBy(col("id") % 7).agg(count(lit(1))).count(); ()
        }
      for (i <- 0 until 3)
        timed(s"base ckpt job $i") {
          base.localCheckpoint(); ()
        }
      // one flat-trainer-shaped iteration: kernel assign + means + collect
      locally {
        import spark.implicits._
        val vecs = corpus.cache()
        vecs.count()
        val ct0 = coarse.sortBy(_._1).map(_._2.toArray)
        for (i <- 0 until 3)
          timed(s"flat-shaped iter $i") {
            val bc = spark.sparkContext.broadcast(ct0)
            vecs.as[(Long, Array[Float])]
              .mapPartitions { it =>
                val ct = bc.value
                it.map { case (_, v) => (Similarity.nearestCellLocal(ct, v), v) }
              }
              .toDF("cell", "embedding")
              .select(col("cell"), posexplode(col("embedding")))
              .groupBy(col("cell"), col("pos"))
              .agg((sum(col("col").cast("decimal(28,12)")) / count(lit(1))).as("m"))
              .collect()
            ()
          }
        for (i <- 0 until 3)
          timed(s"flat-shaped iter $i (double sum)") {
            val bc = spark.sparkContext.broadcast(ct0)
            vecs.as[(Long, Array[Float])]
              .mapPartitions { it =>
                val ct = bc.value
                it.map { case (_, v) => (Similarity.nearestCellLocal(ct, v), v) }
              }
              .toDF("cell", "embedding")
              .select(col("cell"), posexplode(col("embedding")))
              .groupBy(col("cell"), col("pos"))
              .agg((sum(col("col")) / count(lit(1))).as("m"))
              .collect()
            ()
          }
        vecs.unpersist()
      }
      for (i <- 0 until 3)
        timed(s"means-shaped job $i (no bcast)") {
          Similarity.assignRows(spark, base, cents)
            .select(col("cell"), col("sub"), posexplode(col("embedding")))
            .groupBy(col("cell"), col("sub"), col("pos"))
            .agg((sum(col("col").cast("decimal(28,12)")) / count(lit(1))).as("m"))
            .write.format("noop").mode("overwrite").save()
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
