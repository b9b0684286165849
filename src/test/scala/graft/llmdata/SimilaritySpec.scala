package graft.llmdata

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall gates for the LSH similarity path (rows-only in CORRECTNESS —
  * the hyperplane hashes aren't reproducible in DuckDB; the brute-force
  * baseline IS oracle-checked there).
  */
class SimilaritySpec extends SparkSpec {

  private val nQ = 5
  private val k = 10

  private def resultSet(df: DataFrame) =
    df.select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact = Similarity.bruteForceTopK(spark, sf, nQ, k).cache()
  private lazy val exactSet = resultSet(exact)

  test("brute-force baseline returns a full top-k per query") {
    assert(exact.count() === nQ * k)
    // ranks are 1..k per query, sims non-increasing within a query
    val badRank = exact.groupBy("query_id")
      .agg(min("rnk").as("lo"), max("rnk").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= k || col("n") =!= k)
    assert(badRank.count() === 0)
  }

  test("multiprobe LSH top-k recall ≥ 0.9 against brute force") {
    // corpus-adaptive radius (VERDICT r7 #3): small corpora probe wide
    // under the constant LshCandidateBudget — measured 1.00 at both
    // driver scales (RecallProbe)
    val lsh = resultSet(Similarity.lshTopK(spark, sf, nQ, k, multiProbe = true))
    val recall = (exactSet & lsh).size.toDouble / exactSet.size
    assert(recall >= 0.9, s"multiprobe recall $recall")
  }

  test("LSH + IVF∘PQ hold their floors at the WEAKEST grid scale (20k vectors)") {
    // VERDICT r7 #3: the published recall grid's weakest LSH cell must
    // be gated where it is weakest, not at a friendlier scale. At 20k
    // the adaptive radius has fallen to its at-scale value 1 (the
    // budget binds), so this also pins the fallback path — measured
    // 0.94 LSH / 0.98 IVF∘PQ (RecallProbe synth:20000).
    val dir = java.nio.file.Files
      .createTempDirectory("graft-recall-20k").toString
    graft.tools.SynthCorpus.embeddings(spark, 20000L)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assert(Similarity.lshProbeRadius(20000L) === 1, "budget must bind at 20k")
    val ex = resultSet(Similarity.bruteForceTopK(spark, dir, nQ, k))
    val lshR = (ex & resultSet(Similarity.lshTopK(spark, dir, nQ, k))).size.toDouble / ex.size
    assert(lshR >= 0.9, s"LSH adaptive-radius recall $lshR at 20k vectors")
    val ipR = (ex & resultSet(Similarity.ivfPqTopK(spark, dir, nQ, k))).size.toDouble / ex.size
    assert(ipR >= 0.9, s"IVF∘PQ fixed-pool recall $ipR at 20k vectors")
  }

  test("exact-bucket LSH trades recall for candidate pruning") {
    val lsh = resultSet(Similarity.lshTopK(spark, sf, nQ, k, multiProbe = false))
    val recall = (exactSet & lsh).size.toDouble / exactSet.size
    // this corpus' neighbors sit near cos≈0.3 (weak structure): exact
    // 4-bit buckets keep only ~23% of the corpus as candidates and land
    // ~0.45 recall — assert the measured floor so a regression in the
    // hashing (not the corpus) is caught
    assert(recall >= 0.4, s"exact-bucket recall $recall")
  }

  test("IVF top-k: candidates come from probed cells only, sims exact on overlap") {
    val ivf = Similarity.ivfTopK(spark, sf, nQ, k).cache()
    val ivfSet = resultSet(ivf)
    val recall = (exactSet & ivfSet).size.toDouble / exactSet.size
    // Lloyd-refined centroids (8 deterministic rounds) with the
    // CORPUS-SCALED cell count (r8 #4: 23 cells at the 500-vector
    // driver scales, probes floored at 8 → 35% scanned): measured
    // 0.78 (sf0.001) / 0.70 (sf0.01) by RecallProbe — on this
    // weak-structure corpus recall tracks the scanned fraction, so
    // the floor gates an assignment/refinement REGRESSION at this
    // fraction, not absolute quality (the fixed 16-cell model's old
    // 0.86 was bought by scanning 50% of the corpus).
    assert(recall >= 0.65, s"IVF recall $recall")
    val joined = exact.join(
      ivf.withColumnRenamed("sim", "sim_ivf").drop("rnk"),
      Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("sim") =!= col("sim_ivf")).count() === 0)
    ivf.unpersist()
  }

  test("stored IVF inverted lists equal the Column-literal assignment vector-for-vector") {
    // the memoized corpus-side index (JVM kernel + broadcast centroids)
    // must agree with the declarative literal form on EVERY vector —
    // the nearestCellLocal parity contract, asserted not assumed
    val cents = Similarity.ivfCentroidsFor(spark, sf)
    val viaColumns = Similarity.assignWithLiterals(spark,
      graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")),
      cents)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaKernel = Similarity.ivfAssignFor(spark, sf)
      .select(col("neighbor_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaKernel === viaColumns)
  }

  test("driver-kernel probe ranking equals the retired Column-literal nearestCells ranking (r10: no cells-sized plan literal)") {
    import spark.implicits._
    val cents = Similarity.ivfCentroidsFor(spark, sf)
    val cells = Similarity.ivfModelCellsFor(spark, sf)
    val e = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
    val viaColumn = e.select(col("vec_id"),
        Similarity.nearestCells(spark, col("embedding"), cents, 8).as("p"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getInt(1))
      }.toMap
    val viaKernel = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> Similarity.rankProbes(cells, v, 8) }.toMap
    assert(viaColumn === viaKernel,
      "probe ranking must be bit-identical across the two mechanisms")
  }

  test("query-FRAME probe ranking ≡ driver-path probe sets per query (r10 #2)") {
    import spark.implicits._
    val cells = Similarity.ivfModelCellsFor(spark, sf)
    val qFrame = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 20).select(col("vec_id"), col("embedding"))
    val viaFrame = Similarity.probePairsFrame(spark, qFrame, cells, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val viaDriver = qFrame.as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        id -> Similarity.rankProbes(cells, v, 8).toSet
      }.toMap
    assert(viaFrame === viaDriver,
      "executor-side probe ranking must produce the driver path's probe sets")
  }

  test("frame-path IVF and IVF∘PQ queries ≡ driver-path queries row-for-row (r10 #2)") {
    // the frame path moves probe ranking / LUT math into executors —
    // a pure execution-placement change; same kernels, same operation
    // order, so every output row (ranks AND sims) must be identical
    val ivfD = Similarity.ivfTopK(spark, sf, nQ, k).collect().toSeq
    val ivfF = Similarity.ivfTopK(spark, sf, nQ, k, frameQueries = true)
      .collect().toSeq
    assert(ivfF === ivfD, "ivfTopK frame path must not change any row")
    val pqD = Similarity.ivfPqTopK(spark, sf, nQ, k).collect().toSeq
    val pqF = Similarity.ivfPqTopK(spark, sf, nQ, k, frameQueries = true)
      .collect().toSeq
    assert(pqF === pqD, "ivfPqTopK frame path must not change any row")
  }

  test("frame-mode prune budget: within-budget plans carry the probed-cell filter, over-budget plans carry NO cells-sized literal (r11)") {
    val e = Tables.embeddings(spark, sf)
    val codes = Similarity.ivfPqCodesFor(spark, sf)
    val cents = Similarity.ivfModelCellsFor(spark, sf).map(_._2)
    val books = Similarity.ivfPqCodebooksFor(spark, sf)
    val rot = Similarity.pqRotationFor(spark, sf, Similarity.IvfPqM)
    val n = Similarity.corpusCount(spark, sf)
    def run(budget: Int): DataFrame =
      Similarity.ivfPqQueryProgram(spark, e, codes, cents, books, rot,
        n, nQ, k, 0, 0, frameQueries = true, framePruneBudget = budget)
    // budget 0 = every batch is over-budget: the filter must vanish
    // and the results must not move (the budget is an IO choice,
    // never a semantic one)
    val pruned = run(Similarity.FramePruneMaxCells)
    val full = run(0)
    assert(full.collect().toSeq === pruned.collect().toSeq,
      "dropping the prune filter must not change any row")
    // plan shape pins both sides: a regression that always prunes
    // would ride corpus-scale plans as a cells-sized IN literal — the
    // r10-retired defect class
    def hasCellInList(df: DataFrame): Boolean = {
      val p = df.queryExecution.optimizedPlan.toString
      p.contains("cell#") && (p.contains(" IN (") || p.contains("INSET"))
    }
    assert(hasCellInList(pruned),
      "within budget the probed-cell union must ride as a filter")
    assert(!hasCellInList(full),
      "over budget no cells-sized literal may ride the plan")
  }

  test("forced two-level coarse model: dense ids, full shape, exact sims, recall floor, determinism (r9 #1)") {
    val model = Similarity.ivfTwoLevelFor(spark, sf)
    // dense-id contract: cell ids are exactly 0..k-1 in array order
    assert(model.cells.map(_._1).toSeq === model.cells.indices.toSeq)
    // every corpus vector assigned to exactly one dense cluster
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(model.assign.count() === n)
    val ids = model.assign.select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(ids.subsetOf(model.cells.map(_._1).toSet))
    // ADVICE r10: the trainer's per-coarse-cell ceil rounding bounds
    // the ACTUAL cell count within [target, target + coarse cells] —
    // the documented gap between the projection (ivfIndexStatsAt) and
    // what materialized queries resolve (ivfIndexStatsActual)
    val target = Similarity.ivfDefaultCells(n)
    val coarse = Similarity.ivfFlatCells(n)
    assert(model.cells.length >= target &&
      model.cells.length <= target + coarse,
      s"actual ${model.cells.length} vs target $target (+ coarse $coarse)")
    val ivf2l = Similarity.ivfTopK(spark, sf, nQ, k, forceTable = true).cache()
    try {
      val perQ = ivf2l.groupBy("query_id").agg(count(lit(1)).as("c"))
        .filter(col("c") =!= k)
      assert(perQ.count() === 0, "full top-k per query")
      // measured 0.66 (sf0.001) / 0.74 (synth:20000) / 1.00
      // (synthc:20000) by RecallProbe — the hierarchical assignment
      // trades nothing it can't afford at this fraction
      val recall = (exactSet & resultSet(ivf2l)).size.toDouble / exactSet.size
      assert(recall >= 0.6, s"two-level IVF recall $recall")
      val joined = exact.join(
        ivf2l.withColumnRenamed("sim", "sim_2l").drop("rnk"),
        Seq("query_id", "neighbor_id"))
      assert(joined.filter(col("sim") =!= col("sim_2l")).count() === 0,
        "reported sims must be exact on overlap")
      val again = Similarity.ivfTopK(spark, sf, nQ, k, forceTable = true)
      assert(ivf2l.exceptAll(again).count() === 0 &&
        again.exceptAll(ivf2l).count() === 0, "deterministic")
    } finally { ivf2l.unpersist(); () }
  }

  test("bounded two-level trainer ≡ table trainer centroid-for-centroid, and the one-pass assignment ≡ the join+argmin form (r16)") {
    // r16: ivfTwoLevelFor trains through twoLevelCentroidsBounded
    // (driver-array rounds) — this pins it bit-identical to the
    // table-shaped twoLevelCentroids the SemDeDup path keeps, on the
    // real corpus at the IVF width, including the float bits.
    val corpus = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val n = corpus.count()
    val coarse = Similarity.ivfCentroidsFor(spark, sf)
    val width = math.max(1L, n / Similarity.ivfDefaultCells(n).toLong)
    val base = Similarity.withCoarseCell(spark, corpus, coarse)
      .localCheckpoint()
    val bounded = Similarity.twoLevelCentroidsBounded(spark, base, width)
      .map { case (c, s, cv) => (c, s, cv.toSeq) }.toSeq
      .sortBy(t => (t._1, t._2))
    val table = Similarity.twoLevelCentroids(spark, corpus, coarse, width)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toSeq))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(bounded === table)
    // the memoized model's one-pass kernel assignment must equal the
    // retired join+struct-argmin assignment row-for-row (cluster ids
    // densified by the same (cell, sub) order, sim_micro included)
    val model = Similarity.ivfTwoLevelFor(spark, sf)
    val cents = Similarity.twoLevelCentroids(spark, corpus, coarse, width)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("cell"), col("sub"))
    val dense = cents
      .withColumn("dense", row_number().over(wAll).cast("int") - 1)
    val refAssign = Similarity.assignRows(spark, base, cents)
      .join(dense.select(col("cell"), col("sub"), col("dense")),
        Seq("cell", "sub"))
      .select(col("vec_id"), col("dense").as("cluster"),
        floor(-col("neg") * lit(1000000.0) + lit(0.5))
          .cast("long").as("centroid_sim_micro"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sorted
    val got = model.assign
      .select(col("vec_id"), col("cluster"), col("centroid_sim_micro"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sorted
    assert(got === refAssign)
  }

  test("IVF defaults: verified scales pinned, cells uncapped past 1M, scanned fraction falls to <0.5% at 1B (r9 #1/#2)") {
    // pinned at the verified scales — registered outputs must not move
    assert(Similarity.ivfIndexStatsAt(500L) === ((23, 8, 12)))
    // in the flat regime the projection IS the materialized truth
    assert(Similarity.ivfIndexStatsActual(spark, sf) ===
      Similarity.ivfIndexStats(spark, sf))
    assert(Similarity.ivfIndexStatsAt(5000L) === ((71, 18, 27)))
    assert(Similarity.ivfIndexStatsAt(20000L) === ((142, 36, 54)))
    assert(Similarity.ivfIndexStatsAt(50000L) === ((224, 56, 84)))
    // the old IvfCellCap stall is gone: cells track ⌈√N⌉ past 1M
    assert(Similarity.ivfDefaultCells(1000000L) === 1000)
    assert(Similarity.ivfDefaultCells(100000000L) === 10000)
    assert(Similarity.ivfDefaultCells(1000000000L) === 31623)
    // the scanned fraction FALLS monotonically through the envelope
    val fracs = Seq(5000L, 50000L, 1000000L, 100000000L, 1000000000L)
      .map { nn =>
        val (c, p, pq) = Similarity.ivfIndexStatsAt(nn)
        (p.toDouble / c, pq.toDouble / c)
      }
    fracs.sliding(2).foreach { w =>
      assert(w(1)._1 <= w(0)._1 && w(1)._2 <= w(0)._2,
        s"scanned fraction must fall monotonically: $fracs")
    }
    // production envelope: a 1B-vector index probes ~120/180 of ~31k
    // cells — the sub-0.5% regime the planted-cluster grid justifies
    val (c1b, p1b, pq1b) = Similarity.ivfIndexStatsAt(1000000000L)
    assert(p1b.toDouble / c1b < 0.005, s"ivf 1B fraction ${p1b.toDouble / c1b}")
    assert(pq1b.toDouble / c1b < 0.006, s"ivfpq 1B fraction ${pq1b.toDouble / c1b}")
  }

  test("planted-cluster corpus: IVF/IVF∘PQ recall ≥ 0.9 at a 3% scan (the evidence for the log probe ceiling, r9 #2)") {
    // on the structure-free corpora recall ≈ scanned fraction by
    // construction (measured 0.36 at 3% on synth:20000), so they can
    // neither justify nor refute sub-fraction probing; the clustered
    // corpus measures what probe TARGETING buys — 1.00 at 3% on
    // synthc:20000 (RecallProbe). Gate a smaller clustered point here.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-recall-clustered").toString
    graft.tools.SynthCorpus.clusteredEmbeddings(spark, 2000L, nClusters = 20)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val cells = Similarity.ivfDefaultCells(2000L)
    val probes3 = math.max(1, math.ceil(0.03 * cells).toInt)
    val ex = resultSet(Similarity.bruteForceTopK(spark, dir, nQ, k))
    val ivfR = (ex & resultSet(
      Similarity.ivfTopK(spark, dir, nQ, k, probes = probes3))).size.toDouble / ex.size
    assert(ivfR >= 0.9, s"clustered IVF recall $ivfR at probes=$probes3/$cells")
    val ipR = (ex & resultSet(
      Similarity.ivfPqTopK(spark, dir, nQ, k, probes = probes3))).size.toDouble / ex.size
    assert(ipR >= 0.9, s"clustered IVF∘PQ recall $ipR at probes=$probes3/$cells")
  }

  test("PQ+rerank top-k: recall floor, exact sims, and full result shape") {
    val pq = Similarity.pqTopK(spark, sf, nQ, k).cache()
    try {
      // every query returns a full k (rerank pool R=16k ≫ k)
      val perQ = pq.groupBy("query_id").agg(count(lit(1)).as("n"))
      assert(perQ.filter(col("n") =!= k).count() === 0)
      val pqSet = resultSet(pq)
      val recall = (exactSet & pqSet).size.toDouble / exactSet.size
      // 4-bit codes in the OPQ/PCA-rotated basis with the
      // corpus-scaled rerank pool (max(16k, 15% of N) — 160 at the
      // driver scales): measured 0.92 at both sf0.001 and sf0.01
      // (RecallProbe) — floor 0.9 catches a rotation/codebook/ADC
      // regression
      assert(recall >= 0.9, s"PQ recall $recall")
      // survivors are reranked with the exact cosine ⇒ sims must be
      // bit-identical to brute force on every overlapping pair
      val joined = exact.join(
        pq.withColumnRenamed("sim", "sim_pq").drop("rnk"),
        Seq("query_id", "neighbor_id"))
      assert(joined.filter(col("sim") =!= col("sim_pq")).count() === 0)
      // determinism: a second run returns the identical result
      val again = Similarity.pqTopK(spark, sf, nQ, k)
      assert(pq.exceptAll(again).count() === 0 && again.exceptAll(pq).count() === 0)
    } finally { pq.unpersist(); () }
  }

  test("IVF∘PQ top-k: recall floor with a CONSTANT rerank pool, exact sims, determinism") {
    val ivfpq = Similarity.ivfPqTopK(spark, sf, nQ, k).cache()
    try {
      val perQ = ivfpq.groupBy("query_id").agg(count(lit(1)).as("n"))
      assert(perQ.filter(col("n") =!= k).count() === 0)
      val recall = (exactSet & resultSet(ivfpq)).size.toDouble / exactSet.size
      // residual 8-bit ADC with corpus-scaled cells/probes (r8 #4:
      // 23 cells / 12 probes at the 500-vector driver scales) and the
      // FIXED 256 pool: measured 0.86 (sf0.001/sf0.01) and 0.94 at
      // the 20k synth point (142 cells / 54 probes — the scanned
      // fraction FALLS from 52% to 38% while recall rises, the shape
      // a scaled coarse quantizer should have) by RecallProbe; the
      // pool never scales with N (VERDICT r7 #2); floor 0.8 catches a
      // residual/codebook/probe regression at the driver scales, the
      // 20k test below keeps the 0.9 floor at scale
      assert(recall >= 0.8, s"IVF∘PQ recall $recall")
      val joined = exact.join(
        ivfpq.withColumnRenamed("sim", "sim_ivfpq").drop("rnk"),
        Seq("query_id", "neighbor_id"))
      assert(joined.filter(col("sim") =!= col("sim_ivfpq")).count() === 0)
      val again = Similarity.ivfPqTopK(spark, sf, nQ, k)
      assert(ivfpq.exceptAll(again).count() === 0 &&
        again.exceptAll(ivfpq).count() === 0)
    } finally { ivfpq.unpersist(); () }
  }

  test("PQ/PCA corpus-scaled default pools hold the recall floor on a LARGER synthetic corpus") {
    // VERDICT r6 #7: the 0.9 floors were measured at driver scales,
    // where the old FIXED pools (R=160, cands=100) were a generous
    // corpus fraction; at 10× they fell to 0.38/0.58 recall
    // (RecallProbe, structure-free corpus). The defaults now scale as
    // corpus fractions (PqRerankFrac/PcaShortlistFrac, measured at
    // 20k vectors: 0.92/0.92) — this gates the SCALED defaults on a
    // 6k-vector synthetic corpus, 3× the largest driver scale, so a
    // future fixed-pool regression fails here before any 10× probe.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-recall-floor").toString
    graft.tools.SynthCorpus.embeddings(spark, 6000L)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ex = resultSet(Similarity.bruteForceTopK(spark, dir, nQ, k))
    val pqR = (ex & resultSet(Similarity.pqTopK(spark, dir, nQ, k))).size.toDouble / ex.size
    assert(pqR >= 0.85, s"PQ scaled-default recall $pqR at 6k vectors")
    val pcaR = (ex & resultSet(Similarity.pcaTopK(spark, dir, nQ, k))).size.toDouble / ex.size
    assert(pcaR >= 0.85, s"PCA scaled-default recall $pcaR at 6k vectors")
    // IVF∘PQ is the scale-correct composition: its pool is a CONSTANT
    // (256), so this larger-corpus gate proves recall holds WITHOUT
    // fraction scaling (0.96/0.96/0.98 at sf0.001/sf0.01/20k by
    // RecallProbe)
    val ipR = (ex & resultSet(Similarity.ivfPqTopK(spark, dir, nQ, k))).size.toDouble / ex.size
    assert(ipR >= 0.9, s"IVF∘PQ fixed-pool recall $ipR at 6k vectors")
  }

  test("PCA-accelerated top-k: recall floor, exact sims, determinism") {
    val pca = Similarity.pcaTopK(spark, sf, nQ, k).cache()
    try {
      val perQ = pca.groupBy("query_id").agg(count(lit(1)).as("n"))
      assert(perQ.filter(col("n") =!= k).count() === 0)
      val recall = (exactSet & resultSet(pca)).size.toDouble / exactSet.size
      // 32 of 64 spectral dims with the corpus-scaled shortlist
      // (max(100, 5% of N)): measured 0.98 (sf0.001) / 1.00 (sf0.01)
      // by RecallProbe — floor 0.9 catches a projection/shortlist
      // regression
      assert(recall >= 0.9, s"PCA recall $recall")
      // shortlist survivors rerank with the exact cosine ⇒ sims are
      // bit-identical to brute force on every overlapping pair
      val joined = exact.join(
        pca.withColumnRenamed("sim", "sim_pca").drop("rnk"),
        Seq("query_id", "neighbor_id"))
      assert(joined.filter(col("sim") =!= col("sim_pca")).count() === 0)
      val again = Similarity.pcaTopK(spark, sf, nQ, k)
      assert(pca.exceptAll(again).count() === 0 &&
        again.exceptAll(pca).count() === 0)
    } finally { pca.unpersist(); () }
  }

  test("kmeans report: partition of the corpus, cohesion bounded, deterministic") {
    val r = Similarity.kmeansReport(spark, sf).cache()
    try {
      assert(r.agg(sum(col("n_vecs"))).collect()(0).getLong(0) ===
        graft.Tables.embeddings(spark, sf).count())
      r.collect().foreach { row =>
        val c = row.getDouble(2)
        assert(c >= -1.0 - 1e-6 && c <= 1.0 + 1e-6, s"cohesion out of range: $row")
      }
      val again = Similarity.kmeansReport(spark, sf)
      assert(r.exceptAll(again).count() === 0 && again.exceptAll(r).count() === 0)
    } finally { r.unpersist(); () }
  }

  test("LSH sims equal brute-force sims for every overlapping neighbor") {
    val lsh = Similarity.lshTopK(spark, sf, nQ, k, multiProbe = true)
      .withColumnRenamed("sim", "sim_lsh").drop("rnk")
    val joined = exact.join(lsh, Seq("query_id", "neighbor_id"))
    assert(joined.filter(col("sim") =!= col("sim_lsh")).count() === 0)
  }

  test("hybrid RRF: fused score is the exact integer-rank sum, shape complete") {
    val r = Similarity.hybridRrfTopK(spark, sf, 3, 10).collect()
    def contrib(rnk: Any): Long = rnk match {
      case null => 0L
      case i: Int => math.floor(1000000.0 / (60 + i) + 0.5).toLong
    }
    // k results per query, and every row's rrf_micro is reproducible
    // from its two arm ranks — the fusion stage cannot drift
    assert(r.groupBy(_.getLong(0)).forall(_._2.length === 10))
    r.foreach { row =>
      assert(row.getLong(3) === contrib(row.get(4)) + contrib(row.get(5)),
        s"rrf mismatch on $row")
      assert(row.get(4) != null || row.get(5) != null,
        "a fused row must come from at least one arm")
    }
    // within a query, rank order follows the fused score
    r.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getInt(2))
      assert(byRank.map(_.getLong(3)).sliding(2).forall {
        case Array(a, b) => a >= b; case _ => true
      })
    }
  }

  test("hybrid RRF with the IVF∘PQ dense arm: fusion parity on agreeing pairs, shape complete (r8 #3)") {
    val brute = Similarity.hybridRrfTopK(spark, sf, nQ, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Int]),
          Option(r.get(5)).map(_.asInstanceOf[Int])))).toMap
    val swapped = Similarity.hybridRrfIvfPqTopK(spark, sf, nQ, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Int]),
          Option(r.get(5)).map(_.asInstanceOf[Int])))).toMap
    // shape: full k per query
    assert(swapped.keys.groupBy(_._1).forall(_._2.size === k))
    // fusion parity: the lex arm is literally shared and the fusion
    // math is a pure function of the two integer ranks — wherever the
    // IVF∘PQ arm agreed with the brute arm on a pair's dense rank
    // (or both arms missed it), the fused score must be IDENTICAL
    val common = brute.keySet & swapped.keys.toSet
    assert(common.nonEmpty)
    var agreeing = 0
    common.foreach { key =>
      val (bScore, bDense, bLex) = brute(key)
      val (sScore, sDense, sLex) = swapped(key)
      assert(bLex === sLex, s"lex arm must be identical at $key")
      if (bDense == sDense) {
        agreeing += 1
        assert(bScore === sScore, s"fused score diverged at $key with equal arms")
      }
    }
    assert(agreeing > 0, "no agreeing pair — dense recall collapsed")
    // at the measured dense recall (0.86 at the driver scales) the
    // fused top-k survives the swap almost entirely
    val overlap = common.size.toDouble / brute.size
    assert(overlap >= 0.8, s"fused top-k overlap $overlap after the arm swap")
  }

  test("MMR rerank equals a driver-side greedy reference and is shape-complete") {
    val (nQ, m, k, lam) = (3, 20, 8, 0.7)
    val got = Similarity.mmrRerank(spark, sf, nQ, m, k, lam).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))
    // shape: k rows per query, ranks 1..k, no duplicate picks
    val byQ = got.groupBy(_._1)
    assert(byQ.size === nQ)
    byQ.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === (1 to k))
      assert(rows.map(_._2).distinct.length === k)
    }
    // reference: independent greedy over the collected top-m candidates
    val cand = Similarity.bruteForceTopK(spark, sf, nQ, m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val expected = cand.groupBy(_._1).flatMap { case (qid, rows) =>
      var pool = rows.map { case (_, nid, sim) => (nid, sim) }
        .sortBy { case (nid, sim) => (-sim, nid) }.toBuffer
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
      while (sel.length < k && pool.nonEmpty) {
        val scored = pool.map { case (nid, sim) =>
          val pen =
            if (sel.isEmpty) 0.0
            else sel.map(s => Similarity.cosine6(vecs(nid), vecs(s._2))).max
          val sc = if (sel.isEmpty) sim else lam * sim - (1.0 - lam) * pen
          (nid, sim, sc)
        }
        val best = scored.minBy { case (nid, _, sc) => (-sc, nid) }
        sel += ((qid, best._1, sel.length + 1, best._2))
        pool = pool.filterNot(_._1 == best._1)
      }
      sel
    }.toSet
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSet === expected)
  }

  test("MMR with λ=1 degenerates to the brute-force top-k ordering") {
    val mmr = Similarity.mmrRerank(spark, sf, 3, 20, 10, lambda = 1.0)
      .select(col("query_id"), col("neighbor_id"), col("mmr_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(spark, sf, 3, 10)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(mmr === brute)
  }

  test("MMR with λ=0 diversifies: picks differ from pure relevance order") {
    val diverse = Similarity.mmrRerank(spark, sf, 3, 20, 10, lambda = 0.0)
      .select(col("query_id"), col("neighbor_id"), col("mmr_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.mmrRerank(spark, sf, 3, 20, 10, lambda = 1.0)
      .select(col("query_id"), col("neighbor_id"), col("mmr_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(diverse !== brute,
      "pure-diversity selection should reorder at least one query's picks")
  }

  test("label diversity equals the driver-side micro-exact reference") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).toArray))
    // reference: same normalize → micro-quantize → exact-long pipeline
    val byLabel = vecs.groupBy(_._1)
    val expected = byLabel.map { case (label, vs) =>
      val units = vs.map(_._2).flatMap { v =>
        var n2 = 0.0
        v.foreach { x => n2 += x.toDouble * x.toDouble }
        val nrm = math.sqrt(n2)
        if (nrm > 0)
          Some(v.map(x => math.floor(x.toDouble / nrm * 1000000.0 + 0.5).toLong))
        else None
      }
      val dims = units.head.length
      val s2 = (0 until dims).map { d =>
        val mean = units.map(_(d)).sum.toDouble / 1000000.0 / units.length
        math.floor(mean * mean * 1000000.0 + 0.5).toLong
      }.sum
      val mn = math.sqrt(s2.toDouble / 1000000.0)
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      label -> ((units.length.toLong, r6(mn), r6(1.0 - mn)))
    }
    val got = Similarity.labelDiversity(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got === expected)
    // sanity: a real topic structure is neither collapsed nor orthogonal
    got.values.foreach { case (_, mn, dv) =>
      assert(mn > 0.0 && mn < 1.0 && math.abs(dv - (1.0 - mn)) < 2e-6)
    }
  }

  test("pca: orthonormal basis, eigvals ≡ projected variance, trace preserved, reconstruction exact") {
    val m = Similarity.pcaModelFor(spark, sf)
    val d = m.mean.length
    // orthonormal components (rows of comps)
    for (i <- m.comps.indices; j <- i until m.comps.length) {
      val dotv = m.comps(i).zip(m.comps(j)).map { case (x, y) => x * y }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dotv - expect) < 1e-8, s"comp $i · comp $j = $dotv")
    }
    // eigenvalues descending and non-negative (to solver tolerance)
    m.eigvals.sliding(2).foreach { w => assert(w(0) >= w(1) - 1e-12) }
    assert(m.eigvals.forall(_ > -1e-10))
    // Σλ equals the covariance trace computed by an independent
    // driver-side reference over the same (micro-quantized) data
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1e6 + 0.5) / 1e6).toArray)
    val n = vecs.length
    val mu = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val trace = (0 until d).map { i =>
      vecs.map(v => (v(i) - mu(i)) * (v(i) - mu(i))).sum / n
    }.sum
    assert(math.abs(m.eigvals.sum - trace) < 1e-6,
      s"sum λ ${m.eigvals.sum} vs trace $trace")
    // per-component projected variance equals its eigenvalue
    val proj = Similarity.pcaProject(spark, sf, 4).collect()
    for (j <- 1 to 4) {
      val ys = proj.map(_.getDouble(1 + j))
      val vbar = ys.sum / ys.length
      val varJ = ys.map(y => (y - vbar) * (y - vbar)).sum / ys.length
      assert(math.abs(varJ - m.eigvals(j - 1)) < 1e-4,
        s"var(pc$j) $varJ vs λ ${m.eigvals(j - 1)}")
    }
    // full-rank reconstruction: x − μ = Σ_j y_j v_j for any orthonormal
    // basis — checked driver-side on a handful of vectors
    vecs.take(5).foreach { x =>
      val ys = m.comps.map(cj =>
        (0 until d).map(i => (x(i) - m.mean(i)) * cj(i)).sum)
      (0 until d).foreach { i =>
        val rec = m.mean(i) + m.comps.indices.map(j => ys(j) * m.comps(j)(i)).sum
        assert(math.abs(rec - x(i)) < 1e-6)
      }
    }
    // bit-determinism: an independent (memo-bypassing) training run
    // yields the identical model
    val m2 = Similarity.trainPca(spark, Tables.embeddings(spark, sf))
    assert(m2.mean.sameElements(m.mean))
    assert(m2.eigvals.sameElements(m.eigvals))
    assert(m2.comps.zip(m.comps).forall { case (x, y) => x.sameElements(y) })
  }

  test("sq8 quantization: error bounded by half a step, grid values exact") {
    // corpus run: every dim's max error must stay within half a
    // quantization step of that dim's range
    val rows = Similarity.sq8Report(spark, sf).collect()
    assert(rows.length === 64)
    rows.foreach { r =>
      val (vmin, vmax, maxErr) = (r.getDouble(2), r.getDouble(3), r.getLong(5))
      val halfStep = (vmax - vmin) / 255.0 / 2.0
      assert(maxErr <= math.floor(halfStep * 1e8 + 0.5).toLong + 1,
        s"reconstruction error exceeds half a step: $r")
    }
    // crafted: components already on the 0..255 integer grid ⇒ scale 1,
    // zero reconstruction error everywhere
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sq8").toString
    Seq((1L, Array(0f, 255f), "a"), (2L, Array(255f, 0f), "a"),
        (3L, Array(128f, 128f), "a"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val g = Similarity.sq8Report(spark, tmp).collect()
    assert(g.forall(_.getLong(4) === 0L), "grid-aligned values must be exact")
  }

  test("cosine is symmetric and self-similarity is 1") {
    val e = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val cross = a.join(b, col("ia") <= col("ib"))
      .withColumn("sab", Similarity.cosine(col("va"), col("vb")))
      .withColumn("sba", Similarity.cosine(col("vb"), col("va")))
    assert(cross.filter(col("sab") =!= col("sba")).count() === 0)
    assert(cross.filter(col("ia") === col("ib") && col("sab") =!= 1.0).count() === 0)
  }

  test("recall under drift: a SHIFTED shard appended at the rebuild threshold holds the measured floor (r11 #3)") {
    // the RecallProbe drift grid's case at AnnIndex.RebuildDeltaFraction,
    // scaled down for the suite (nBase 2000; the full grid at 10k is
    // recorded in SURVEY §2.13: appended 0.96–0.98 vs rebuilt 1.000
    // across fractions 0.05–0.50). The frozen-model penalty must stay
    // bounded at the fraction the trigger fires at — 0.85 is the
    // measured small-scale value minus margin.
    val (appended, rebuilt, frac, boosted) = RecallProbe.driftCase(
      spark, nBase = 2000, fraction = AnnIndex.RebuildDeltaFraction,
      nQ = 10, k = 10)
    assert(math.abs(frac - AnnIndex.RebuildDeltaFraction) < 0.01,
      s"delta fraction off: $frac")
    assert(rebuilt >= 0.9, s"rebuilt index recall collapsed: $rebuilt")
    assert(appended >= 0.85,
      s"appended-index recall under drift fell through the floor: " +
        s"$appended (rebuilt: $rebuilt)")
    // the drift-compensating probe knob buys the margin back without
    // a rebuild (r14 #7): floor ≥ 0.9 with the knob on, and never
    // below the default-probe recall
    assert(boosted >= 0.9,
      s"drift-aware probes did not restore the appended floor: " +
        s"$boosted (default-probe appended: $appended)")
    assert(boosted >= appended,
      s"drift-aware probes LOWERED recall: $boosted < $appended")
  }
}
