package graft.llmdata

import graft.{SparkSpec, Tables}
import graft.sync.{GenDir, ManifestStore}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The trained quality classifier's contract (r15, VERDICT r14 #6):
  * closed-form NB log-odds over hashed unigrams SEPARATE a planted
  * gold-vs-junk contrast; served scores equal a from-scratch
  * driver-side reference bit-for-bit; and ingest fates FOLLOW the
  * artifact-served scores exactly when the deployment knob is on —
  * the ingest_lm_gate discipline applied to a trained model. */
class QualityStoreSpec extends SparkSpec {

  /** Planted contrast corpus (Tables layout): gold sources carry a
    * clean vocabulary, junk sources a disjoint spammy one — real
    * lexical signal, unlike the driver corpus' content-independent
    * source labels. 200 docs, 30 tokens each, deterministic. */
  private lazy val planted: String = {
    import spark.implicits._
    val goldV = (1 to 40).map(i => s"good$i")
    val junkV = (1 to 40).map(i => s"spam$i")
    val rows = (0 until 200).map { d =>
      val gold = d % 2 == 0
      val v = if (gold) goldV else junkV
      val text = (0 until 30).map(i => v((d * 7 + i * 3) % 40)).mkString(" ")
      (d.toLong, text, "en",
        if (gold) s"src${d % 2}" else s"junk${d % 2}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-quality-corpus").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings table so Ingest.bootstrap has its ANN side: the real
    // corpus' 64-dim shape with per-doc variety (a degenerate
    // few-distinct-vectors table starves the PQ codebook training)
    (0 until 200).map(d => (d.toLong,
      Array.tabulate(64)(j => math.sin(d * 0.37 + j * 1.3).toFloat)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("trained log-odds separate the planted gold/junk contrast on held-out docs") {
    val qDir = Files.createTempDirectory("graft-quality-model").toString
    // train on doc_id % 5 != 0, score the held-out fifth
    QualityStore.write(spark, planted, qDir,
      keep = col("doc_id") % 5 =!= 0)
    val held = Tables.documents(spark, planted)
      .filter(col("doc_id") % 5 === 0)
    val scored = QualityStore.score(spark, qDir,
        held.select(col("doc_id"), col("text")))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logodds"))
    assert(scored.length === 40)
    scored.foreach { case (id, s) =>
      if (id % 2 == 0) assert(s > 0.0, s"gold doc $id scored $s")
      else assert(s < 0.0, s"junk doc $id scored $s")
    }
  }

  test("served scores equal a from-scratch driver-side reference bit-for-bit") {
    val qDir = Files.createTempDirectory("graft-quality-ref").toString
    QualityStore.write(spark, planted, qDir)
    // driver-side reference: recompute counts, weights, and micro sums
    val docs = Tables.documents(spark, planted)
      .select(col("doc_id"), col("text"), QualityStore.goldLabel.as("pos"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    def bucket(t: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 3)
    }
    val cPos = scala.collection.mutable.Map.empty[String, Long]
    val cNeg = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text, pos) =>
      text.split(" ").foreach { t =>
        val b = bucket(t)
        if (pos) cPos(b) = cPos.getOrElse(b, 0L) + 1
        else cNeg(b) = cNeg.getOrElse(b, 0L) + 1
      }
    }
    val (tp, tn) = (cPos.values.sum, cNeg.values.sum)
    val B = QualityStore.Buckets
    def wMicro(b: String): Long = math.floor(
      (math.log((cPos.getOrElse(b, 0L) + 1).toDouble / (tp + B)) -
        math.log((cNeg.getOrElse(b, 0L) + 1).toDouble / (tn + B))) * 1e6
        + 0.5).toLong
    val want = docs.map { case (id, text, _) =>
      id -> text.split(" ").map(t => wMicro(bucket(t))).sum
    }.toMap
    val got = QualityStore.score(spark, qDir,
        Tables.documents(spark, planted).select(col("doc_id"), col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want, "served micro sums diverged from the reference")
  }

  test("a one-sided corpus is refused loudly, leaving no committed generation") {
    val qDir = Files.createTempDirectory("graft-quality-oneside").toString
    val e = intercept[IllegalStateException] {
      QualityStore.write(spark, planted, qDir,
        positive = lit(true)) // every doc positive
    }
    assert(e.getMessage.contains("ONE-SIDED"))
    assert(GenDir.newest(spark, qDir).isEmpty)
  }

  test("ingest fates FOLLOW the artifact-served scores exactly when the knob is on (the LM-signal discipline)") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-quality-ingest").toString
    val dirs = Ingest.dirsUnder(work)
    Ingest.bootstrap(spark, planted, dirs, 10, 7)
    // the deployment's classifier: trained on the SAME base split the
    // other artifacts bootstrap from
    QualityStore.write(spark, planted, dirs.qualityDir,
      keep = col("doc_id") % 10 =!= 7)
    // a fresh shard with one clearly-gold and one clearly-junk doc
    // (unique urls, fresh ids, 25 distinct tokens so the heuristics
    // pass and only the classifier decides)
    val goldText = (1 to 25).map(i => s"good$i").mkString(" ")
    val junkText = (1 to 25).map(i => s"spam$i").mkString(" ")
    val rows = Seq((9200001L, goldText, "srcq"),
      (9200002L, junkText, "srcq")).toDF("doc_id", "text", "source")
    val uniqueUrl =
      concat(lit("https://q.example/"), col("doc_id").cast("string"))
    // expected fates derive from the SERVED scores — the parity claim
    val scores = QualityStore.score(spark, dirs.qualityDir,
        rows.select(col("doc_id"), col("text"))).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_logodds")).toMap
    assert(scores(9200001L) > 0.0 && scores(9200002L) < 0.0, scores.toString)
    val st = Ingest.run(spark, dirs, Tables.documents(spark, planted),
      rows, Tables.embeddings(spark, planted).filter(lit(false))
        .select(col("vec_id"), col("embedding")),
      0L, rawUrl = uniqueUrl, qualityMinLogOdds = Some(0.0))
    assert(st.nRaw === 2L)
    val fates = ManifestStore.readStore(spark, dirs.ledgerDir).get
      .filter(col("fate") =!= Ingest.DoneFate)
      .select(col("doc_id"), col("fate")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fates(9200001L) === "kept",
      s"gold-side doc must pass the classifier gate: $fates")
    assert(fates(9200002L) === "filtered",
      s"junk-side doc must be filtered by the served score: $fates")
    // knob OFF: the same junk doc is KEPT — the classifier gate is a
    // deployment choice, never an implicit behavior change
    val work2 = Files.createTempDirectory("graft-quality-ingest2").toString
    val dirs2 = Ingest.dirsUnder(work2)
    Ingest.bootstrap(spark, planted, dirs2, 10, 7)
    val st2 = Ingest.run(spark, dirs2, Tables.documents(spark, planted),
      rows.filter(col("doc_id") === 9200002L),
      Tables.embeddings(spark, planted).filter(lit(false))
        .select(col("vec_id"), col("embedding")),
      0L, rawUrl = uniqueUrl)
    assert(st2.fates.getOrElse("kept", 0L) === 1L, s"fates: ${st2.fates}")
  }

  test("the registered entry is deterministic and covers the full shard") {
    val n = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 7).count()
    val a = Ingest.ingestQualityGate(spark, sf).collect().map(_.toString)
    val b = Ingest.ingestQualityGate(spark, sf).collect().map(_.toString)
    assert(a.length.toLong === n)
    assert(a.toSeq === b.toSeq)
  }
}
