package graft.llmdata

import graft.{SparkSpec, Tables}
import graft.sync.{GenDir, ManifestStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The composed ingestion job's contract (VERDICT r11 #1): a crash at
  * ANY seam — including BETWEEN the two index appends, the window the
  * verdict names — followed by a re-run of the same shard converges
  * EVERY artifact (postings, ANN index, both gate indexes, ledger) to
  * exactly the unbroken run's state, with no double-appended delta
  * anywhere. Plus the r11 #8 auto-compaction trigger and the fate
  * classifier's non-vacuity. */
class IngestMainSpec extends SparkSpec {

  private def shardMod = 10
  private def shardRem = 7

  private def docs = Tables.documents(spark, sf)
  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))
  private def baseDocs = docs.filter(col("doc_id") % shardMod =!= shardRem)
  private def shard = docs.filter(col("doc_id") % shardMod === shardRem)
  private def shardEmb = emb.filter(col("vec_id") % shardMod === shardRem)

  private def freshDirs(): Ingest.Dirs = {
    val work = Files.createTempDirectory("graft-ingest-spec").toString
    val dirs = Ingest.dirsUnder(work)
    Ingest.bootstrap(spark, sf, dirs, shardMod, shardRem)
    dirs
  }

  /** Everything observable about the artifact set, for convergence
    * comparison: postings rows + scalars, ANN answers, both gates'
    * key sets, per-artifact delta counts, and the ledger fates. */
  private def stateOf(dirs: Ingest.Dirs): (Set[String], (Long, Long),
      Seq[String], Set[String], Set[String], (Int, Int, Int),
      Map[String, Long]) = {
    val h = LexStore.open(spark, dirs.lexDir)
    val post = LexStore.loadAt(spark, h,
      Seq("vector", "window", "merge", "spark"))
    val postRows = post.post.collect().map(_.toString).toSet
    val ann = AnnIndex.ivfPqTopK(spark, sf, dirs.annDir, 5, 10)
      .collect().map(_.toString).toSeq
    val shingle = Dedup.loadBandIndex(spark, dirs.shingleGateDir)
      .collect().map(_.toString).toSet
    val embIdx = Dedup.loadEmbedBandIndex(spark, dirs.embedGateDir)
    val embKeys = embIdx.keys.collect().map(_.toString).toSet
    def nDeltas(root: String): Int =
      GenDir.deltas(spark, GenDir.newest(spark, root).get._2).length
    val fates = ManifestStore.readStore(spark, dirs.ledgerDir).get
      .groupBy(col("fate")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (postRows, (h.n, h.sumDl), ann, shingle, embKeys,
      (nDeltas(dirs.lexDir), nDeltas(dirs.shingleGateDir),
        nDeltas(dirs.embedGateDir)), fates)
  }

  private lazy val unbroken: (Ingest.Dirs, Ingest.Status) = {
    val dirs = freshDirs()
    val st = Ingest.run(spark, dirs, baseDocs, shard, shardEmb, 0L)
    (dirs, st)
  }

  test("the unbroken run ingests, attributes fates, and the classifier is non-vacuous") {
    val (dirs, st) = unbroken
    assert(!st.replayed)
    assert(st.nRaw === shard.count())
    assert(st.fates.getOrElse("kept", 0L) > 0, s"fates: ${st.fates}")
    // the crawl-url generator plants canonical-URL collisions at every
    // scale, so the URL arm must fire on a shard-vs-base split too
    assert(st.fates.getOrElse("url_dup", 0L) > 0,
      s"url arm vacuous: ${st.fates}")
    assert(st.fates.values.sum === st.nRaw)
    assert(st.lexDocs === st.fates("kept"))
    assert(st.annRows === st.fates("kept"))
    assert(st.shingleKeys > 0 && st.embedKeys > 0)
    assert(st.deltaFraction > 0.0 && st.deltaFraction < 1.0)
    // the ledger records classification AND completion
    assert(ManifestStore.committed(spark, dirs.ledgerDir,
      Ingest.classifyBatch(0L)))
    assert(ManifestStore.committed(spark, dirs.ledgerDir,
      Ingest.doneBatch(0L)))
  }

  test("a replayed completed shard short-circuits on the ledger and mutates nothing") {
    val (dirs, _) = unbroken
    val before = stateOf(dirs)
    val st = Ingest.run(spark, dirs, baseDocs, shard, shardEmb, 0L)
    assert(st.replayed, "a done-sealed shard must be recognized")
    assert(stateOf(dirs) === before, "a replay must not change any artifact")
  }

  test("killed BETWEEN the two index appends, the re-run converges every artifact to the unbroken result") {
    val (_, want) = unbroken
    val wantState = stateOf(unbroken._1)
    val dirs = freshDirs()
    // the kill: postings append committed, ANN append never ran
    val e = intercept[IllegalStateException] {
      Ingest.run(spark, dirs, baseDocs, shard, shardEmb, 0L,
        crashAfter = Some("lex"))
    }
    assert(e.getMessage.contains("crash seam"))
    // the torn state is real: lex holds the shard delta, ann does not
    assert(GenDir.deltas(spark,
      GenDir.newest(spark, dirs.lexDir).get._2).nonEmpty)
    assert(GenDir.deltas(spark,
      GenDir.newest(spark, dirs.annDir).get._2).isEmpty)
    assert(!ManifestStore.committed(spark, dirs.ledgerDir,
      Ingest.doneBatch(0L)))
    // the re-run: lex append no-ops on its stamp, everything else runs
    val st = Ingest.run(spark, dirs, baseDocs, shard, shardEmb, 0L)
    assert(!st.replayed)
    assert(st.fates === want.fates,
      "the re-run must re-read the SEALED classification, not re-decide")
    assert(stateOf(dirs) === wantState,
      "every artifact must converge to the unbroken run's state")
  }

  test("killed at every other seam, the re-run converges identically (classify / ann / gates)") {
    val wantState = stateOf(unbroken._1)
    Seq("classify", "ann", "gates").foreach { seam =>
      val dirs = freshDirs()
      intercept[IllegalStateException] {
        Ingest.run(spark, dirs, baseDocs, shard, shardEmb, 0L,
          crashAfter = Some(seam))
      }
      val st = Ingest.run(spark, dirs, baseDocs, shard, shardEmb, 0L)
      assert(!st.replayed, s"seam $seam")
      assert(stateOf(dirs) === wantState,
        s"artifacts diverged after a crash at seam '$seam'")
    }
  }

  test("N appends past the segment budget auto-compact into one clean generation with pinned answers (r11 #8)") {
    val d = Files.createTempDirectory("graft-annindex-autocompact").toString
    AnnIndex.writeBase(spark, sf, d, col("vec_id") % 10 =!= 7)
    // 10 disjoint micro-shards of the held-out slice
    (0 until 10).foreach { i =>
      AnnIndex.append(spark, d,
        emb.filter(col("vec_id") % 100 === (10 * i + 7)),
        Some(s"shard-$i"))
    }
    assert(AnnIndex.shouldCompact(spark, d),
      "10 segments must trip the 8-segment budget")
    val before = AnnIndex.ivfPqTopK(spark, sf, d, 5, 10).collect().toSeq
    assert(AnnIndex.maybeCompact(spark, d), "the trigger must fire")
    val gen = AnnIndex.resolveGen(spark, d)
    assert(GenDir.deltas(spark, gen).isEmpty,
      "compaction must fold every segment")
    assert(AnnIndex.ivfPqTopK(spark, sf, d, 5, 10).collect().toSeq === before,
      "auto-compaction must not change any row")
    assert(!AnnIndex.shouldCompact(spark, d))
    // compaction folds segments, it does NOT re-train: the staleness
    // exposure must SURVIVE it (the `trained` meta field), so the
    // rebuild trigger can't be silenced by small-file hygiene
    val fracAfter = AnnIndex.deltaFraction(spark, d)
    assert(fracAfter > 0.0,
      s"drift accounting must survive compaction, got $fracAfter")
    // and a FULL rebuild (re-train) is what retires it
    AnnIndex.write(spark, sf, d)
    assert(AnnIndex.deltaFraction(spark, d) === 0.0)
  }

  test("registered entries: ingest fates roll up the ledger; stored-append BM25 ≡ the full-corpus scan bit-for-bit") {
    val fates = Ingest.ingestFates(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fates.getOrElse("kept", 0L) > 0 &&
      fates.getOrElse("url_dup", 0L) > 0, s"fates: $fates")
    val full = TextAnalysis.bm25TopK(spark, sf).collect().toSeq
    val composed = TextAnalysis.bm25TopKFromStore(spark,
      LexStore.appendLexFor(spark, sf)).collect().toSeq
    assert(composed === full,
      "base + appended shard must score bit-identically to a full build")
  }
}
