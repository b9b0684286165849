package graft.llmdata

import graft.{SparkSpec, Tables}
import graft.sync.ManifestStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The BATCHED multi-shard ingest's contract (r15, VERDICT r14 #1):
  * [[Ingest.runBatch]] must produce fates BIT-EQUAL to N sequential
  * [[Ingest.run]]s — including the cross-shard url/exact/near arms a
  * sequentially extended keeper/gate would decide — while holding the
  * maintainer lease only for the tail, batching every store's commits
  * and every index artifact's deltas. Every crash seam converges on
  * re-run (batch or shard-by-shard solo — the multi-stamped deltas'
  * per-shard no-op), and the planted cross-shard duplicates keep each
  * arm non-vacuous. */
class IngestBatchSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)
  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))
  private def baseDocs = docs.filter(col("doc_id") % 10 =!= 7)

  /** Unique-per-doc url EXCEPT the planted collision pair: organic and
    * planted ids stay below 1e6 apart, so `doc_id % 1e6` is injective
    * over everything but the (900017, 1900017) url-dup plant. */
  private val specUrl =
    concat(lit("https://bx.example/"),
      pmod(col("doc_id"), lit(1000000L)).cast("string"))

  /** 25 distinct tokens — passes MinTokens/MinTypeTokenRatio, shares
    * no vocabulary with the synthetic corpus (the near arm's match is
    * then provably the planted pair, never an organic collision). */
  private def freshText(tag: String): String =
    (1 to 25).map(i => s"$tag$i").mkString(" ")

  private val textA = freshText("qa")
  private val textX = freshText("qx")

  /** The three planted sub-shards (plus the organic %40 slices):
    *  - shard 0 carries A-kept (id 900017): unique text + url → KEPT;
    *  - shard 1 carries B-urlDup (1900017, same url as A different
    *    text), B-exactDup (910017, text ≡ A), and the intra pair
    *    (930017 keeper / 940017 near);
    *  - shard 2 carries C-nearDup (920027, text ≈ A): only the GATE
    *    extended with shard 0's kept keys can catch it.
    * All cross-shard fates therefore depend on earlier shards' KEPT
    * docs — exactly the sequential semantics under test. */
  private def planted(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("source", lit("plant"))
  }

  private lazy val subShards: Seq[DataFrame] = {
    val organic = (0 until 3).map(j =>
      docs.filter(col("doc_id") % 40 === (10L * j + 7L))
        .select(col("doc_id"), col("text"), col("source")))
    Seq(
      organic(0).unionByName(planted(Seq(900017L -> textA))),
      organic(1).unionByName(planted(Seq(
        1900017L -> freshText("qb"), // url_dup of A (same url, new text)
        910017L -> textA,            // exact_dup of A (same text)
        930017L -> textX,            // intra keeper
        940017L -> (textX + " qzx1 qzx2")))), // intra near_dup of 930017
      organic(2).unionByName(planted(Seq(
        920027L -> (textA + " qzy1 qzy2")))) // cross-shard near_dup of A
    ).map(_.localCheckpoint())
  }

  private def embFor(sub: DataFrame): DataFrame =
    emb.join(sub.select(col("doc_id").as("vec_id")), "vec_id")

  private def freshDirs(): Ingest.Dirs =
    Ingest.dirsUnder(PristineDeployment.fresh("ingest-batch") { work =>
      Ingest.bootstrap(spark, sf, Ingest.dirsUnder(work), 10, 7,
        rawUrl = specUrl)
    })

  private def batchOf(dirs: Ingest.Dirs,
                      crashAfter: Option[String] = None)
      : Seq[Ingest.Status] =
    Ingest.runBatch(spark, dirs, baseDocs,
      subShards.zipWithIndex.map { case (sub, j) =>
        Ingest.BatchShard(j.toLong, sub, embFor(sub)) },
      crashAfter = crashAfter, rawUrl = specUrl)

  private def fatesSet(dirs: Ingest.Dirs): Set[(Long, Long, String, Long)] =
    ManifestStore.readStore(spark, dirs.ledgerDir).get
      .filter(col("fate") =!= Ingest.DoneFate)
      .collect().map(r => (r.getAs[Long]("shard_id"),
        r.getAs[Long]("doc_id"), r.getAs[String]("fate"),
        Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong)
          .getOrElse(-1L))).toSet

  /** Everything observable about the artifacts EXCEPT per-artifact
    * delta counts (a batch lands one multi-stamped delta where the
    * sequential composition lands N — deliberately). */
  private def stateLoose(dirs: Ingest.Dirs): (Set[String], (Long, Long),
      Seq[String], Set[String], Set[String], Set[(Long, Long, String, Long)],
      (Set[Long], Set[Long]), (Set[String], Set[String])) = {
    val h = LexStore.open(spark, dirs.lexDir)
    val post = LexStore.loadAt(spark, h,
      Seq("vector", "window", "merge", "spark"))
    val postRows = post.post.collect().map(_.toString).toSet
    val ann = AnnIndex.ivfPqTopK(spark, sf, dirs.annDir, 5, 10)
      .collect().map(_.toString).toSeq
    val shingle = Dedup.loadBandIndex(spark, dirs.shingleGateDir)
      .collect().map(_.toString).toSet
    val embKeys = Dedup.loadEmbedBandIndex(spark, dirs.embedGateDir)
      .keys.collect().map(_.toString).toSet
    def idsOf(dir: String, idCol: String): Set[Long] =
      ManifestStore.readStore(spark, dir)
        .map(_.select(col(idCol)).collect().map(_.getLong(0)).toSet)
        .getOrElse(Set.empty[Long])
    def keeperRows(dir: String): Set[String] =
      ManifestStore.readStore(spark, dir)
        .map(_.drop("kpart").collect().map(_.toString).toSet)
        .getOrElse(Set.empty[String])
    (postRows, (h.n, h.sumDl), ann, shingle, embKeys, fatesSet(dirs),
      (idsOf(dirs.corpusDocsDir, "doc_id"), idsOf(dirs.corpusEmbDir, "vec_id")),
      (keeperRows(dirs.urlKeeperDir), keeperRows(dirs.hashKeeperDir)))
  }

  /** Sequential reference: the SAME three shards through three
    * [[Ingest.run]]s on a fresh deployment. */
  private lazy val sequential: (Ingest.Dirs, Seq[Ingest.Status]) = {
    val dirs = freshDirs()
    val sts = subShards.zipWithIndex.map { case (sub, j) =>
      Ingest.run(spark, dirs, baseDocs, sub, embFor(sub), j.toLong,
        rawUrl = specUrl)
    }
    (dirs, sts)
  }

  private lazy val batched: (Ingest.Dirs, Seq[Ingest.Status]) = {
    val dirs = freshDirs()
    val sts = batchOf(dirs)
    (dirs, sts)
  }

  test("batched fates ≡ sequential fates BIT-EQUAL, cross-shard url/exact/near arms all non-vacuous") {
    val (seqDirs, seqSts) = sequential
    val (batDirs, batSts) = batched
    val want = fatesSet(seqDirs)
    val got = fatesSet(batDirs)
    // the planted cross-shard arms actually fired in the REFERENCE —
    // without this the equivalence would be vacuous where it matters
    assert(want.contains((1L, 1900017L, "url_dup", 900017L)),
      s"cross-shard url_dup plant missing: ${want.filter(_._2 > 899999L)}")
    assert(want.contains((1L, 910017L, "exact_dup", 900017L)))
    assert(want.contains((2L, 920027L, "near_dup", 900017L)))
    assert(want.contains((0L, 900017L, "kept", -1L)))
    assert(want.contains((1L, 940017L, "near_dup", 930017L)),
      "intra-shard near plant missing")
    assert(got === want, "batched fates diverged from sequential")
    // per-shard status numbers line up too (append counts are the
    // multi-stamped deltas' per-shard counts)
    seqSts.zip(batSts).foreach { case (a, b) =>
      assert(a.shardId === b.shardId)
      assert(a.fates === b.fates, s"shard ${a.shardId}")
      assert(a.lexDocs === b.lexDocs, s"shard ${a.shardId} lexDocs")
      assert(a.annRows === b.annRows, s"shard ${a.shardId} annRows")
      assert(a.shingleKeys === b.shingleKeys, s"shard ${a.shardId} shingle")
      assert(a.embedKeys === b.embedKeys, s"shard ${a.shardId} embed")
      assert(b.gateCandPerDoc.isDefined, s"shard ${b.shardId} gate load")
    }
    // every artifact's CONTENT equal (delta counts differ by design)
    assert(stateLoose(batDirs) === stateLoose(seqDirs),
      "batched artifacts diverged from the sequential composition")
  }

  test("a completed batch replays as a pure short-circuit") {
    val (dirs, _) = batched
    val before = stateLoose(dirs)
    val sts = batchOf(dirs)
    assert(sts.forall(_.replayed), sts.map(_.replayed).toString)
    assert(stateLoose(dirs) === before)
  }

  test("killed at EVERY batch seam, the re-run converges every artifact to the unbroken state") {
    val want = stateLoose(batched._1)
    Seq("classify", "keepers", "corpus", "lex", "ann", "gates", "done")
      .foreach { seam =>
        val dirs = freshDirs()
        val e = intercept[IllegalStateException] {
          batchOf(dirs, crashAfter = Some(seam))
        }
        assert(e.getMessage.contains("crash seam"), seam)
        val sts = batchOf(dirs)
        assert(stateLoose(dirs) === want,
          s"artifacts diverged after a crash at batch seam '$seam'")
        assert(sts.map(_.fates).toSet ===
          batched._2.map(_.fates).toSet, seam)
      }
  }

  test("a crashed batch replays SHARD-BY-SHARD via run(): multi-stamped deltas no-op per shard, no double append") {
    val want = stateLoose(batched._1)
    val wantSts = batched._2
    val dirs = freshDirs()
    intercept[IllegalStateException] {
      batchOf(dirs, crashAfter = Some("gates"))
    }
    // solo replays in shard order — each must find the batch's
    // multi-stamped deltas and no-op with ITS per-shard counts
    val sts = subShards.zipWithIndex.map { case (sub, j) =>
      Ingest.run(spark, dirs, baseDocs, sub, embFor(sub), j.toLong,
        rawUrl = specUrl)
    }
    sts.zip(wantSts).foreach { case (got, want0) =>
      assert(!got.replayed, s"shard ${got.shardId}")
      assert(got.fates === want0.fates, s"shard ${got.shardId}")
      assert(got.lexDocs === want0.lexDocs, s"shard ${got.shardId} lex")
      assert(got.annRows === want0.annRows, s"shard ${got.shardId} ann")
      assert(got.shingleKeys === want0.shingleKeys,
        s"shard ${got.shardId} shingle")
      assert(got.embedKeys === want0.embedKeys,
        s"shard ${got.shardId} embed")
    }
    assert(stateLoose(dirs) === want,
      "solo replays after a batch crash diverged (double append?)")
  }

  test("empty and all-duplicate shards ride a batch cleanly") {
    val dirs = freshDirs()
    val emptyShard = docs.filter(lit(false))
      .select(col("doc_id"), col("text"), col("source"))
    val dupShard = baseDocs.limit(30)
      .withColumn("doc_id", col("doc_id") + 5000000L)
      .select(col("doc_id"), col("text"), col("source"))
      .localCheckpoint()
    val noEmb = emb.filter(lit(false))
    val sts = Ingest.runBatch(spark, dirs, baseDocs, Seq(
      Ingest.BatchShard(3L, emptyShard, noEmb),
      Ingest.BatchShard(4L, dupShard, noEmb),
      Ingest.BatchShard(5L, subShards(0), embFor(subShards(0)))),
      rawUrl = specUrl)
    assert(sts(0).nRaw === 0L && sts(0).fates.isEmpty)
    assert(!ManifestStore.committed(spark, dirs.ledgerDir,
      Ingest.classifyBatch(3L)), "an empty shard must leave no trace")
    assert(sts(1).nRaw === 30L)
    assert(sts(1).fates.getOrElse("kept", 0L) === 0L,
      s"all-dup shard fates: ${sts(1).fates}")
    assert(sts(1).lexDocs === 0L && sts(1).annRows === 0L)
    assert(sts(2).fates.getOrElse("kept", 0L) > 0L)
    // artifacts stay loadable and the dup shard appended nothing
    val reload = Dedup.loadBandIndex(spark, dirs.shingleGateDir).count()
    assert(reload > 0L)
    // a replay of the completed batch short-circuits the non-empty
    // shards and re-no-ops the empty one
    val sts2 = Ingest.runBatch(spark, dirs, baseDocs, Seq(
      Ingest.BatchShard(3L, emptyShard, noEmb),
      Ingest.BatchShard(4L, dupShard, noEmb),
      Ingest.BatchShard(5L, subShards(0), embFor(subShards(0)))),
      rawUrl = specUrl)
    assert(!sts2(0).replayed && sts2(1).replayed && sts2(2).replayed)
  }
}
