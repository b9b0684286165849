package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The persisted BM25 postings index must change WHERE the lexical
  * arm lives, never a single fused score: stored hybrid ≡ memoized
  * hybrid bit-for-bit, the term-bucket partition key physically
  * prunes unrelated vocabulary, and the artifact validates loudly
  * (the [[AnnIndexSpec]] durability discipline — the commit protocol
  * itself is GenDir's, already kill/contention-tested there). */
class LexStoreSpec extends SparkSpec {

  private lazy val lexDir = {
    val d = Files.createTempDirectory("graft-lexspec").toString
    LexStore.write(spark, sf, d)
    d
  }

  test("stored-postings hybrid ≡ memoized hybrid row-for-row (r10 #6)") {
    val memo = Similarity.hybridRrfTopK(spark, sf, 5, 10).collect().toSeq
    val stored = Similarity.hybridRrfStoredTopK(spark, sf, 5, 10).collect().toSeq
    assert(stored === memo,
      "persisting the postings must not change any fused row")
  }

  test("stored postings carry exactly the memoized index's rows and scalars") {
    val gen = LexStore.resolveGen(spark, lexDir)
    val idx = Similarity.lexIndexFor(spark, sf)
    val stored = spark.read.parquet(s"$gen/postings.parquet")
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    assert(stored.count() === idx.post.count())
    assert(stored.exceptAll(idx.post).count() === 0)
    // scalars reload exactly through the integer round-trip
    val loaded = LexStore.load(spark, lexDir, Seq("anything"))
    assert(loaded.n === idx.n)
    assert(loaded.avgdl === idx.avgdl)
  }

  test("query-term bucket filter prunes postings partitions on disk") {
    val gen = LexStore.resolveGen(spark, lexDir)
    val post = s"$gen/postings.parquet"
    val someTerms = spark.read.parquet(post)
      .select(col("term")).distinct().limit(3)
      .collect().map(_.getString(0)).toSeq
    val buckets = someTerms.map { t =>
      spark.range(1).select(
        LexStore.bucketOf(lit(t)).as("b")).head.getInt(0)
    }.distinct
    val files = spark.read.parquet(post)
      .filter(col("bucket").isin(buckets: _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(buckets.exists(b => f.contains(s"bucket=$b/")),
        s"file outside the probed term buckets was read: $f")
    }
    val allFiles = spark.read.parquet(post)
      .select(input_file_name().as("f")).distinct().count()
    assert(allFiles > files.length.toLong,
      "pruning must leave most buckets unread")
  }

  test("append(shard) onto base(corpus \\ shard) ≡ the full build — postings AND scalars exact (drift-free)") {
    // BM25's corpus stats are additive, so unlike the ANN delta path
    // there is NO frozen-model drift: base + delta must be exactly
    // the full rebuild's index
    val d = Files.createTempDirectory("graft-lexappend").toString
    val isShard = col("doc_id") % 10 === 7
    LexStore.writeBase(spark, sf, d, !isShard)
    LexStore.append(spark, d,
      graft.Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).filter(isShard))
    val full = Similarity.lexIndexFor(spark, sf)
    // load with ALL terms so the bucket filter keeps everything
    val allTerms = spark.read.parquet(
      s"${LexStore.resolveGen(spark, lexDir)}/postings.parquet")
      .select(col("term")).distinct().collect().map(_.getString(0)).toSeq
    val composed = LexStore.load(spark, d, allTerms)
    assert(composed.n === full.n)
    assert(composed.avgdl === full.avgdl)
    assert(composed.post.count() === full.post.count())
    assert(composed.post.exceptAll(full.post).count() === 0)
    // and the delta segment really exists
    val gen = LexStore.resolveGen(spark, d)
    assert(new java.io.File(s"$gen/delta-0".stripPrefix("file:")).exists())
  }

  test("compaction folds the delta segments into one clean generation, bit-identical to the full rebuild (r12)") {
    val d = Files.createTempDirectory("graft-lexcompact").toString
    val isShard = col("doc_id") % 10 === 7
    LexStore.writeBase(spark, sf, d, !isShard)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).filter(isShard)
    // three disjoint micro-segments partitioning the held-out shard
    (0 until 3).foreach { i =>
      LexStore.append(spark, d,
        docs.filter(col("doc_id") % 30 === (10 * i + 7)), Some(s"s$i"))
    }
    val genBefore = LexStore.resolveGen(spark, d)
    assert(graft.sync.GenDir.deltas(spark, genBefore).length === 3)
    val (n, sumDl) = LexStore.compact(spark, d)
    val gen = LexStore.resolveGen(spark, d)
    assert(gen !== genBefore, "compaction must commit a NEW generation")
    assert(graft.sync.GenDir.deltas(spark, gen).isEmpty,
      "compaction must fold every segment")
    // the folded artifact is bit-for-bit the full rebuild's index:
    // rows AND scalars (BM25 stats are exactly additive)
    val full = Similarity.lexIndexFor(spark, sf)
    val allTerms = full.post.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    val folded = LexStore.load(spark, d, allTerms)
    assert(folded.n === full.n)
    assert(folded.avgdl === full.avgdl)
    assert(n.toDouble === full.n)
    assert(sumDl.toDouble / n === full.avgdl)
    assert(folded.post.count() === full.post.count())
    assert(folded.post.exceptAll(full.post).count() === 0)
    assert(!LexStore.shouldCompact(spark, d))
  }

  test("a segment appended inside compaction's listing window fails loudly, never silently dropped (r12)") {
    val d = Files.createTempDirectory("graft-lexcompact-race").toString
    val isShard = col("doc_id") % 10 === 7
    LexStore.writeBase(spark, sf, d, !isShard)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).filter(isShard)
    LexStore.append(spark, d,
      docs.filter(col("doc_id") % 30 === 7), Some("s0"))
    val e = intercept[IllegalStateException] {
      LexStore.compactWithSeam(spark, d, () =>
        // the racing append lands AFTER the compactor's entry listing
        { LexStore.append(spark, d,
            docs.filter(col("doc_id") % 30 === 17), Some("racer")); () })
    }
    assert(e.getMessage.contains("MISSING"),
      s"the race must surface as a loud missing-segment error: $e")
  }

  test("fully-persisted serving stack (stored ANN + stored BM25) ≡ the memoized hybrid row-for-row") {
    val memo = Similarity.hybridRrfIvfPqTopK(spark, sf, 5, 10).collect().toSeq
    val stack = Similarity.hybridRrfStoredStackTopK(spark, sf, 5, 10)
      .collect().toSeq
    assert(stack === memo,
      "a restarted server loading both artifacts must serve identical results")
  }

  test("virgin or torn artifacts fail loudly naming the artifact") {
    val d = Files.createTempDirectory("graft-lexspec-virgin").toString
    val virgin = intercept[IllegalStateException] {
      LexStore.load(spark, d, Seq("x"))
    }
    assert(virgin.getMessage.contains("no committed BM25 postings"))
    new java.io.File(s"$d/gen-0").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/gen-0/stats.json"),
      """{"format":2,"n_docs":5""".getBytes("UTF-8"))
    val torn = intercept[IllegalStateException] {
      LexStore.load(spark, d, Seq("x"))
    }
    assert(torn.getMessage.contains("missing"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/gen-0/stats.json"),
      """{"format":1,"n_docs":5,"sum_dl":10}""".getBytes("UTF-8"))
    val fmt = intercept[IllegalStateException] {
      LexStore.load(spark, d, Seq("x"))
    }
    assert(fmt.getMessage.contains("format 1"))
  }

  test("a pinned postings handle serves query loads with ZERO further listings (r11 #4)") {
    val lexDir = LexStore.storedLexFor(spark, sf)
    val terms = LexStore.queryTermsOf(spark, sf, 3)
    val viaLoad = LexStore.load(spark, lexDir, terms)
    val h = LexStore.open(spark, lexDir)
    val before = graft.sync.GenDir.listingCount.get()
    val viaHandle = LexStore.loadAt(spark, h, terms)
    val again = LexStore.loadAt(spark, h, terms.take(5))
    assert(graft.sync.GenDir.listingCount.get() === before,
      "a pinned handle must never re-list directories per load")
    assert(viaHandle.n === viaLoad.n)
    assert(viaHandle.avgdl === viaLoad.avgdl)
    assert(viaHandle.post.collect().toSet === viaLoad.post.collect().toSet)
    assert(again.n === viaLoad.n)
  }

  test("an empty artifact is refused at build AND at load, never NaN scores (ADVICE r11)") {
    // the builder refuses to create the hazard: a keep filter that
    // drops every document must fail BEFORE any staging or commit
    val d = java.nio.file.Files
      .createTempDirectory("graft-lexstore-empty").toString
    val build = intercept[IllegalStateException] {
      LexStore.writeBase(spark, sf, d, org.apache.spark.sql.functions.lit(false))
    }
    assert(build.getMessage.contains("EMPTY"))
    assert(new java.io.File(d).listFiles() == null ||
      !new java.io.File(d).listFiles().exists(_.getName.startsWith("gen-")),
      "a refused empty build must not commit a generation")
    // and a zero-doc artifact that exists anyway (external damage)
    // fails loudly at load instead of NaN-ing every BM25 score
    new java.io.File(s"$d/gen-0").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/gen-0/stats.json"),
      """{"format":2,"n_docs":0,"sum_dl":0}""".getBytes("UTF-8"))
    val load = intercept[IllegalStateException] {
      LexStore.load(spark, d, Seq("x"))
    }
    assert(load.getMessage.contains("ZERO documents"))
    assert(load.getMessage.contains("NaN"))
  }
}
