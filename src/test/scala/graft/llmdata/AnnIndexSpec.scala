package graft.llmdata

import graft.SparkSpec
import graft.sync.GenDir
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The persisted ANN index must change WHERE the index lives, never
  * the answer: stored-path results row-for-row equal the memoized
  * path's, the cell partition key physically prunes unprobed files,
  * builds commit atomically (a killed rebuild can never expose mixed
  * generations — VERDICT r10 #1), metas validate loudly, appends
  * compose exactly, and vacuum reclaims without touching the newest
  * generation. */
class AnnIndexSpec extends SparkSpec {

  private lazy val indexDir = {
    val d = Files.createTempDirectory("graft-annindex").toString
    AnnIndex.write(spark, sf, d)
    d
  }

  private def genDir = AnnIndex.resolveGen(spark, indexDir)

  test("meta round-trips, validates, and matches the corpus") {
    val meta = AnnIndex.readMeta(spark, indexDir)
    assert(meta.n === graft.Tables.embeddings(spark, sf).count())
    assert(meta.cells === Similarity.ivfModelCellsFor(spark, sf).length)
    assert(meta.dims === 64)
    assert(meta.m === Similarity.IvfPqM)
    assert(meta.k === Similarity.IvfPqK)
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
    val codes = s"$genDir/codes.parquet"
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

  test("stored-index frame-path query ≡ stored-index driver-path query row-for-row (r10 #2)") {
    val driver = AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10).collect().toSeq
    val frame = AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10,
      frameQueries = true).collect().toSeq
    assert(frame === driver,
      "the persisted path's frame mode must not change any row")
  }

  test("a rebuild killed before commit leaves the old generation intact and readers unaffected") {
    val before = AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10).collect().toSeq
    val genBefore = genDir
    // the kill: the ENTIRE build ran (all parquet + meta staged) but
    // the commit rename never happened
    val corpse = AnnIndex.writeCrashBeforeCommit(spark, sf, indexDir)
    assert(new java.io.File(corpse).getName.startsWith(".tmp-"),
      "a crashed build must only ever leave a .tmp-* staging dir")
    // the reader resolves exactly the old complete generation — never
    // a mix of old and new files
    assert(genDir === genBefore)
    val after = AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10).collect().toSeq
    assert(after === before, "a killed rebuild must not change any answer")
    // and a subsequent REAL rebuild commits the next generation
    val meta2 = IndexMain.run(spark, sf, indexDir)
    assert(genDir !== genBefore)
    assert(meta2 === AnnIndex.readMeta(spark, indexDir))
    val rebuilt = AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10).collect().toSeq
    assert(rebuilt === before)
  }

  test("dual-builder contention fails loudly instead of interleaving") {
    val d = Files.createTempDirectory("graft-annindex-race").toString
    // both builders staged against the same target generation name;
    // the faster one committed between the slower one's id computation
    // and its rename — the slower rename must fail loudly, never merge
    val tmpFast = GenDir.stage(spark, d)
    val tmpSlow = GenDir.stage(spark, d)
    GenDir.commit(spark, d, tmpFast, Some("gen-0"))
    val e = intercept[IllegalStateException] {
      GenDir.commit(spark, d, tmpSlow, Some("gen-0"))
    }
    assert(e.getMessage.contains("gen-0"))
    assert(e.getMessage.contains("rename race"))
    // the loser's staging dir survives for inspection
    assert(new java.io.File(tmpSlow).exists())
  }

  test("lost-race rename that NESTS into the winner's generation is detected, never a silent success") {
    // the TOCTOU the exists pre-check cannot close: Hadoop's local
    // rename moves the source INTO an existing destination and
    // reports success — the raceSeam makes the interleave
    // deterministic (loser's exists-check happened before the
    // winner's commit)
    val d = Files.createTempDirectory("graft-annindex-nest").toString
    val tmpWin = GenDir.stage(spark, d)
    val tmpLose = GenDir.stage(spark, d)
    GenDir.writeJson(spark, s"$tmpWin/meta.json", """{"w":1}""")
    GenDir.commit(spark, d, tmpWin, Some("gen-0"))
    val e = intercept[IllegalStateException] {
      GenDir.commit(spark, d, tmpLose, Some("gen-0"), raceSeam = true)
    }
    assert(e.getMessage.contains("NESTED"))
    // the winner's artifact is intact (unmixed) — its marker survives
    assert(GenDir.readJson(spark, s"$d/gen-0/meta.json", "meta")
      .contains("\"w\":1"))
    // a lost DELTA-commit race nests one level deeper
    // (gen-0/delta-0/.tmp-*) — same detection, same reclamation.
    // The winner's delta carries its marker (committed dirs are never
    // empty; an empty dir would be REPLACED by POSIX rename instead)
    val tmpDelta = GenDir.stage(spark, s"$d/gen-0")
    GenDir.writeJson(spark, s"$tmpDelta/delta.json", """{"n":1}""")
    GenDir.commit(spark, s"$d/gen-0", tmpDelta, Some("delta-0"))
    val tmpDeltaLose = GenDir.stage(spark, s"$d/gen-0")
    val e2 = intercept[IllegalStateException] {
      GenDir.commit(spark, s"$d/gen-0", tmpDeltaLose, Some("delta-0"),
        raceSeam = true)
    }
    assert(e2.getMessage.contains("NESTED"))
    // and vacuum reclaims the nested corpses at BOTH depths
    GenDir.vacuum(spark, d)
    val inside = new java.io.File(s"$d/gen-0").listFiles().map(_.getName)
    assert(!inside.exists(_.startsWith(".tmp-")),
      s"nested corpse must be reaped: ${inside.toSeq}")
    val insideDelta = new java.io.File(s"$d/gen-0/delta-0")
      .listFiles().map(_.getName)
    assert(!insideDelta.exists(_.startsWith(".tmp-")),
      s"delta-level nested corpse must be reaped: ${insideDelta.toSeq}")
  }

  test("a torn or mismatched meta fails loudly naming the artifact, never mis-decodes") {
    val d = Files.createTempDirectory("graft-annindex-meta").toString
    def plant(metaJson: String): Unit = {
      val g = new java.io.File(s"$d/gen-0")
      g.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$d/gen-0/meta.json"),
        metaJson.getBytes("UTF-8"))
    }
    plant("""{"format":2,"n":100""") // torn mid-write
    val torn = intercept[IllegalStateException] {
      AnnIndex.readMeta(spark, d)
    }
    assert(torn.getMessage.contains("meta.json") ||
      torn.getMessage.contains("gen-0"))
    assert(torn.getMessage.contains("missing"))
    plant("""{"format":2,"n":100,"cells":10,"dims":64,"m":8,"k":256}""")
    val geom = intercept[IllegalStateException] {
      AnnIndex.readMeta(spark, d)
    }
    assert(geom.getMessage.contains("m=8"))
    plant("""{"format":1,"n":100,"cells":10,"dims":64,"m":16,"k":256}""")
    val fmt = intercept[IllegalStateException] {
      AnnIndex.readMeta(spark, d)
    }
    assert(fmt.getMessage.contains("format 1"))
  }

  test("an unbuilt index dir fails loudly, never reads empty") {
    val d = Files.createTempDirectory("graft-annindex-virgin").toString
    val e = intercept[IllegalStateException] {
      AnnIndex.ivfPqTopK(spark, sf, d, 5, 10)
    }
    assert(e.getMessage.contains("no committed ANN index generation"))
  }

  test("append(shard) onto base(corpus \\ shard) ≡ the full build at the query level, row-for-row") {
    val composed = AnnIndex.appendIndexFor(spark, sf)
    val stored = AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10).collect().toSeq
    val appended = AnnIndex.ivfPqTopK(spark, sf, composed, 5, 10).collect().toSeq
    assert(appended === stored,
      "base + delta must compose the exact code set a full build writes")
    // the delta segment really exists and carries the shard
    val gen = AnnIndex.resolveGen(spark, composed)
    val deltaCodes = spark.read.parquet(s"$gen/delta-0/codes.parquet")
    assert(deltaCodes.count() ===
      graft.Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 10 === 7).count())
    // and the composed index counts base + delta
    val meta = AnnIndex.readMeta(spark, composed)
    assert(meta.n ===
      graft.Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 10 =!= 7).count())
  }

  test("compaction folds deltas into clean cell partitions without changing any answer") {
    val composed = AnnIndex.appendIndexFor(spark, sf)
    val before = AnnIndex.ivfPqTopK(spark, sf, composed, 5, 10).collect().toSeq
    val genBefore = AnnIndex.resolveGen(spark, composed)
    val nBefore = AnnIndex.readMeta(spark, composed).n +
      spark.read.parquet(s"$genBefore/delta-0/codes.parquet").count()
    val meta = AnnIndex.compact(spark, composed)
    val genAfter = AnnIndex.resolveGen(spark, composed)
    assert(genAfter !== genBefore, "compaction commits a NEW generation")
    // the compacted generation carries no delta dirs and counts the union
    assert(meta.n === nBefore)
    assert(!new java.io.File(s"$genAfter/delta-0".stripPrefix("file:")).exists())
    // the old generation (deltas included) survives for live readers
    assert(new java.io.File(s"$genBefore/delta-0".stripPrefix("file:")).exists())
    val after = AnnIndex.ivfPqTopK(spark, sf, composed, 5, 10).collect().toSeq
    assert(after === before, "compaction must not change any row")
  }

  test("vacuum reclaims superseded generations and crash corpses, never the newest") {
    val d = Files.createTempDirectory("graft-annindex-vac").toString
    AnnIndex.write(spark, sf, d)
    val q0 = AnnIndex.ivfPqTopK(spark, sf, d, 5, 10).collect().toSeq
    AnnIndex.writeCrashBeforeCommit(spark, sf, d) // corpse
    AnnIndex.write(spark, sf, d) // gen-1 supersedes gen-0
    AnnIndex.vacuum(spark, d)
    val left = new java.io.File(d).listFiles().map(_.getName).toSet
    assert(left === Set("gen-1"),
      s"vacuum must leave exactly the newest generation, got $left")
    assert(AnnIndex.ivfPqTopK(spark, sf, d, 5, 10).collect().toSeq === q0)
  }

  test("GenDir vacuum refuses retain < 1") {
    val d = Files.createTempDirectory("graft-gendir").toString
    intercept[IllegalArgumentException] { GenDir.vacuum(spark, d, 0) }
  }

  test("a pinned handle serves a whole query batch with ZERO further listings (r11 #4)") {
    val base = AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10).collect().toSeq
    val h = AnnIndex.open(spark, indexDir)
    val before = GenDir.listingCount.get()
    val r1 = AnnIndex.topKAt(spark, h, sf, 5, 10).collect().toSeq
    val r2 = AnnIndex.topKAt(spark, h, sf, 3, 10).collect().toSeq
    val r3 = AnnIndex.topKAt(spark, h, sf, 5, 10, frameQueries = true)
      .collect().toSeq
    assert(GenDir.listingCount.get() === before,
      "a pinned handle must never re-list directories per query")
    assert(r1 === base, "the pinned path must not change any row")
    assert(r3 === base)
    assert(r2.nonEmpty)
    // the per-call path pays listings per call — the handle's savings
    // are real, not an artifact of the counter never moving
    AnnIndex.ivfPqTopK(spark, sf, indexDir, 5, 10).collect()
    assert(GenDir.listingCount.get() > before)
  }

  test("servingTopK survives a vacuum reclaiming its pinned generation between resolve and scan (r11 #4)") {
    val d = Files.createTempDirectory("graft-annindex-serve").toString
    AnnIndex.write(spark, sf, d) // gen-0
    val expected = AnnIndex.ivfPqTopK(spark, sf, d, 5, 10).collect().toSeq
    // a result materialized BEFORE any vacuum stays consumable after
    // one (the serving read is eager — never a lazy frame over files
    // that can vanish)
    val early = AnnIndex.servingTopK(spark, sf, d, 5, 10)
    // the race: this reader resolves gen-0, then a rebuild + vacuum
    // reclaim gen-0's files before its scan runs
    val served = AnnIndex.servingTopKWithSeam(spark, sf, d, 5, 10, 0, 0,
      frameQueries = false, afterOpen = () => {
        AnnIndex.write(spark, sf, d) // gen-1 supersedes
        AnnIndex.vacuum(spark, d)    // gen-0's files are gone
      }).collect().toSeq
    assert(served === expected,
      "the one-shot retry must land on the newest committed generation")
    assert(early.collect().toSeq === expected,
      "a materialized serving result must survive later vacuums")
    // the UNWRAPPED pinned read does die on the same race — the retry
    // in servingTopK is load-bearing, not decorative
    val h0 = {
      AnnIndex.write(spark, sf, d) // fresh rebuild to pin
      val h = AnnIndex.open(spark, d)
      AnnIndex.write(spark, sf, d)
      AnnIndex.vacuum(spark, d)
      h
    }
    val e = intercept[Throwable] {
      AnnIndex.topKAt(spark, h0, sf, 5, 10).collect()
    }
    assert(graft.sync.ManifestStore.isFileNotFound(e),
      s"expected a vanished-file failure, got: $e")
  }

  test("a rename failure with no committed destination is diagnosed as NOT a race (ADVICE r11)") {
    val d = Files.createTempDirectory("graft-gendir-norace").toString
    // the staging dir never existed — the rename fails, and the old
    // message would have told the operator to 're-run against the
    // committed artifact' that does not exist
    val e = intercept[IllegalStateException] {
      GenDir.commit(spark, d, s"$d/.tmp-never-staged")
    }
    assert(e.getMessage.contains("NOT a lost"),
      s"non-race failure must not be blamed on a race: ${e.getMessage}")
    assert(e.getMessage.contains("destination does not exist"))
    // the race wording is reserved for the case it describes
    assert(!e.getMessage.contains("already exists"))
  }

  test("compaction racing a concurrent append fails loudly naming the missing segment (ADVICE r11)") {
    val d = Files.createTempDirectory("graft-annindex-raced").toString
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    AnnIndex.writeBase(spark, sf, d, col("vec_id") % 10 =!= 7)
    AnnIndex.append(spark, d, emb.filter(col("vec_id") % 20 === 7))
    // the append lands AFTER compact's entry listing — the folded
    // generation is missing it, and the post-commit re-list must say so
    val e = intercept[IllegalStateException] {
      AnnIndex.compactWithSeam(spark, d, () => {
        AnnIndex.append(spark, d, emb.filter(col("vec_id") % 20 === 17))
        ()
      })
    }
    assert(e.getMessage.contains("MISSING"))
    assert(e.getMessage.contains("delta"), e.getMessage)
    // the committed-but-unfolded segment id is named for the operator
    assert(e.getMessage.contains("1"),
      s"the missing segment's id must be named: ${e.getMessage}")
  }
}
