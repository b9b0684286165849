package graft.sync

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Snapshot folding (VERDICT r7 #1) must change METADATA COST only:
  * a store that folds every K commits and vacuums its history reads
  * byte-identically to one replaying every manifest since birth,
  * while parsing a BOUNDED number of ledger files; a kill between
  * snapshot write and rename is invisible; and a reader racing a
  * vacuum retries once onto the fresh composition instead of dying
  * on the deleted files. */
class ManifestStoreSpec extends SparkSpec {

  private def frame(rows: (String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("day", "v")
  }

  private def readSet(store: String): Set[(String, Int)] =
    ManifestStore.readStore(spark, store).map(
      _.collect().map(r =>
        (r.getAs[String]("day"), r.getAs[Int]("v"))).toSet)
      .getOrElse(Set.empty)

  private def ledgerFiles(store: String): Seq[String] = {
    val d = new java.io.File(s"$store/_manifest")
    if (!d.exists()) Seq.empty else d.listFiles().map(_.getName).toSeq
  }

  /** 20 commits over 3 rotating day partitions: each day's rows are
    * fully replaced by the latest commit touching it (the callers'
    * replace-by-partition contract). */
  private def drive(store: String, foldEvery: Option[Int]): Unit =
    (0 until 20).foreach { i =>
      ManifestStore.commit(
        frame((s"d${i % 3}", i), (s"d${i % 3}", 100 + i)),
        store, i.toLong, "day")
      foldEvery.foreach(k => ManifestStore.maybeSnapshot(spark, store, k))
    }

  test("snapshot store reads identically to full-replay store; ledger footprint and file count stay bounded; folded ids remain committed") {
    val root = Files.createTempDirectory("graft-ms").toString
    val (plain, folded) = (s"$root/plain", s"$root/folded")
    drive(plain, None)
    drive(folded, Some(4))
    val want = readSet(plain)
    assert(want === Set(("d0", 18), ("d0", 118), ("d1", 19), ("d1", 119),
      ("d2", 17), ("d2", 117)), "replace-by-partition fold sanity")
    assert(readSet(folded) === want, "snapshot fold changed the read")

    // bounded replay: ≤ K manifests parsed on top of the newest fold
    val (snapId, replayed) = ManifestStore.readFootprint(spark, folded)
    assert(snapId.nonEmpty, "20 commits at K=4 must have folded")
    assert(replayed < 4, s"replayed $replayed manifests, fold cadence is 4")
    // the plain store replays everything since birth — the cost the
    // snapshot removes
    assert(ManifestStore.readFootprint(spark, plain) === ((None, 20)))

    // vacuum drops folded manifests + superseded snapshots + orphan
    // data dirs; the read is untouched and the ledger file count is
    // bounded by the fold cadence
    val (files, dirs) = ManifestStore.vacuum(spark, folded)
    assert(files > 0 && dirs > 0, "superseded batches must be deleted")
    assert(readSet(folded) === want, "vacuum changed the store read")
    val left = ledgerFiles(folded)
    assert(left.size <= 5, s"ledger not bounded after vacuum: $left")
    assert(left.count(_.endsWith(".snap")) === 1, s"exactly one fold kept: $left")

    // folded ids stay committed (their manifest files are gone): a
    // replayed batch must still be a no-op, and — the documented
    // backfill interaction — any id at or below the fold reads as
    // committed, including the negative backfill convention
    (0L to snapId.get).foreach(id =>
      assert(ManifestStore.committed(spark, folded, id), s"id $id lost"))
    assert(ManifestStore.committed(spark, folded, -1L),
      "post-fold negative backfill ids must read committed (refusal, not silent drop)")
    assert(!ManifestStore.committed(spark, folded, 999L))
  }

  test("kill between snapshot write and rename: ledger untouched, next fold succeeds") {
    val root = Files.createTempDirectory("graft-ms-crash").toString
    val store = s"$root/store"
    (0 until 6).foreach(i =>
      ManifestStore.commit(frame((s"d${i % 2}", i)), store, i.toLong, "day"))
    val want = readSet(store)

    ManifestStore.snapshotCrashBeforeRename(spark, store)
    assert(ledgerFiles(store).exists(_.startsWith(".tmp-")),
      "the staged temp must exist for the simulation to mean anything")
    // the orphan is unparsed: no fold visible, read unchanged
    assert(ManifestStore.readFootprint(spark, store) === ((None, 6)))
    assert(readSet(store) === want)

    // the redone fold lands and reads identically
    assert(ManifestStore.snapshot(spark, store) === Some(5L))
    assert(ManifestStore.readFootprint(spark, store) === ((Some(5L), 0)))
    assert(readSet(store) === want)
    ManifestStore.vacuum(spark, store)
    assert(readSet(store) === want)
    // a fold with nothing new on top is a no-op
    assert(ManifestStore.snapshot(spark, store) === None)
  }

  test("append mode: batches hitting the same partition accumulate; snapshot+vacuum never reclaim data files") {
    val root = Files.createTempDirectory("graft-ms-append").toString
    val store = s"$root/store"
    // 6 commits, ALL touching partition d0 (plus a rotating sibling):
    // in replace mode only the last would survive; append keeps all
    (0 until 6).foreach(i =>
      ManifestStore.commit(frame(("d0", i), (s"d${1 + i % 2}", 100 + i)),
        store, i.toLong, "day", append = true))
    val want = (0 until 6).map(i => ("d0", i)).toSet ++
      (0 until 6).map(i => (s"d${1 + i % 2}", 100 + i)).toSet
    assert(readSet(store) === want, "append fold lost rows")

    // replayed id = no-op (the streaming bucket-store contract)
    assert(ManifestStore.committed(spark, store, 3L))

    // snapshot + vacuum: ledger folds, every DATA file survives
    // (nothing is ever superseded in append mode — only unreferenced
    // non-data files like the per-batch _SUCCESS markers may go)
    def parquetCount(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$store/data"))
    }
    val dataBefore = parquetCount()
    assert(ManifestStore.snapshot(spark, store) === Some(5L))
    val (_, dirs) = ManifestStore.vacuum(spark, store)
    assert(dirs === 0,
      s"append-mode vacuum must remove no batch dirs (removed $dirs)")
    assert(parquetCount() === dataBefore,
      "append-mode vacuum must reclaim no data files")
    assert(readSet(store) === want, "vacuum changed the append store read")
    assert(ledgerFiles(store).count(_.endsWith(".snap")) === 1)
    assert(ManifestStore.readFootprint(spark, store) === ((Some(5L), 0)))
  }

  test("reader racing a vacuum: stale composition dies, withStore retries once onto the fresh one") {
    val root = Files.createTempDirectory("graft-ms-race").toString
    val store = s"$root/store"
    ManifestStore.commit(frame(("d0", 1), ("d1", 2)), store, 0L, "day")

    // the race, deterministically: compose the read, then let the
    // writer supersede d0 and vacuum BEFORE the (lazy) scan runs
    var calls = 0
    val got = ManifestStore.withStore(spark, store) { odf =>
      calls += 1
      if (calls == 1) {
        ManifestStore.commit(frame(("d0", 7)), store, 1L, "day")
        val (deleted, _) = ManifestStore.vacuum(spark, store)
        assert(deleted > 0, "b0's superseded d0 file must be deleted mid-read")
      }
      odf.get.collect().map(r =>
        (r.getAs[String]("day"), r.getAs[Int]("v"))).toSet
    }
    assert(calls === 2, "first attempt must fail on the deleted file and retry")
    assert(got === Set(("d0", 7), ("d1", 2)),
      "the retry must read the post-vacuum composition")

    // …and the raw frame from before the vacuum does throw — the race
    // is real, not an artifact of the helper
    ManifestStore.commit(frame(("d1", 9)), store, 2L, "day")
    val stale = ManifestStore.readStore(spark, store).get
    ManifestStore.commit(frame(("d1", 11)), store, 3L, "day")
    ManifestStore.vacuum(spark, store)
    intercept[Exception] { stale.collect() }
    ()
  }

  test("dual writer: while one holds the lease, a second commit/fold/vacuum fails loudly; ledger uncorrupted (r8 #6)") {
    val store = s"${Files.createTempDirectory("graft-ms").toString}/leased"
    ManifestStore.commit(frame(("d0", 1)), store, 0L, "day")
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      ManifestStore.withLeaseForTest(spark, store) {
        entered.countDown()
        release.await()
      })
    holder.start()
    assert(entered.await(10, java.util.concurrent.TimeUnit.SECONDS))
    try {
      // writer B: every mutating entry point must refuse, loudly and
      // with an actionable message, while writer A holds the lease
      Seq[() => Any](
        () => ManifestStore.commit(frame(("d1", 2)), store, 1L, "day"),
        () => ManifestStore.snapshot(spark, store),
        () => ManifestStore.vacuum(spark, store)
      ).foreach { op =>
        val e = intercept[IllegalStateException] { op() }
        assert(e.getMessage.contains("single-writer contract"),
          s"unexpected message: ${e.getMessage}")
      }
    } finally {
      release.countDown()
      holder.join(10000)
    }
    // writer A released: the same mutations now succeed and the ledger
    // composed exactly the committed history (nothing half-applied)
    ManifestStore.commit(frame(("d1", 2)), store, 1L, "day")
    assert(readSet(store) === Set(("d0", 1), ("d1", 2)))
    assert(ManifestStore.committed(spark, store, 0L))
    assert(ManifestStore.committed(spark, store, 1L))

    // a corpse from a DEAD writer (stale mtime) is broken and the
    // claim retried - a crash must not wedge the store forever
    val lock = new java.io.File(s"$store/_manifest/.writer.lock")
    assert(lock.createNewFile())
    assert(lock.setLastModified(System.currentTimeMillis - 31L * 60 * 1000))
    ManifestStore.commit(frame(("d2", 3)), store, 2L, "day")
    assert(readSet(store) === Set(("d0", 1), ("d1", 2), ("d2", 3)))
    assert(!lock.exists(), "the successful writer must release the broken lease")

    // lease THEFT mid-commit (review r9): a data write outliving the
    // stale bound lets a breaker take the lease — the seal must then
    // refuse BEFORE touching the ledger, never interleave silently
    ManifestStore.withLeaseForTest(spark, store) {
      java.nio.file.Files.write(lock.toPath,
        "thief-nonce".getBytes("UTF-8"))
      val stolen = intercept[IllegalStateException] {
        ManifestStore.commit(frame(("d3", 4)), store, 3L, "day")
      }
      assert(stolen.getMessage.contains("lost mid-mutation"))
    }
    assert(!ManifestStore.committed(spark, store, 3L),
      "nothing may be sealed over a stolen lease")
    assert(readSet(store) === Set(("d0", 1), ("d1", 2), ("d2", 3)))
    // clean up the planted thief lock so later mutations proceed
    assert(lock.delete())
    ManifestStore.commit(frame(("d3", 4)), store, 3L, "day")
    assert(readSet(store) === Set(("d0", 1), ("d1", 2), ("d2", 3), ("d3", 4)))
  }

  test("time travel: as-of reads compose history exactly; fold floor refuses; vacuumed retention fails loudly") {
    val store = s"${Files.createTempDirectory("graft-ms").toString}/asof"
    // 6 replace-by-partition commits rotating over 3 days: day d_r as
    // of batch B holds the rows of the LAST batch <= B touching it
    (0 until 6).foreach(i => ManifestStore.commit(
      frame((s"d${i % 3}", i), (s"d${i % 3}", 100 + i)), store, i.toLong, "day"))
    def expected(asOf: Int): Set[(String, Int)] =
      (0 to asOf).groupBy(_ % 3).values.flatMap { is =>
        val i = is.max
        Seq((s"d${i % 3}", i), (s"d${i % 3}", 100 + i))
      }.toSet
    def asOf(b: Long): Set[(String, Int)] =
      ManifestStore.readStoreAsOf(spark, store, b).map(
        _.collect().map(r =>
          (r.getAs[String]("day"), r.getAs[Int]("v"))).toSet)
        .getOrElse(Set.empty)
    (0 until 6).foreach(i =>
      assert(asOf(i.toLong) === expected(i), s"as-of $i diverged"))
    assert(asOf(5L) === readSet(store), "as-of newest == current read")
    assert(ManifestStore.readStoreAsOf(spark, store, -1L).isEmpty,
      "nothing committed at or below the target -> None")

    // version diff: rows removed/added between two as-of reads —
    // batches 3 and 4 replaced d0 and d1 since batch 2, d2 untouched
    def diffSet(a: Long, b: Long): Set[(String, Int, String)] =
      ManifestStore.diffStore(spark, store, a, b).get.collect()
        .map(r => (r.getAs[String]("day"), r.getAs[Int]("v"),
          r.getAs[String]("change"))).toSet
    assert(diffSet(2L, 4L) === Set(
      ("d0", 0, "removed"), ("d0", 100, "removed"),
      ("d1", 1, "removed"), ("d1", 101, "removed"),
      ("d0", 3, "added"), ("d0", 103, "added"),
      ("d1", 4, "added"), ("d1", 104, "added")))
    assert(diffSet(4L, 4L) === Set.empty, "equal versions diff empty")
    assert(intercept[IllegalArgumentException] {
      ManifestStore.diffStore(spark, store, 4L, 2L)
    }.getMessage.contains("reversed"))

    // fold WITHOUT vacuum: the manifests still exist, so history below
    // the fold floor must still COMPOSE (review r9: the first cut
    // refused here even though nothing was reclaimed)
    ManifestStore.snapshot(spark, store) // folds ids 0..5 at snap 5
    ManifestStore.commit(frame(("d0", 6), ("d0", 106)), store, 6L, "day")
    assert(asOf(4L) === expected(4),
      "folded-but-not-vacuumed history must still compose")
    // vacuum: retention now bounds time travel
    ManifestStore.vacuum(spark, store)
    assert(asOf(6L) === readSet(store))
    // below the fold floor with the manifests reclaimed: refused
    val folded = intercept[IllegalArgumentException] {
      ManifestStore.readStoreAsOf(spark, store, 4L)
    }
    assert(folded.getMessage.contains("folded"))
    // at the fold floor the LEDGER composes, but batch 6 superseded
    // d0 and vacuum reclaimed its pre-6 files — the stale read must
    // fail LOUDLY on the missing file, never return silently-partial
    intercept[Exception] {
      ManifestStore.readStoreAsOf(spark, store, 5L).get.collect()
    }

    // diff across a SCHEMA-ADDING upgrade: later batches carry a new
    // column; both sides null-fill and order-normalize before the
    // positional compare (review r9)
    import spark.implicits._
    val widened = Seq(("d1", 7, 77)).toDF("day", "v", "w")
    ManifestStore.commit(widened, store, 7L, "day")
    val d = ManifestStore.diffStore(spark, store, 6L, 7L).get.collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Int]("v"),
        Option(r.get(r.fieldIndex("w"))), r.getAs[String]("change"))).toSet
    assert(d === Set(
      ("d1", 7, Some(77), "added"),
      ("d1", 4, None, "removed"), ("d1", 104, None, "removed")))
    ()
  }

  test("vacuum reaps stale staged .tmp- orphans, never fresh ones") {
    val store = s"${Files.createTempDirectory("graft-ms").toString}/tmpreap"
    ManifestStore.commit(frame(("d0", 1)), store, 0L, "day")
    val mdir = new java.io.File(s"$store/_manifest")
    val old = new java.io.File(mdir, ".tmp-9-deadbeef")
    val fresh = new java.io.File(mdir, ".tmp-9-cafebabe")
    assert(old.createNewFile() && fresh.createNewFile())
    assert(old.setLastModified(System.currentTimeMillis - 31L * 60 * 1000))
    ManifestStore.vacuum(spark, store)
    assert(!old.exists(), "a stale staged orphan must be reaped")
    assert(fresh.exists(), "an in-flight fresh stage must be left alone")
    assert(readSet(store) === Set(("d0", 1)))
  }

  test("retention-scheduled vacuum: the last R versions stay as-of readable, older ones fail loudly naming the floor (r9 next #3)") {
    val store = s"${Files.createTempDirectory("graft-ms").toString}/retain"
    // 8 replace-by-partition commits rotating over 2 days
    (0 until 8).foreach(i => ManifestStore.commit(
      frame((s"d${i % 2}", i)), store, i.toLong, "day"))
    def asOf(b: Long): Set[(String, Int)] =
      ManifestStore.readStoreAsOf(spark, store, b).map(
        _.collect().map(r =>
          (r.getAs[String]("day"), r.getAs[Int]("v"))).toSet)
        .getOrElse(Set.empty)
    val pre = (0 until 8).map(i => asOf(i.toLong))
    val (files, _) = ManifestStore.vacuum(spark, store, retainBatches = 3)
    assert(files > 0, "pre-floor superseded files must be reclaimed")
    // the retained window (versions 5, 6, 7) composes EXACTLY as it
    // did before the reclaim; the current read is untouched
    (5 until 8).foreach(i =>
      assert(asOf(i.toLong) === pre(i), s"retained as-of $i diverged"))
    assert(readSet(store) === pre(7), "vacuum changed the current read")
    // below the retention floor: loud refusal NAMING the floor
    val e = intercept[IllegalArgumentException] {
      ManifestStore.readStoreAsOf(spark, store, 4L)
    }
    assert(e.getMessage.contains("folded") && e.getMessage.contains("5"),
      s"refusal must name the retention floor: ${e.getMessage}")
    // a second retention vacuum over the same window is a stable no-op
    assert(ManifestStore.vacuum(spark, store, retainBatches = 3) === ((0, 0)))
    (5 until 8).foreach(i => assert(asOf(i.toLong) === pre(i)))
    // ...and the store keeps committing/reading normally on top
    ManifestStore.commit(frame(("d0", 8)), store, 8L, "day")
    assert(readSet(store) === Set(("d0", 8), ("d1", 7)))
    assert(asOf(6L) === pre(6), "older retained version must survive new commits")
  }

  test("sinceFold backstop: a counter gone stale-LOW across a JVM handoff still folds within the cadence (ADVICE r9)") {
    val store = s"${Files.createTempDirectory("graft-ms").toString}/backstop"
    ManifestStore.commit(frame(("d0", 0)), store, 0L, "day")
    // prime this JVM's counter (one sync read)
    assert(ManifestStore.maybeSnapshot(spark, store, 3).isEmpty)
    // a FOREIGN writer (another JVM) commits 4 more batches: simulate
    // by writing the manifest files directly, bypassing this JVM's
    // seal-maintained counter — the counter is now stale-LOW (1 vs 5)
    val mdir = new java.io.File(s"$store/_manifest")
    val m0 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(mdir, "0").toPath), "UTF-8")
    (1 to 4).foreach(i => java.nio.file.Files.write(
      new java.io.File(mdir, i.toString).toPath, m0.getBytes("UTF-8")))
    // without the backstop the fold would be deferred forever (the
    // counter alone never reaches the cadence); the probe bound forces
    // a re-sync within `every` probes and the due fold lands
    val folded = (1 to 3).flatMap(_ =>
      ManifestStore.maybeSnapshot(spark, store, 3))
    assert(folded === Seq(4L),
      s"stale-LOW counter must re-sync and fold within the cadence: $folded")
    assert(readSet(store) === Set(("d0", 0)))
  }

  test("maybeSnapshot between folds is O(1): zero ledger reads off the seal-maintained counter (r8 #8)") {
    val store = s"${Files.createTempDirectory("graft-ms").toString}/probe"
    ManifestStore.commit(frame(("d0", 0)), store, 0L, "day")
    // first probe on a fresh JVM view: pays ONE sync read, then primes
    assert(ManifestStore.maybeSnapshot(spark, store, 5).isEmpty)
    val before = ManifestStore.ledgerReads.get()
    (1 until 4).foreach { i =>
      ManifestStore.commit(frame((s"d$i", i)), store, i.toLong, "day")
      assert(ManifestStore.maybeSnapshot(spark, store, 5).isEmpty)
    }
    assert(ManifestStore.ledgerReads.get() === before,
      "below-cadence probes must not re-list or re-parse the ledger")
    // the 5th commit reaches the cadence: exactly one ledger read
    // (the fold's own) and the snapshot lands
    ManifestStore.commit(frame(("d4", 4)), store, 4L, "day")
    assert(ManifestStore.maybeSnapshot(spark, store, 5) === Some(4L))
    // post-fold probes are O(1) again off the zeroed counter
    val after = ManifestStore.ledgerReads.get()
    ManifestStore.commit(frame(("d5", 5)), store, 5L, "day")
    assert(ManifestStore.maybeSnapshot(spark, store, 5).isEmpty)
    assert(ManifestStore.ledgerReads.get() === after)
    // and the folded store still reads its full composition
    assert(readSet(store) ===
      (0 to 5).map(i => (s"d$i", i)).toSet)
  }

  test("a maintainer lease stolen mid-body aborts loudly at the next verify point (review r13)") {
    // the long-maintainer scenario: the body outlives the staleness
    // bound and a breaker claims the "corpse" of the LIVE holder —
    // the holder's next verifyMaintainerLease must throw, never let
    // it publish over the thief (Ingest.rebuild calls it before each
    // artifact publish because rebuild never re-touches the ledger)
    val dir = Files.createTempDirectory("graft-lease-verify").toString
    ManifestStore.withLeaseForTest(spark, dir) {
      // inside a healthy lease the verify is a clean no-op
      ManifestStore.verifyMaintainerLease(spark, dir)
      // simulate the theft: a breaker replaced the stamp with its own
      val lock = java.nio.file.Paths.get(s"$dir/_manifest/.writer.lock")
      java.nio.file.Files.writeString(lock, "thief-nonce")
      val e = intercept[IllegalStateException] {
        ManifestStore.verifyMaintainerLease(spark, dir)
      }
      assert(e.getMessage.contains("lost mid-mutation"), e.getMessage)
    } // release is conditional on still owning the nonce - no throw here
  }

}
