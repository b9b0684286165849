package graft.tx

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The materialized 21-column layout must be indistinguishable from the
  * pure derive path — the write→read round trip (including the
  * Year/Month/Day partition encoding and the null-partition rows for
  * invalid dates) may not change a single value. */
class ProcessedStoreSpec extends SparkSpec {

  // Processed_Timestamp is wall-clock at materialization time; every
  // other column must round-trip exactly.
  private val cols = Enrichment.outputColumns.filterNot(_ == "Processed_Timestamp")

  test("materialized table equals the derive path row-for-row (20 stable columns)") {
    val derived = TxQueries.processed(spark, sf).select(cols.map(col): _*)
    val stored = TxQueries.processedTable(spark, sf).select(cols.map(col): _*)
    assert(stored.count() === derived.count())
    assert(stored.exceptAll(derived).count() === 0)
    assert(derived.exceptAll(stored).count() === 0)
  }

  test("re-derived validity flag and date agree with the enrichment's own") {
    val derived = TxQueries.processed(spark, sf)
    val stored = TxQueries.processedTable(spark, sf)
    assert(stored.filter(!col("is_valid_date")).count() ===
      derived.filter(!col("is_valid_date")).count())
    // date precision: the store's reconstructed transaction_date is the
    // calendar date of the derive path's timestamp, for every valid row
    val a = derived.filter(col("is_valid_date"))
      .groupBy(to_date(col("transaction_date")).as("d")).count()
    val b = stored.filter(col("is_valid_date"))
      .groupBy(to_date(col("transaction_date")).as("d")).count()
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("memoization returns the same materialized path within a session") {
    val p1 = TxQueries.processedTable(spark, sf).inputFiles.toSet
    val p2 = TxQueries.processedTable(spark, sf).inputFiles.toSet
    assert(p1 === p2 && p1.nonEmpty)
  }

  private def localFs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("swap takes and releases the advisory lock; staged content lands at out") {
    val root = java.nio.file.Files.createTempDirectory("graft-lock").toString
    val (staged, out) = (s"$root/staged", s"$root/out")
    spark.range(3).write.parquet(staged)
    ProcessedStore.swapInto(localFs, staged, out)
    assert(spark.read.parquet(out).count() === 3)
    assert(!new java.io.File(s"$out.lock").exists(), "lock must be released")
    assert(!new java.io.File(staged).exists(), "staged dir must be renamed away")
  }

  test("a stale lock (crashed writer) is broken and the swap proceeds") {
    val root = java.nio.file.Files.createTempDirectory("graft-lock").toString
    val (staged, out) = (s"$root/staged", s"$root/out")
    spark.range(4).write.parquet(staged)
    val fs = localFs
    val lock = new org.apache.hadoop.fs.Path(s"$out.lock")
    fs.createNewFile(lock)
    // age the corpse beyond the stale threshold
    fs.setTimes(lock, System.currentTimeMillis - 60L * 60 * 1000, -1)
    ProcessedStore.swapInto(fs, staged, out)
    assert(spark.read.parquet(out).count() === 4)
    assert(!new java.io.File(s"$out.lock").exists())
  }

  test("a fresh held lock blocks the swap until the wait deadline, then fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-lock").toString
    val (staged, out) = (s"$root/staged", s"$root/out")
    spark.range(2).write.parquet(staged)
    val fs = localFs
    fs.createNewFile(new org.apache.hadoop.fs.Path(s"$out.lock"))
    val prop = "graft.processed.lockWaitMs"
    val prev = sys.props.get(prop)
    sys.props(prop) = "600"
    try {
      val e = intercept[IllegalStateException] {
        ProcessedStore.swapInto(fs, staged, out)
      }
      assert(e.getMessage.contains("lock"))
      assert(!new java.io.File(out).exists(), "blocked swap must not touch out")
    } finally prev match {
      case Some(v) => sys.props(prop) = v
      case None => sys.props -= prop; ()
    }
  }

  test("two stale-breakers racing the same corpse: exactly one holds the lock at a time") {
    // VERDICT r6 #8: under the old protocol two waiters could both
    // delete the same corpse and both claim in turn, each believing it
    // held the lock. The claim is now the per-filesystem ATOMIC
    // create-if-absent (O_EXCL File.createNewFile locally — Hadoop's
    // local createNewFile is an exists-then-create TOCTOU this very
    // test caught; the namenode CREATE rpc on HDFS), the post-claim
    // nonce re-read rejects a claim that raced a breaker's delete, and
    // breaks re-stat the corpse immediately before deleting — so the
    // critical sections may interleave in any order but never overlap.
    val root = java.nio.file.Files.createTempDirectory("graft-lock").toString
    val out = s"$root/out"
    val fs = localFs
    val lock = new org.apache.hadoop.fs.Path(s"$out.lock")
    fs.mkdirs(lock.getParent)
    fs.createNewFile(lock)
    // age the corpse beyond the stale threshold for BOTH breakers
    fs.setTimes(lock, System.currentTimeMillis - 60L * 60 * 1000, -1)
    val inSection = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val entered = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        try ProcessedStore.withSwapLock(fs, out) {
          entered.incrementAndGet()
          val now = inSection.incrementAndGet()
          maxSeen.updateAndGet(m => math.max(m, now))
          Thread.sleep(250) // widen any would-be overlap window
          inSection.decrementAndGet(); ()
        } catch { case t: Throwable => errs.add(t); () }
      })
    }
    // generous join bound: suites run in parallel and a loaded host
    // can starve the 200 ms claim-retry loop well past 30 s (observed
    // flake r9); the assertions below, not this bound, are the gate
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"breaker failed: ${errs.peek()}")
    assert(entered.get() === 2, "both breakers must eventually acquire")
    assert(maxSeen.get() === 1,
      "critical sections overlapped: two breakers held the lock at once")
    assert(!new java.io.File(s"$out.lock").exists(), "lock must be released")
  }
}
