package graft.sync

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** GENERATION-DIRECTORY commit protocol for on-disk index artifacts
  * (VERDICT r10 #1): a builder stages the WHOLE artifact into a
  * `.tmp-<nonce>` directory under the artifact root, writes its commit
  * marker (a small validated JSON) LAST inside the staging dir, and
  * publishes with ONE atomic directory rename to `gen-<id>` — so a
  * reader can only ever compose files from a single complete
  * generation:
  *
  *  - a build killed at ANY point leaves either nothing visible or a
  *    `.tmp-*` corpse readers never look at — never mixed-generation
  *    files under a committed name;
  *  - two concurrent builders race the rename; exactly one wins the
  *    `gen-<id>` name and the loser FAILS LOUDLY (rename onto an
  *    existing directory returns false) instead of interleaving;
  *  - successive builds land as successive generations — readers
  *    resolve the NEWEST committed generation, so an in-flight
  *    rebuild never perturbs a running reader.
  *
  * This is the same rename-last discipline [[ManifestStore]]'s seal
  * protocol uses, specialized to whole-directory artifacts. Cleanup of
  * superseded generations and crash corpses is an explicit
  * [[vacuum]] — deliberately NOT part of a build (a build must never
  * delete what a concurrent reader may be composing; vacuum's contract
  * is "no reader older than the newest generation is live", the same
  * retention stance ManifestStore.vacuum documents). */
object GenDir {

  private val GenRe = "^gen-([0-9]+)$".r

  /** Listing telemetry: every [[generations]]/[[deltas]] directory
    * listing bumps this counter. On an object store each listing is a
    * billed round trip, so the serving paths' contract ("one listing
    * per opened handle, not per query") is ASSERTABLE — specs reset
    * the counter, run a query batch through a pinned handle, and
    * require zero new listings. An AtomicLong costs nothing on the
    * hot path (one uncontended increment per listing). */
  private[graft] val listingCount = new java.util.concurrent.atomic.AtomicLong

  private[graft] def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Create and return a fresh staging directory `root/.tmp-<nonce>`. */
  def stage(spark: SparkSession, root: String): String = {
    val (f, r) = fsOf(spark, root)
    val tmp = new Path(r, s".tmp-${java.util.UUID.randomUUID()}")
    f.mkdirs(tmp)
    tmp.toString
  }

  /** Committed generations under `root`, ascending by id. A directory
    * only becomes visible under a `gen-<id>` name via the atomic
    * commit rename, so presence IS the commit marker. */
  def generations(spark: SparkSession, root: String): Seq[(Long, String)] = {
    listingCount.incrementAndGet()
    val (f, r) = fsOf(spark, root)
    val entries =
      try f.listStatus(r)
      catch {
        case _: java.io.FileNotFoundException =>
          // the element type must be EXPLICIT: a bare Array.empty
          // infers Array[Nothing] backed by Object[], and the
          // checkcast to FileStatus[] on the merged branch dies at
          // runtime (it surfaced only under spark-submit — sbt runs
          // happened to never take this branch on a virgin root
          // because the suite bootstraps before its virgin cases)
          Array.empty[org.apache.hadoop.fs.FileStatus]
      }
    entries.toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case GenRe(id) => Some((id.toLong, st.getPath.toString))
        case _ => None
      })
      .sortBy(_._1)
  }

  /** The newest committed generation, or None for a virgin root. */
  def newest(spark: SparkSession, root: String): Option[(Long, String)] =
    generations(spark, root).lastOption

  private val DeltaRe = "^delta-([0-9]+)$".r

  /** Committed delta segments under a generation dir, ascending by
    * sequence — the intra-generation twin of [[generations]] (one
    * listing; callers share the result instead of re-listing). */
  def deltas(spark: SparkSession, gen: String): Seq[(Long, String)] = {
    listingCount.incrementAndGet()
    val (f, p) = fsOf(spark, gen)
    val entries =
      try f.listStatus(p)
      catch { case _: java.io.FileNotFoundException =>
        Array.empty[org.apache.hadoop.fs.FileStatus] } // typed: see generations
    entries.toSeq.filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case DeltaRe(id) => Some((id.toLong, st.getPath.toString))
        case _ => None
      })
      .sortBy(_._1)
  }

  /** The next free `delta-<seq>` name given an existing listing. */
  def nextDeltaName(existing: Seq[(Long, String)]): String =
    s"delta-${existing.map(_._1).reduceOption(_ max _).getOrElse(-1L) + 1L}"

  /** Atomically publish a fully-staged `tmpDir` as the next generation
    * (or as `name` when given — used for intra-generation deltas).
    * Returns the committed path. Throws loudly when the destination
    * already exists — the dual-builder contention case — naming both
    * directories; the staged work is left in place for inspection.
    *
    * TOCTOU closure: Hadoop's local rename moves the source INTO an
    * existing destination directory and reports success, so a
    * committer that loses the race between its exists-check and its
    * rename would otherwise "succeed" while its artifact sits nested
    * (and invisible) inside the winner's generation. After the
    * rename, the committer checks for its own UNIQUE staging name
    * under the destination — presence is race-free proof of nesting —
    * and fails loudly; [[vacuum]] reaps the nested corpse. (POSIX
    * rename would instead REPLACE an EMPTY existing destination, but
    * a committed artifact dir is never empty — the marker JSON is
    * always inside — so that branch cannot clobber a real
    * generation.) `raceSeam` (test-only) skips the exists pre-check
    * to make the lost-race interleave deterministic in specs. */
  def commit(spark: SparkSession, root: String, tmpDir: String,
             name: Option[String] = None,
             raceSeam: Boolean = false): String = {
    val (f, r) = fsOf(spark, root)
    val dest = new Path(r,
      name.getOrElse(s"gen-${newest(spark, root).map(_._1 + 1).getOrElse(0L)}"))
    val tmpName = new Path(tmpDir).getName
    var caught: Option[java.io.IOException] = None
    val ok =
      try (raceSeam || !f.exists(dest)) && f.rename(new Path(tmpDir), dest)
      catch { case e: java.io.IOException => caught = Some(e); false }
    if (!ok) {
      // diagnose before blaming a race (ADVICE r11): a rename can also
      // fail because the staging dir is missing, permissions deny it,
      // or the filesystem threw — in those cases the destination does
      // NOT exist and "re-run against the committed artifact" would
      // point the operator at an artifact that isn't there. Reserve
      // the race wording for the case it describes; an exists-probe
      // that itself fails reports the uncertainty rather than guess.
      val destExists =
        try Some(f.exists(dest))
        catch { case _: java.io.IOException => None }
      val cause = caught.map(e => s" (caught: ${e.getMessage})").getOrElse("")
      throw (destExists match {
        case Some(true) => new IllegalStateException(
          s"artifact commit lost the rename race: $dest already exists " +
            s"(a concurrent builder won the generation) - staged build " +
            s"left at $tmpDir; re-run against the committed artifact " +
            "or vacuum and rebuild")
        case Some(false) => new IllegalStateException(
          s"artifact commit FAILED to rename $tmpDir -> $dest and the " +
            s"destination does not exist$cause - this is NOT a lost " +
            "rename race: check that the staging directory still " +
            "exists and that the filesystem permits the rename, then " +
            "re-run the build")
        case None => new IllegalStateException(
          s"artifact commit FAILED to rename $tmpDir -> $dest and could " +
            s"not determine whether the destination exists$cause - " +
            "inspect the artifact root before re-running")
      })
    }
    val nested = new Path(dest, tmpName)
    // verification failure must fail TOWARD the loud path: mapping an
    // IOException to "not nested" would turn a lost race back into
    // the silent false success this check exists to close
    val wasNested =
      try f.exists(nested)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"artifact commit could not VERIFY its rename (checking " +
              s"$nested): ${e.getMessage} - treat this commit as " +
              "FAILED and re-run against the committed artifact", e)
      }
    if (wasNested)
      throw new IllegalStateException(
        s"artifact commit lost the rename race: a concurrent builder " +
          s"committed $dest between this committer's existence check " +
          s"and its rename, and the local-filesystem rename NESTED the " +
          s"staged build at $nested instead of failing - the committed " +
          "artifact is the winner's (unmixed); the nested corpse is " +
          "inert and reclaimed by vacuum")
    dest.toString
  }

  /** Write a small JSON marker file (driver-side, create-or-replace).
    * Inside a staging dir this is the LAST write of a build — the
    * within-dir witness that every artifact file landed before the
    * commit rename publishes the whole generation. */
  def writeJson(spark: SparkSession, path: String, text: String): Unit = {
    val (f, p) = fsOf(spark, path)
    val os = f.create(p, true)
    try os.write(text.getBytes("UTF-8")) finally os.close()
  }

  /** Read a marker file, failing loudly naming the artifact (never an
    * opaque IO trace for a damaged generation). */
  def readJson(spark: SparkSession, path: String, what: String): String = {
    val (f, p) = fsOf(spark, path)
    try {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    } catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"$what at $path is unreadable - the artifact is corrupt " +
            s"(commit is atomic, so this indicates external damage): " +
            e.getMessage)
    }
  }

  /** Strict integer field extraction from a marker — a missing field
    * (torn file) fails loudly naming the artifact and the field. */
  def jsonLong(text: String, key: String, path: String): Long = {
    val re = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*(-?[0-9]+)").r
    re.findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(
      throw new IllegalStateException(
        s"artifact marker $path is corrupt: required field " +
          s""""$key" missing from: $text"""))
  }

  /** Optional integer field from a marker — for fields added after an
    * artifact format's first release, where absence means "older
    * marker, use the documented default" rather than corruption. */
  def jsonLongOpt(text: String, key: String): Option[Long] = {
    val re = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*(-?[0-9]+)").r
    re.findFirstMatchIn(text).map(_.group(1).toLong)
  }

  /** Optional string field from a marker — the shard-key stamp the
    * idempotent append paths scan for (a replayed ingest of the same
    * shard must find its own prior delta and no-op instead of
    * double-appending). Absent field → None, never a throw: old
    * markers without the stamp are legitimate. */
  def jsonString(text: String, key: String): Option[String] = {
    val re = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*\"([^\"]*)\"").r
    re.findFirstMatchIn(text).map(_.group(1))
  }

  /** The delta-marker shard-stamp JSON fragment (`,"shard":"<key>"`,
    * or "" for an unstamped append) — the ONE place every artifact
    * family's append builds it, and the place the key is VALIDATED
    * (ADVICE r12): the stamp is interpolated into the marker JSON
    * unescaped, so a caller-supplied key containing a quote or
    * backslash would corrupt the marker and break every subsequent
    * [[readJson]]/[[findDeltaByKey]] on that delta. Shard keys are
    * engine-generated names, not free text — restricting them to a
    * safe character set fails the bad key loudly at write time
    * instead of poisoning the artifact. */
  def shardStamp(key: Option[String]): String = key match {
    case None => ""
    case Some(k) =>
      require(k.nonEmpty && k.length <= 128 &&
        k.forall(c => c.isLetterOrDigit || "._:/-".contains(c)),
        s"shard key '$k' is unsafe for the delta marker JSON " +
          "(allowed: 1-128 chars of letters, digits, . _ : / -)")
      s""","shard":"$k""""
  }

  /** MULTI-shard stamp for one BATCHED delta (r15 — the batched ingest
    * tail): a delta holding N shards' rows in one commit stamps ALL N
    * keys (`"shards":["a","b"]`) plus each key's own row count
    * (`"n:a":X`) so a later replay of any SINGLE shard — batch or
    * solo — finds its stamp, no-ops, and reports ITS count, never the
    * union's. Same key validation as [[shardStamp]]. */
  def shardsStamp(keys: Seq[String], perKeyN: Map[String, Long]): String = {
    require(keys.nonEmpty, "a multi-shard stamp needs at least one key")
    keys.foreach(k => shardStamp(Some(k))) // validate each
    val arr = keys.map(k => s""""$k"""").mkString("[", ",", "]")
    val ns = keys.flatMap(k => perKeyN.get(k).map(n => s""","n:$k":$n"""))
      .mkString
    s""","shards":$arr$ns"""
  }

  /** The `"shards":[...]` array of a multi-stamped marker — empty for
    * single-stamped / unstamped markers. */
  def jsonStringArray(text: String, key: String): Seq[String] = {
    val re = ("\"" + java.util.regex.Pattern.quote(key) +
      "\"\\s*:\\s*\\[([^\\]]*)\\]").r
    re.findFirstMatchIn(text).map(_.group(1)) match {
      case None => Seq.empty
      case Some(body) =>
        "\"([^\"]*)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
    }
  }

  /** Scan a generation's committed delta markers for one stamped with
    * shard key `key` — the idempotence probe every artifact family's
    * append runs before staging: present means THIS shard already
    * landed (a crash-replay or duplicate dispatch) and the append
    * must no-op with the prior marker's counts. One marker read per
    * existing delta against the SHARED listing the caller already
    * took. */
  def findDeltaByKey(spark: SparkSession, deltas: Seq[(Long, String)],
                     markerName: String, what: String,
                     key: String): Option[String] =
    deltas.collectFirst { case (_, d)
      if {
        val text = readJson(spark, s"$d/$markerName", what)
        // single stamp OR a batched delta's multi-stamp (r15): either
        // witnesses that THIS shard's rows landed in the commit
        jsonString(text, "shard").contains(key) ||
          jsonStringArray(text, "shards").contains(key)
      } => d }

  /** Delete superseded generations and `.tmp-*` crash corpses, keeping
    * the newest `retain` committed generations (≥ 1). Single-operator
    * contract: run only when no builder is mid-commit and no reader
    * holds a generation older than the retained window. */
  def vacuum(spark: SparkSession, root: String, retain: Int = 1): Unit = {
    require(retain >= 1, s"gendir vacuum must retain >= 1 generation, got $retain")
    val (f, r) = fsOf(spark, root)
    val gens = generations(spark, root)
    gens.dropRight(retain).foreach { case (_, p) =>
      f.delete(new Path(p), true)
    }
    // nested corpses too: a lost-race committer's staging dir can end
    // up INSIDE a retained generation OR inside one of its delta
    // segments (a lost delta-commit race nests at gen/delta-N/.tmp-*),
    // and delta stagings live under the generation dir by design —
    // under the vacuum contract (no live builder) all are corpses.
    // Depth 2 (root → gen → delta) covers every commit destination.
    def reapTmp(dir: Path, depth: Int): Unit = {
      val entries =
        try f.listStatus(dir)
        catch { case _: java.io.FileNotFoundException =>
        Array.empty[org.apache.hadoop.fs.FileStatus] } // typed: see generations
      entries.foreach { st =>
        if (st.isDirectory) {
          if (st.getPath.getName.startsWith(".tmp-"))
            f.delete(st.getPath, true)
          else if (depth > 0 && st.getPath.getName.startsWith("delta-"))
            reapTmp(st.getPath, depth - 1) // only commit destinations,
          // never parquet data dirs (listing every cell partition of
          // codes.parquet would be wasted IO)
        }
      }
    }
    reapTmp(r, 0)
    gens.takeRight(retain).foreach { case (_, p) =>
      reapTmp(new Path(p), 1)
    }
  }
}
