package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MANIFEST-COMMIT mechanics for partitioned stores maintained by
  * replace-by-partition merges — the shared scaffold behind
  * [[graft.streaming.SketchView]] (day-keyed sketch partials) and
  * [[graft.streaming.MaterializedView]] (bucket-keyed absolute
  * totals), kept in ONE place like [[PartitionedStore]] so a fix
  * lands everywhere at once.
  *
  * Why not dynamic partition overwrite: its commit protocol deletes a
  * partition directory and renames the replacement in — a crash
  * between the two loses the partition's previous files. For a store
  * of absolute per-key rows that is DATA LOSS (a lost key re-appears
  * only if it changes again, possibly never), not merely staleness.
  * The manifest protocol removes every shared-path delete/rename from
  * the commit:
  *
  *  - each commit writes its full replacement rows for the partitions
  *    it touched under its OWN immutable directory
  *    `data/b<batchId>/<col>=<value>/…`;
  *  - the commit point is ONE file, `_manifest/<batchId>`, staged and
  *    atomically renamed in LAST, listing `partition-dir <TAB>
  *    relative-file` for every file that now constitutes each touched
  *    partition;
  *  - readers ([[readStore]]) trust ONLY manifest-listed files: per
  *    partition, the listing in the highest-numbered manifest that
  *    mentions it wins. A crash anywhere before the rename leaves
  *    orphans no reader sees; the replayed batch recomputes from the
  *    manifest-visible (= exact pre-crash) state and overwrites its
  *    own directory.
  *
  * Single writer per store assumed (the callers' contract); manifest
  * precedence is numeric batch order, so backfill ids must respect
  * the stream's ordering. Manifest history grows one small file per
  * batch — folding it needs a quiesced-writer snapshot (see
  * [[graft.streaming.SketchView]]'s scaladoc for the full operational
  * note). */
object ManifestStore {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** `batchId` is committed iff its manifest exists. */
  def committed(spark: SparkSession, storeDir: String, batchId: Long): Boolean =
    PartitionedStore.exists(spark, s"$storeDir/_manifest/$batchId")

  /** All committed manifests, ascending by batch id:
    * (batchId, partition-dir-name → relative files). Non-numeric
    * names (leaked rename temps) are ignored. */
  private def manifests(spark: SparkSession,
                        storeDir: String): Seq[(Long, Map[String, Seq[String]])] = {
    val (f, dir) = fs(spark, s"$storeDir/_manifest")
    if (!f.exists(dir)) return Seq.empty
    val ids = f.listStatus(dir).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .sorted
    ids.map { id =>
      val in = f.open(new org.apache.hadoop.fs.Path(s"$storeDir/_manifest/$id"))
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val partFiles = text.linesIterator.filter(_.nonEmpty).toSeq
        .map { line =>
          val Array(part, rel) = line.split("\t", 2)
          part -> rel
        }
        .groupBy(_._1).map { case (p, fs0) => p -> fs0.map(_._2) }
      (id, partFiles)
    }
  }

  /** partition-dir-name → (owning batchId, absolute file paths) after
    * replaying every manifest in order — the CURRENT composition. */
  private def currentFiles(spark: SparkSession,
                           storeDir: String): Map[String, (Long, Seq[String])] =
    manifests(spark, storeDir).foldLeft(Map.empty[String, (Long, Seq[String])]) {
      case (acc, (id, partFiles)) =>
        acc ++ partFiles.map { case (p, rels) =>
          p -> ((id, rels.map(r => s"$storeDir/$r")))
        }
    }

  /** The store as of the last committed manifest — the only
    * sanctioned read path. None when nothing has committed. Files are
    * grouped per owning batch directory and read with that directory
    * as `basePath`, so the `<col>=<value>` partition column survives
    * into the frame. */
  def readStore(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val byBatch = currentFiles(spark, storeDir).toSeq
      .flatMap { case (_, (id, files)) => files.map(fp => (id, fp)) }
      .groupBy(_._1)
    byBatch.toSeq.sortBy(_._1).map { case (id, files) =>
      spark.read
        .option("basePath", s"$storeDir/data/b$id")
        .parquet(files.map(_._2): _*)
    }
      // allowMissingColumns: batch dirs written before a schema change
      // null-fill the new columns — the store stays readable across an
      // upgrade (degraded until backfilled, never wedged), matching the
      // callers' merge-side evolution contract
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
  }

  /** The data-write half of a commit: `merged`'s rows land under this
    * batch's own directory, partitioned by `partitionCol`; overwrite
    * clears any orphans a crashed attempt of the same batch left. NO
    * lineage severing is needed here — unlike dynamic partition
    * overwrite, a manifest commit never writes into a directory that
    * could feed `merged`'s plan (its inputs are OTHER batches'
    * immutable dirs; a crashed attempt's orphans under THIS dir are
    * manifest-invisible and thus never inputs either). NOT a commit
    * until [[seal]] lands the manifest. */
  def writeBatchData(merged: DataFrame, storeDir: String, batchId: Long,
                     partitionCol: String): Unit = {
    val spark = merged.sparkSession
    merged.write.mode("overwrite").partitionBy(partitionCol)
      .parquet(s"$storeDir/data/b$batchId")
    spark.catalog.refreshByPath(storeDir)
  }

  /** The commit point: list the batch directory's partition files and
    * atomically rename the manifest in. */
  def seal(spark: SparkSession, storeDir: String, batchId: Long): Unit = {
    val (f, dd) = fs(spark, s"$storeDir/data/b$batchId")
    val lines = f.listStatus(dd).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .flatMap { partDir =>
        f.listStatus(partDir.getPath).toSeq
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(st =>
            s"${partDir.getPath.getName}\tdata/b$batchId/${partDir.getPath.getName}/${st.getPath.getName}")
      }
    sealLines(spark, storeDir, batchId, lines)
  }

  /** Commit an empty batch: an empty manifest records the id in the
    * ledger so its replay stays a no-op. */
  def sealEmpty(spark: SparkSession, storeDir: String, batchId: Long): Unit =
    sealLines(spark, storeDir, batchId, Seq.empty)

  /** Full commit = data + manifest. */
  def commit(merged: DataFrame, storeDir: String, batchId: Long,
             partitionCol: String): Unit = {
    writeBatchData(merged, storeDir, batchId, partitionCol)
    seal(merged.sparkSession, storeDir, batchId)
  }

  private def sealLines(spark: SparkSession, storeDir: String,
                        batchId: Long, lines: Seq[String]): Unit = {
    val (f, _) = fs(spark, storeDir)
    val dir = new org.apache.hadoop.fs.Path(s"$storeDir/_manifest")
    f.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$storeDir/_manifest/.tmp-$batchId-${java.util.UUID.randomUUID()}")
    val os = f.create(tmp, false)
    try os.write(lines.mkString("\n").getBytes("UTF-8")) finally os.close()
    val target = new org.apache.hadoop.fs.Path(s"$storeDir/_manifest/$batchId")
    val renamed =
      try f.rename(tmp, target)
      catch { case e: java.io.IOException =>
        throw new IllegalStateException(
          s"manifest rename $tmp -> $target failed", e) }
    if (!renamed)
      throw new IllegalStateException(
        s"manifest rename $tmp -> $target returned false " +
          "(concurrent writer on the same batchId?)")
  }

  /** Delete data files no current manifest references. Safety rules:
    * batch ids above the highest committed manifest are skipped (an
    * in-flight replay owns them — run from the writer between batches
    * or quiesced); only files absent from the current composition are
    * deleted, so the store read is untouched; manifests are never
    * deleted. Returns (files deleted, batch dirs removed). */
  def vacuum(spark: SparkSession, storeDir: String): (Int, Int) = {
    val (f, dataRoot) = fs(spark, s"$storeDir/data")
    if (!f.exists(dataRoot)) return (0, 0)
    val maxCommitted = manifests(spark, storeDir).lastOption.map(_._1).getOrElse(-1L)
    val referenced: Set[String] =
      currentFiles(spark, storeDir).values
        .flatMap(_._2).map(_.stripPrefix(s"$storeDir/")).toSet
    var files = 0; var dirs = 0
    f.listStatus(dataRoot).filter(_.isDirectory).foreach { bdir =>
      scala.util.Try(bdir.getPath.getName.stripPrefix("b").toLong).toOption
        .filter(_ <= maxCommitted).foreach { bid =>
          var keptAny = false
          f.listStatus(bdir.getPath).foreach { entry =>
            val children =
              if (entry.isDirectory) f.listStatus(entry.getPath).toSeq
              else Seq(entry)
            var keptHere = false
            children.foreach { st =>
              val rel =
                if (entry.isDirectory)
                  s"data/b$bid/${entry.getPath.getName}/${st.getPath.getName}"
                else s"data/b$bid/${st.getPath.getName}"
              if (referenced(rel)) { keptHere = true; keptAny = true }
              else if (st.isFile) { f.delete(st.getPath, false); files += 1 }
            }
            if (entry.isDirectory && !keptHere) { f.delete(entry.getPath, true); () }
          }
          if (!keptAny) { f.delete(bdir.getPath, true); dirs += 1 }
        }
    }
    spark.catalog.refreshByPath(storeDir)
    (files, dirs)
  }
}
