package graft.llmdata

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED ANN index — the on-disk twin of the session-memoized
  * IVF∘PQ artifacts ([[Similarity.ivfPqCodesFor]] et al.): a real
  * deployment builds its index ONCE as a batch job and ships the
  * artifact; queries then load the model sides (KB–MB scale) and scan
  * the stored codes table from disk, where the coarse CELL is the
  * parquet partition key — so a probe-bounded query physically reads
  * only `probes/cells` of the index files (partition pruning, the
  * on-disk version of "a probe touches probes/C of the corpus").
  *
  * Layout under `indexDir`:
  *  - `meta.json` — corpus count, cells, dims (the probe defaults are
  *    pure functions of these, so the query side never re-counts);
  *  - `centroids.parquet` — (cell, centroid): the coarse model,
  *    O(√N·d) floats;
  *  - `books.parquet` — (m, c, center): the residual codebooks in the
  *    OPQ-rotated basis;
  *  - `rotation.parquet` — (i, row): the orthonormal rotation;
  *  - `codes.parquet/cell=<c>/…` — (vec_id, code, norm) partitioned
  *    by coarse cell: the ~16×-compressed scan table.
  *
  * Every number round-trips EXACTLY (floats/doubles/bytes in parquet
  * are lossless), so the stored-index query path returns
  * ROW-FOR-ROW the memoized path's results (AnnIndexSpec pins it) —
  * persistence changes where the index lives, never the answer.
  *
  * Citation: the reference keeps no ANN surface (its engine is a POS
  * analytics stack); this family exists for the engine's LLM-data
  * charter. The build is a one-shot overwrite of an immutable
  * artifact directory — versioning/retention of SUCCESSIVE index
  * builds belongs to the manifest-store machinery
  * ([[graft.sync.ManifestStore]]) if an installation wants it;
  * a single artifact needs only atomic job-level overwrite.
  */
object AnnIndex {

  /** Index metadata — everything the query side needs without
    * touching the corpus: corpus count (probe defaults), cell count,
    * dims. */
  final case class Meta(n: Long, cells: Int, dims: Int)

  private def metaPath(indexDir: String) = s"$indexDir/meta.json"

  /** Build and persist the IVF∘PQ index for the corpus under
    * `corpusDir` into `indexDir` (overwrite). Reuses the memoized
    * trainers — the build IS the index-build work the memos hold, now
    * landed as an artifact. Returns the meta. */
  def write(spark: SparkSession, corpusDir: String,
            indexDir: String): Meta = {
    import spark.implicits._
    val cents = Similarity.ivfModelCellsFor(spark, corpusDir)
    val books = Similarity.ivfPqCodebooksFor(spark, corpusDir)
    val rot = Similarity.pqRotationFor(spark, corpusDir, Similarity.IvfPqM)
    val n = Similarity.corpusCount(spark, corpusDir)
    val dims = cents.head._2.length

    cents.toSeq.map { case (cid, c) => (cid, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/centroids.parquet")
    books.zipWithIndex.flatMap { case (bm, m) =>
      bm.zipWithIndex.map { case (cv, c) => (m, c, cv.toSeq) }
    }.toSeq.toDF("m", "c", "center")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/books.parquet")
    rot.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
      .toDF("i", "row")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$indexDir/rotation.parquet")
    // the scan table: coarse cell as the physical partition key — a
    // probed query prunes whole cell directories at planning time
    Similarity.ivfPqCodesFor(spark, corpusDir)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/codes.parquet")

    val meta = Meta(n, cents.length, dims)
    val (fs, p) = {
      val pp = new org.apache.hadoop.fs.Path(metaPath(indexDir))
      (pp.getFileSystem(spark.sparkContext.hadoopConfiguration), pp)
    }
    val os = fs.create(p, true)
    try os.write(
      s"""{"n":${meta.n},"cells":${meta.cells},"dims":${meta.dims}}"""
        .getBytes("UTF-8"))
    finally os.close()
    meta
  }

  private val storedMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]

  /** Session-memoized persisted index per corpus — lets the registry
    * carry a stored-path entry whose FIRST pass pays the real on-disk
    * build (visible in the per-pass bench times) and whose steady
    * state is the disk-scan query a deployment actually runs. */
  def storedIndexFor(spark: SparkSession, corpusDir: String): String =
    storedMemo.computeIfAbsent((spark, corpusDir), _ => {
      val d = java.nio.file.Files
        .createTempDirectory("graft-annindex").toString
      write(spark, corpusDir, d)
      d
    })

  /** Drop the memoized per-corpus index dirs (Bench/ScaleBench call
    * it after their sweeps; the temp artifacts die with the host). */
  def releaseCaches(): Unit = storedMemo.clear()

  /** Read the meta line (tiny, driver-side). */
  def readMeta(spark: SparkSession, indexDir: String): Meta = {
    val p = new org.apache.hadoop.fs.Path(metaPath(indexDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(k: String): String =
      text.split(s""""$k":""")(1).takeWhile(c => c.isDigit)
    Meta(field("n").toLong, field("cells").toInt, field("dims").toInt)
  }

  /** Load the model sides back into driver arrays — bit-exact
    * round-trip of what [[write]] persisted. */
  private def loadModel(spark: SparkSession, indexDir: String)
      : (Array[Array[Float]], Array[Array[Array[Double]]], Array[Array[Double]]) = {
    val cents = spark.read.parquet(s"$indexDir/centroids.parquet")
      .collect().map(r => (r.getAs[Int]("cell"),
        r.getSeq[Float](r.fieldIndex("centroid")).toArray))
      .sortBy(_._1).map(_._2)
    val bookRows = spark.read.parquet(s"$indexDir/books.parquet")
      .collect().map(r => ((r.getAs[Int]("m"), r.getAs[Int]("c")),
        r.getSeq[Double](r.fieldIndex("center")).toArray)).toMap
    val mMax = bookRows.keys.map(_._1).max + 1
    val cMax = bookRows.keys.map(_._2).max + 1
    val books = Array.tabulate(mMax, cMax)((m, c) => bookRows((m, c)))
    val rot = spark.read.parquet(s"$indexDir/rotation.parquet")
      .collect().map(r => (r.getAs[Int]("i"),
        r.getSeq[Double](r.fieldIndex("row")).toArray))
      .sortBy(_._1).map(_._2)
    (cents, books, rot)
  }

  /** IVF∘PQ top-k against the PERSISTED index: the
    * [[Similarity.ivfPqTopK]] query program with the model sides
    * loaded from `indexDir` and the candidate scan reading the
    * cell-partitioned codes table — the batch's probed-cell union
    * becomes a partition-pruning filter, so unprobed cells' files are
    * never opened (AnnIndexSpec asserts the pruned file set). Query
    * vectors and the exact rerank still read the corpus (the index
    * stores codes, not floats — exactly the deployment split).
    * Returns results row-for-row identical to the memoized path. */
  def ivfPqTopK(spark: SparkSession, corpusDir: String, indexDir: String,
                nQueries: Int, k: Int, probes: Int = 0,
                rerankPool: Int = 0): DataFrame = {
    import spark.implicits._
    val meta = readMeta(spark, indexDir)
    val (cents, books, rot) = loadModel(spark, indexDir)
    val e = Tables.embeddings(spark, corpusDir)
    val pr =
      if (probes > 0) probes
      else Similarity.ivfPqDefaultProbes(cents.length, meta.n)
    val sub = books(0)(0).length
    val qs = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val qInfos = qs.map { case (qid, qv) =>
      val ranked = cents.indices
        .map(c => (-Similarity.cosine6(qv, cents(c)), c)).sorted.take(pr).map(_._2)
      val qdotc = Array.fill(cents.length)(Double.NaN)
      ranked.foreach { c =>
        var d = 0.0; var j = 0
        while (j < qv.length) { d += qv(j).toDouble * cents(c)(j); j += 1 }
        qdotc(c) = d
      }
      val rq = Similarity.rotate(rot, qv)
      val lut = Array.tabulate(Similarity.IvfPqM, Similarity.IvfPqK) { (m, c) =>
        var d = 0.0; var j = 0
        while (j < sub) { d += rq(m * sub + j) * books(m)(c)(j); j += 1 }
        d
      }
      var nq = 0.0
      qv.foreach { x => nq += x.toDouble * x }
      (qid, qdotc, lut, math.sqrt(nq))
    }
    val bcQs = spark.sparkContext.broadcast(qInfos)
    val R = if (rerankPool > 0) rerankPool
      else math.max(16 * k, Similarity.IvfPqRerankPool)
    val probedCells = qInfos
      .flatMap(_._2.zipWithIndex.collect { case (d, c) if !d.isNaN => c })
      .distinct.sorted
    // the stored scan: cell is a PARTITION column, so this filter
    // prunes directories before any file is opened
    val cand = spark.read.parquet(s"$indexDir/codes.parquet")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("vec_id"), col("cell"), col("code"), col("norm"))
      .as[(Long, Int, Array[Byte], Double)]
      .mapPartitions { it =>
        val ls = bcQs.value
        val ord = Ordering.by[(Long, Double), (Double, Long)] { case (nid, a) => (-a, nid) }
        val heaps = ls.map(q => (q._1, new scala.collection.mutable.PriorityQueue[(Long, Double)]()(ord)))
        it.foreach { case (vid, cell, code, norm) =>
          var qi = 0
          while (qi < ls.length) {
            val (qid, qdotc, lut, qnorm) = ls(qi)
            if (qid != vid && !qdotc(cell).isNaN) {
              var adc = qdotc(cell); var m = 0
              while (m < Similarity.IvfPqM) { adc += lut(m)(code(m) & 0xFF); m += 1 }
              val approx = adc / (qnorm * norm)
              val h = heaps(qi)._2
              if (h.size < R) h.enqueue((vid, approx))
              else if (ord.lt((vid, approx), h.head)) { h.dequeue(); h.enqueue((vid, approx)) }
            }
            qi += 1
          }
        }
        heaps.iterator.flatMap { case (qid, h) => h.iterator.map { case (nid, a) => (qid, nid, a) } }
      }
      .toDF("query_id", "neighbor_id", "approx")
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    val topR = cand.withColumn("rr", row_number().over(wA))
      .filter(col("rr") <= R)
      .select(col("query_id"), col("neighbor_id"))
    val qFrame = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    topR
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
      .join(broadcast(qFrame), "query_id")
      .withColumn("sim", Similarity.cosineBest(spark, col("qe"), col("ne")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("sim"))
      .orderBy(col("query_id"), col("rnk"))
  }
}

/** `spark-submit`-able index-build job (the SyncMain/CurateMain/
  * SketchMain/StreamMain convention): build the persisted ANN index
  * for a corpus, print ONE JSON status line, exit non-zero when the
  * artifact would be empty. Scheduling stays out-of-engine by
  * design. */
object IndexMain {
  def run(spark: SparkSession, corpusDir: String,
          indexDir: String): AnnIndex.Meta =
    AnnIndex.write(spark, corpusDir, indexDir)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IndexMain <corpusDir> <indexDir>")
    val spark = SparkSession.builder()
      .appName("graft-ann-index-build")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val empty =
      try {
        val meta = run(spark, args(0), args(1))
        println(s"""{"job":"ann_index_build","n":${meta.n},""" +
          s""""cells":${meta.cells},"dims":${meta.dims}}""")
        meta.n == 0L
      } finally spark.stop()
    if (empty) sys.exit(2)
  }
}
