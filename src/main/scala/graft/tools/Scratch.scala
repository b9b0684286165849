package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 optimization scratch profiler — NOT part of any driver
  * contract; a disposable harness for isolating where a bench entry's
  * seconds go (guide §1: measure first). Run with
  * `sbt "runMain graft.tools.Scratch <mode>"`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up scheduler + codegen
    spark.range(1000000).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()

    def timed(label: String)(body: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      body
      println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
    }
    def drive(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    args.headOption.getOrElse("langid") match {
      case "langid" =>
        // memoized training out of band (same as bench pass 1)
        val lDir = graft.llmdata.LangIdStore.trainedFor(spark, sfDir)
        timed("langid predict (pass1)") {
          drive(graft.llmdata.LangIdStore.langIdTrained(spark, sfDir))
        }
        timed("langid predict (pass2)") {
          drive(graft.llmdata.LangIdStore.langIdTrained(spark, sfDir))
        }
        // stage breakdown
        val docs = graft.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        timed("docs scan only") { drive(docs) }
        val tris = docs.filter(length(col("text")) >= 3)
          .select(col("doc_id"), explode(expr(
            "regexp_extract_all(text, '(?s)(?=(...))', 1)")).as("tri"))
        timed("trigram explode (regex)") { drive(tris) }
        val withB = tris.select(col("doc_id"),
          substring(md5(col("tri").cast("binary")), 1, 3).as("qb"))
        timed("explode + md5 bucket") { drive(withB) }
        val gen = graft.sync.GenDir.newest(spark, lDir).get._2
        val w = spark.read.parquet(s"$gen/weights.parquet")
        val langs = spark.read.parquet(s"$gen/langs.parquet")
        val matched = withB.join(broadcast(w), Seq("qb"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("w_micro")).as("w_sum"),
            count(lit(1)).as("c_seen"))
        timed("+ bcast weights join + agg") { drive(matched) }
        val joined = withB.join(broadcast(w), Seq("qb"))
        timed("explode+md5+join (no agg)") { drive(joined) }
      case "tri" =>
        val docs = graft.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        // split behavior probe
        spark.sql("SELECT split('abc', ''), size(split('abc', ''))").show(false)
        val old = docs.filter(length(col("text")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
            .as("tri"))
        val viaSplit = docs.filter(length(col("text")) >= 3)
          .withColumn("cs", split(col("text"), ""))
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, length(text) - 3), i -> concat(cs[i], cs[i+1], cs[i+2]))"))
            .as("tri"))
          .drop("cs")
        val viaRegex = docs.filter(length(col("text")) >= 3)
          .select(col("doc_id"), explode(expr(
            "regexp_extract_all(text, '(?s)(?=(...))', 1)")).as("tri"))
        timed("old quadratic explode") { drive(old) }
        timed("split-based explode") { drive(viaSplit) }
        timed("regex-based explode") { drive(viaRegex) }
        // equivalence: counts and full multiset hash
        def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
          val r = df.agg(count(lit(1)), expr("sum(pmod(xxhash64(doc_id, tri, 42), 1000000007))")).head
          (r.getLong(0), r.getLong(1))
        }
        val so = sig(old); val ss = sig(viaSplit); val sr = sig(viaRegex)
        println(s"[scratch] old=$so split=$ss regex=$sr  identical_split=${so == ss} identical_regex=${so == sr}")
      case "plan" =>
        // dump .explain("formatted") for the named queries to files:
        // Scratch plan <outDir> <query> [<query> ...]
        val outDir = args(1)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        args.drop(2).foreach { q =>
          val df = graft.SparkEntry.queries(q)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$q.txt"),
            plan.getBytes("UTF-8"))
          println(s"[scratch] wrote $outDir/$q.txt")
        }
      case "time" =>
        // time named queries min-of-2 (same drive as Bench):
        // Scratch time <query> [<query> ...]
        args.drop(1).foreach { q =>
          def one(): Double = {
            val t0 = System.nanoTime()
            val df = graft.SparkEntry.queries(q)(spark, sfDir)
            df.queryExecution.toRdd.foreach(_ => ())
            (System.nanoTime() - t0) / 1e9
          }
          val a = one(); val b = one()
          println(f"[scratch] $q%-35s min=${math.min(a, b)}%7.3f  passes=[$a%.3f, $b%.3f]")
        }
      case "stack" =>
        import graft.llmdata.{AnnIndex, LexStore, Similarity}
        // warm the memoized artifact builds out of band (bench pass-1 cost)
        val annDir = AnnIndex.storedIndexFor(spark, sfDir)
        val lexDir = LexStore.storedLexFor(spark, sfDir)
        timed("full stack (pass1)") {
          drive(Similarity.hybridRrfStoredStackTopK(spark, sfDir, 5, 10))
        }
        timed("full stack (pass2)") {
          drive(Similarity.hybridRrfStoredStackTopK(spark, sfDir, 5, 10))
        }
        timed("AnnIndex.open") { AnnIndex.open(spark, annDir); () }
        def queryTerms(): Seq[String] = graft.Tables.documents(spark, sfDir)
          .filter(col("doc_id") < 5)
          .select(explode(array_distinct(split(col("text"), " "))).as("t"))
          .distinct().collect().map(_.getString(0)).toSeq
        timed("queryTermsOf") { queryTerms(); () }
        val qts = queryTerms()
        timed("LexStore.load (lazy)") {
          LexStore.load(spark, lexDir, qts); ()
        }
        timed("LexStore.load + drive post") {
          drive(LexStore.load(spark, lexDir, qts).post)
        }
        timed("dense arm (ivfPqTopK stored)") {
          drive(AnnIndex.ivfPqTopK(spark, sfDir, annDir, 5, 20))
        }
        timed("hybrid stored (lex only diff)") {
          drive(Similarity.hybridRrfStoredTopK(spark, sfDir, 5, 10))
        }
      case "ivfpq" =>
        import graft.llmdata.AnnIndex
        val annDir = AnnIndex.storedIndexFor(spark, sfDir)
        timed("ivfPqTopK stored (1)") {
          drive(AnnIndex.ivfPqTopK(spark, sfDir, annDir, 5, 20))
        }
        timed("ivfPqTopK stored (2)") {
          drive(AnnIndex.ivfPqTopK(spark, sfDir, annDir, 5, 20))
        }
        val h = AnnIndex.open(spark, annDir)
        timed("open (again)") { AnnIndex.open(spark, annDir); () }
        timed("topKAt (pinned handle)") {
          drive(AnnIndex.topKAt(spark, h, sfDir, 5, 20))
        }
        timed("queries collect") {
          graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
            .select(col("vec_id"), col("embedding")).collect(); ()
        }
      case "span" =>
        val docs = graft.Tables.documents(spark, sfDir)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))
        val leadWins = docs
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .select(col("doc_id"), col("pos"), col("col").as("t0"))
          .select(col("doc_id"), col("pos"), col("t0"),
            lead(col("t0"), 1).over(w).as("t1"),
            lead(col("t0"), 2).over(w).as("t2"),
            lead(col("t0"), 3).over(w).as("t3"))
          .filter(col("t3").isNotNull)
          .select(col("doc_id"), col("pos"),
            md5(concat_ws(" ", col("t0"), col("t1"), col("t2"), col("t3"))
              .cast("binary")).as("w"))
        val regexWins = docs
          .select(col("doc_id"), posexplode(expr(
            "regexp_extract_all(text, '(?:^| )(?=([^ ]+ [^ ]+ [^ ]+ [^ ]+))', 1)")))
          .select(col("doc_id"), col("pos"), md5(col("col").cast("binary")).as("w"))
        timed("lead-chain windows") { drive(leadWins) }
        timed("regex windows") { drive(regexWins) }
        def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
          val r = df.agg(count(lit(1)),
            expr("sum(pmod(xxhash64(doc_id, pos, w, 42), 1000000007))")).head
          (r.getLong(0), r.getLong(1))
        }
        val a = sig(leadWins); val b = sig(regexWins)
        println(s"[scratch] lead=$a regex=$b identical=${a == b}")
        timed("full spanRemoval (1)") {
          drive(graft.llmdata.TextAnalysis.spanRemoval(spark, sfDir))
        }
        timed("full spanRemoval (2)") {
          drive(graft.llmdata.TextAnalysis.spanRemoval(spark, sfDir))
        }
      case "mh" =>
        import graft.llmdata.Dedup
        timed("minhash neardup (1)") {
          drive(Dedup.minhashNearDup(spark, sfDir, 0.5))
        }
        timed("minhash neardup (2)") {
          drive(Dedup.minhashNearDup(spark, sfDir, 0.5))
        }
        // stage isolation: signatures alone (32 md5-min buffers)
        val posting = Dedup.shinglePostings(spark, sfDir)
        val sigAggs = (0 until 32).map(j =>
          min(substring(md5(concat(lit(s"$j:"), col("g")).cast("binary")),
            1, 15)).as(s"mh$j"))
        val sigs = posting.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
        timed("sigs only (1)") { drive(sigs) }
        timed("sigs only (2)") { drive(sigs) }
        // dictionary variant: md5 once per distinct shingle
        val gd = (0 until 32).map(j =>
          min(substring(md5(concat(lit(s"$j:"), col("g")).cast("binary")),
            1, 15)).as(s"mh$j")) // same expr but over distinct g via two-level agg
        val sigsDict = posting
          .groupBy(col("g")).agg(collect_list(col("doc_id")).as("ids"))
          .select(explode(col("ids")).as("doc_id"), col("g"))
        timed("noop") { () }
        val dict = posting.select(col("g")).distinct()
          .select(col("g") +: (0 until 32).map(j =>
            substring(md5(concat(lit(s"$j:"), col("g")).cast("binary")),
              1, 15).as(s"h$j")): _*)
        val sigs2 = posting.join(broadcast(dict), "g")
          .groupBy("doc_id")
          .agg(min(col("h0")).as("mh0"),
            (1 until 32).map(j => min(col(s"h$j")).as(s"mh$j")): _*)
        timed("sigs dict (1)") { drive(sigs2) }
        timed("sigs dict (2)") { drive(sigs2) }
        timed("simhash pairs (1)") {
          drive(Dedup.simhashNearDup(spark, sfDir, 6))
        }
        timed("simhash pairs (2)") {
          drive(Dedup.simhashNearDup(spark, sfDir, 6))
        }
      case "2l" | "2li" | "ddl" | "flat" =>
        // llmdata-private probes live next to the package they time
        graft.llmdata.ScratchLlm.run(spark, sfDir, args.head, timed, drive)
      case "open" =>
        import graft.llmdata.AnnIndex
        val annDir = AnnIndex.storedIndexFor(spark, sfDir)
        AnnIndex.open(spark, annDir) // warm FS metadata
        val gen = graft.sync.GenDir.newest(spark, annDir).get._2
        timed("open total") { AnnIndex.open(spark, annDir); () }
        timed("centroids collect") {
          spark.read.parquet(s"$gen/centroids.parquet").collect(); () }
        timed("books collect") {
          spark.read.parquet(s"$gen/books.parquet").collect(); () }
        timed("rotation collect") {
          spark.read.parquet(s"$gen/rotation.parquet").collect(); () }
        timed("meta json") {
          graft.sync.GenDir.readJson(spark, s"$gen/meta.json", "m"); () }
        timed("deltas listing") {
          graft.sync.GenDir.deltas(spark, gen); () }
        timed("3 collects threaded") {
          val ths = Seq(s"$gen/centroids.parquet", s"$gen/books.parquet",
            s"$gen/rotation.parquet").map { p =>
            val t = new Thread(() => { spark.read.parquet(p).collect(); () })
            t.start(); t
          }
          ths.foreach(_.join())
        }
      case "ingestfx" =>
        import graft.llmdata.Ingest
        val work = java.nio.file.Files
          .createTempDirectory("graft-scratch-ingest").toString
        val dirs = Ingest.dirsUnder(work)
        timed("bootstrap") {
          Ingest.bootstrap(spark, sfDir, dirs, 10, 7)
        }
        val docs = graft.Tables.documents(spark, sfDir)
        val emb = graft.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        timed("run (1 shard)") {
          Ingest.run(spark, dirs,
            docs.filter(col("doc_id") % 10 =!= 7),
            docs.filter(col("doc_id") % 10 === 7),
            emb.filter(col("vec_id") % 10 === 7), shardId = 0L)
        }
      case other =>
        println(s"[scratch] unknown mode $other")
    }
    spark.stop()
  }
}
