package graft.llmdata

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Gates for the rolling-hash fingerprint family (rows-only in
  * CORRECTNESS — xxhash64 token hashes aren't DuckDB-reproducible). */
class TextAnalysisSpec extends SparkSpec {

  test("corpus contract: document text is strictly single-space separated (r16, VERDICT r15 #8)") {
    // tokenWindowPattern's `(?:^| )(?=(tok tok …))` windows are only
    // equivalent to the split-on-space + lead-chain form when text has
    // no leading/trailing space and no consecutive spaces (split would
    // emit EMPTY tokens there; the regex token is a non-space run, so
    // the two silently diverge). This pins the data assumption loudly
    // instead of silently: a corpus violating it must fail HERE, not
    // produce drifted n-gram windows. Tabs/newlines are fine — both
    // forms treat only ' ' as the separator.
    val bad = Tables.documents(spark, sf)
      .filter(col("text").rlike("^ |  | $"))
    assert(bad.count() === 0,
      "documents.text must be single-space separated — " +
        "tokenWindowPattern's equivalence precondition")
  }

  test("rolling fingerprints are order-sensitive where bag fingerprints are not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha"), // same bag, reversed
      (3L, "alpha beta gamma delta epsilon zeta")) // identical to 1
      .toDF("doc_id", "text")
    // run the operator over a table-shaped temp corpus
    val tmp = java.nio.file.Files.createTempDirectory("graft-roll").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val byId = TextAnalysis.rollingFingerprints(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // identical docs share ALL windows; the reversed doc shares none
    assert(byId(1L) === byId(3L))
    assert((byId(1L) & byId(2L)).isEmpty)
  }

  test("rolling overlap pairs find the corpus' near-duplicate passages") {
    val overlap = TextAnalysis.rollingOverlapPairs(spark, sf, 3)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every high-Jaccard near-dup pair shares passages of ≥ window length
    val nearDups = Dedup.jaccardPairs(spark, sf, 0.8)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nearDups.nonEmpty)
    assert(nearDups.subsetOf(overlap),
      s"missing ${(nearDups -- overlap).size} of ${nearDups.size} near-dup pairs")
  }

  test("quality scores: ratios bounded in [0,1] and consistent with counts") {
    val q = TextAnalysis.qualityScores(spark, sf)
    assert(q.filter(col("type_token_ratio") > 1 || col("type_token_ratio") <= 0)
      .count() === 0)
    assert(q.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1)
      .count() === 0)
    assert(q.filter(col("n_types") > col("n_tokens")).count() === 0)
    assert(q.count() === Tables.documents(spark, sf).count())
  }

  /** Write a tiny (doc_id, text) corpus as a documents.parquet table. */
  private def tmpCorpus(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-txt").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("DSIR weights: scoring follows the TEXT, not the label, and target vocabulary outranks") {
    import spark.implicits._
    // target (en) docs speak a T-vocabulary, off-target docs a
    // U-vocabulary; two probe docs cross text and label. DSIR scores
    // tokens by bucket log-ratios, so a target-vocab text must outrank
    // an off-target-vocab text REGARDLESS of its own lang label (the
    // label only defines the estimation split).
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    Seq(
      (1L, "tea tree taupe tint tan tea tree", "en"),
      (2L, "tea tint taupe tan tree tint tea", "en"),
      (3L, "urn umber ultra under uphill urn", "de"),
      (4L, "umber urn under ultra uphill urn", "de"),
      (10L, "tea tree tint taupe", "de"), // target-like text, off-target label
      (11L, "urn umber ultra under", "en")) // off-target text, target label
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val w = TextAnalysis.dsirWeights(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size === 6)
    // ORDERING is the contract (resampling uses relative weights);
    // absolute signs are not asserted — with a toy corpus the add-one
    // smoothing mass (256 buckets ≫ tokens) shifts every weight down
    assert(w(10L) > w(11L), s"target-vocab text must outrank: $w")
    assert(w(1L) > w(3L), s"target docs must outrank off-target docs: $w")
    assert(w(1L) > w(11L) && w(2L) > w(4L),
      s"every target-vocab doc must outrank every off-target-vocab doc: $w")
  }

  test("bm25: tf monotone, non-matching docs absent, rarer term outranks") {
    val tmp = tmpCorpus(Seq(
      (1L, "spark spark spark pad pad"),   // tf(spark)=3
      (2L, "spark pad pad pad pad"),       // tf(spark)=1, same dl
      (3L, "pad pad pad pad pad"),         // no query term
      (4L, "vector pad pad pad pad")))     // rarer term (df 1 vs 2), same dl
    val r = TextAnalysis.bm25TopK(spark, tmp, Seq("spark", "vector"), 10)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(!r.contains(3L), "doc without any query term must not score")
    assert(r(1L) > r(2L), "higher tf at equal length must score higher")
    assert(r(4L) > r(2L), "rarer term (higher idf) must outrank at equal tf/dl")
  }

  test("curation report: verdicts partition the corpus, every arm fires, first-failure wins") {
    val r = TextAnalysis.curationReport(spark, sf).collect()
    val byVerdict = r.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    // a partition of the corpus: every doc counted exactly once
    assert(byVerdict.values.sum === Tables.documents(spark, sf).count())
    // thresholds are tuned so no verdict arm is vacuous at oracle scale
    Seq("kept", "too_short", "repetitive", "low_diversity", "rare_tokens")
      .foreach(v => assert(byVerdict.getOrElse(v, 0L) > 0L, s"vacuous arm: $v"))

    // first-failure attribution: a doc that is BOTH short and repetitive
    // lands in too_short (the earlier filter)
    val tmp = tmpCorpus(Seq(
      (1L, "x x x x x"),  // 5 tokens, dup_ratio 0.75: short AND repetitive
      (2L, (0 until 40).map(i => s"w$i").mkString(" "))))  // clean
    val v = TextAnalysis.curationReport(spark, tmp)
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(v.getOrElse("too_short", 0L) === 1L)
    assert(v.getOrElse("repetitive", 0L) === 0L)
  }

  test("shard packing: contiguous ids, complete partition, bounded shard size") {
    val docs = Tables.documents(spark, sf)
    // 120-token target so sources actually split into multiple shards
    // at the spec's tiny scale (docs average ~56 tokens)
    val r = TextAnalysis.shardAssign(spark, sf, 120L).collect()
    assert(r.map(_.getLong(2)).sum === docs.count())
    r.groupBy(_.getString(0)).values.foreach { shards =>
      val byShard = shards.sortBy(_.getLong(1))
      // shard ids are dense from 0 and id ranges never interleave
      assert(byShard.map(_.getLong(1)).toSeq === byShard.indices.map(_.toLong))
      byShard.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4),
          "shard id ranges must be contiguous, not interleaved")
        case _ =>
      }
      // a shard exceeds the target only by its last (straddling) doc
      // (corpus max doc length is 99 tokens)
      byShard.dropRight(1).foreach { s =>
        assert(s.getLong(3) < 120L + 100L,
          s"shard overfull beyond one straddling doc: $s")
      }
      assert(byShard.length > 1, "target must split every source at this scale")
    }
  }

  test("tfidf top terms: dense ranks, descending scores, ubiquitous terms scored zero") {
    import spark.implicits._
    val rows = TextAnalysis.tfidfTopTerms(spark, sf, 3)
      .select("doc_id", "rnk", "term", "score_micro").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      val ranked = rs.sortBy(_.getInt(1))
      // ranks are exactly 1..k' with scores non-increasing in rank
      assert(ranked.map(_.getInt(1)).toSeq === (1 to ranked.length))
      val scores = ranked.map(_.getLong(3)).toSeq
      assert(scores === scores.sorted.reverse)
    }
    // a term present in EVERY doc has idf = ln(1) = 0: it can never carry
    // a positive tf-idf weight, so any selected term with positive score
    // must be non-ubiquitous
    val nDocs = Tables.documents(spark, sf).count()
    val ubiquitous = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct().groupBy("term").count()
      .filter(col("count") === nDocs)
      .select("term").as[String].collect().toSet
    rows.filter(_.getLong(3) > 0L)
      .foreach(r => assert(!ubiquitous.contains(r.getString(2))))
  }

  test("unigram logprob: common-token docs outscore rare-token docs, exact mean") {
    val tmp = tmpCorpus(Seq(
      (1L, "a a a a"),
      (2L, "a a a b")))
    val r = TextAnalysis.unigramLogprob(spark, tmp).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L)._1 === 4 && r(2L)._1 === 4)
    assert(r(1L)._2 > r(2L)._2, "the rare-token doc must score lower")
    // doc 1 is uniform: every token has p = 7/8, so the mean IS ln(7/8)
    // (up to the 1e-6 micro quantization)
    assert(math.abs(r(1L)._2 - math.log(7.0 / 8.0)) < 1e-5)
  }

  test("bpe encode equals a driver-side application of the trained table, counts monotone") {
    import spark.implicits._
    val got = TextAnalysis.bpeEncode(spark, sf, 12).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val merges = TextAnalysis.bpeMergesFor(spark, sf, 12)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    docs.foreach { case (id, text) =>
      val words = text.split(" ").filter(_.nonEmpty)
      val nBpe = words.map { w =>
        var seq: List[String] = w.map(_.toString).toList
        merges.foreach { case (a, b, m) =>
          seq = TextAnalysis.applyMerge(seq, a, b, m)
        }
        seq.length.toLong
      }.sum
      val (nw, nc, nb) = got(id)
      assert(nw === words.length.toLong)
      assert(nc === words.map(_.length.toLong).sum)
      assert(nb === nBpe, s"doc $id")
      // every merge only ever shrinks a sequence; every word is ≥ 1 token
      assert(nb <= nc && nb >= nw)
    }
    // the trained merges actually fire on the corpus they were trained on
    assert(got.values.map(_._3).sum < got.values.map(_._2).sum,
      "12 merges over the training corpus must compress at least one doc")
  }

  test("weighted sample matches a driver-side A-Res reference and tilts toward heavy docs") {
    val k = 20
    val got = TextAnalysis.weightedSample(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    // independent driver-side reference: same salted-md5 uniform,
    // ln(u)/w key, nano quantization, (key desc, id asc) order
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).length))
      .filter(_._2 > 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Int): Long = {
      val hex = md.digest(s"$id:wsample".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val hv = hex.foldLeft(0L)((acc, c) => acc * 16 + "0123456789abcdef".indexOf(c))
      math.floor(math.log((hv + 0.5) / 65536.0) / w * 1000000000.0 + 0.5).toLong
    }
    val expect = docs.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, kq) => (-kq, id) }.take(k)
    assert(got.toSeq === expect.toSeq)
    // the tilt: the sample's mean weight must exceed the corpus mean
    val wMap = docs.toMap
    val sampleMean = got.map(g => wMap(g._1)).sum.toDouble / got.length
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"sample mean weight $sampleMean should exceed corpus mean $corpusMean")
  }

  test("bigram LM: coherent word order outscores shuffled text with the same bag") {
    // docs 1-4 establish the dominant transitions (the cat sat ...);
    // doc 5 repeats them coherently, doc 6 carries the SAME token bag
    // in scrambled order — a unigram model scores 5 and 6 identically,
    // the bigram LM must not
    val tmp = tmpCorpus(Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "the cat sat on the mat"),
      (5L, "the cat sat on the mat"),
      (6L, "mat the on sat cat the")))
    val bi = TextAnalysis.bigramLogprob(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi(5L) > bi(6L),
      s"coherent ${bi(5L)} should outscore shuffled ${bi(6L)}")
    val uni = TextAnalysis.unigramLogprob(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(uni(5L) - uni(6L)) < 1e-9,
      "unigram scoring is blind to word order by construction")
  }

  test("dynamic threshold: per-source P10 cutoffs match a driver-side quantile") {
    val got = TextAnalysis.dynamicThreshold(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // reference: collect per-doc scores, linear-interpolation quantile
    // (the percentile/quantile_cont definition), strict-less count
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scores = TextAnalysis.unigramLogprob(spark, sf).collect()
      .map(r => srcOf(r.getLong(0)) -> r.getDouble(2))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted }
    assert(got.keySet === scores.keySet)
    scores.foreach { case (src, xs) =>
      val pos = (xs.length - 1) * 0.1
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      val refCut = BigDecimal(xs(lo) + (pos - lo) * (xs(hi) - xs(lo)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (nDocs, nFlagged, cutoff) = got(src)
      assert(nDocs === xs.length)
      assert(math.abs(cutoff - refCut) < 1e-9, s"$src cutoff $cutoff vs $refCut")
      assert(nFlagged === xs.count(_ < refCut).toLong, s"flag count for $src")
      // the cut is non-vacuous and actually adaptive: ~10% tail per source
      assert(nFlagged > 0 && nFlagged < nDocs)
    }
    // cutoffs differ across sources — the reason a GLOBAL constant is wrong
    assert(got.values.map(_._3).toSet.size > 1)
  }

  /** Driver-side BPE trainer with [[TextAnalysis.bpeMerges]]'s exact
    * conventions: overlapping pair counts, lexicographic tie-break,
    * greedy left-to-right non-overlapping merge. */
  private def refBpe(words: Seq[(String, Long)],
                     m: Int): Seq[(Int, String, String, String, Long)] = {
    var seqs = words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var round = 1
    var done = false
    while (round <= m && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      seqs.foreach { case (s, f) =>
        var i = 0
        while (i + 1 < s.length) { counts((s(i), s(i + 1))) += f; i += 1 }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        val mg = a + b
        out += ((round, a, b, mg, cnt))
        seqs = seqs.map { case (s, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          s.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b) acc(acc.length - 1) = mg
            else acc += x
          }
          (acc.toVector, f)
        }
        round += 1
      }
    }
    out.toSeq
  }

  test("BPE merge training equals the driver-side reference trainer exactly") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = refBpe(words, 12)
    val got = TextAnalysis.bpeMerges(spark, sf, 12).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got === expected)
    assert(got.nonEmpty && got.forall { case (_, a, b, m, c) =>
      m == a + b && c > 0 })
  }

  test("mixture weights: flatten toward uniform, normalize, and invert share order") {
    val rows = TextAnalysis.mixtureWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9, "shares sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, "weights sum to 1")
    // α < 1 flattens: smaller share ⇒ strictly larger up-sampling factor
    val byShare = rows.sortBy(_._3)
    byShare.sliding(2).foreach {
      case Array(a, b) =>
        if (a._3 < b._3)
          assert(a._5 > b._5, s"factor must fall as share rises: $a vs $b")
      case _ =>
    }
    // α = 1 is the identity mixture (up to micro quantization)
    TextAnalysis.mixtureWeights(spark, sf, alpha = 1.0).collect().foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(2)) < 1e-5,
        s"alpha=1 weight must equal share: $r")
    }
  }

  test("BPE merges apply in training order: a later merge can build on an earlier one") {
    // "abab" x3: merge 1 = (a,b) -> ab; merge 2 must then see (ab,ab)
    val tmp = tmpCorpus(Seq((1L, "abab abab abab")))
    val got = TextAnalysis.bpeMerges(spark, tmp, 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(got(0) === ((1, "a", "b", 6L)))
    assert(got(1) === ((2, "ab", "ab", 3L)))
  }

  test("source entropy: bounds hold and degenerate/uniform sources hit them") {
    val r = TextAnalysis.sourceEntropy(spark, sf).collect()
    assert(r.length > 1)
    r.foreach { row =>
      val (terms, h, kl) = (row.getLong(2), row.getDouble(3), row.getDouble(4))
      assert(h >= 0.0 && h <= math.log(terms.toDouble) + 1e-6,
        s"entropy outside [0, ln n_terms]: $row")
      assert(kl >= -1e-6, s"KL(source||corpus) must be non-negative: $row")
    }
    // crafted: a one-token source has H=0; a uniform 4-token source has H=ln 4
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ent").toString
    Seq((1L, "x x x x x x x x", "mono"), (2L, "a b c d", "uni"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = TextAnalysis.sourceEntropy(spark, tmp).collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(m("mono") === 0.0)
    assert(math.abs(m("uni") - math.log(4.0)) < 1e-5)
  }

  test("span removal: shared passages excise exactly, unique text survives") {
    // docs 1 and 2 share one 6-token passage (⇒ three 4-token windows
    // covering 6 positions in each); doc 3 is fully unique; doc 4 is an
    // exact copy of doc 3 (every window duplicated ⇒ nothing kept).
    val passage = "alpha beta gamma delta epsilon zeta"
    val tmp = tmpCorpus(Seq(
      (1L, s"u1 u2 u3 $passage u4 u5 u6"),
      (2L, s"v1 $passage v2 v3 v4 v5"),
      (3L, "w1 w2 w3 w4 w5 w6 w7"),
      (4L, "w1 w2 w3 w4 w5 w6 w7")))
    val r = TextAnalysis.spanRemoval(spark, tmp).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getLong(3), x.getLong(4))))
      .toMap
    assert(r(1L) === ((12L, 6L, 6L)), "doc 1: exactly the passage excised")
    assert(r(2L) === ((11L, 6L, 5L)), "doc 2: exactly the passage excised")
    assert(r(3L) === ((7L, 7L, 0L)), "doc 3: fully duplicated by its copy")
    assert(r(4L) === ((7L, 7L, 0L)), "doc 4: fully duplicated by its copy")
  }

  test("span removal equals a brute-force reference on 10 random corpora") {
    val rng = new scala.util.Random(7)
    (1 to 10).foreach { trial =>
      // small vocab forces genuine cross-doc window collisions
      val vocab = Vector("a", "b", "c", "d")
      val docs = (0 until 6).map { id =>
        val n = 4 + rng.nextInt(8)
        (id.toLong, (0 until n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      val refCounts = {
        val toks = docs.map { case (id, t) => id -> t.split(" ").toVector }.toMap
        val wins = toks.toSeq.flatMap { case (id, ts) =>
          ts.sliding(4).filter(_.size == 4).zipWithIndex
            .map { case (w, i) => (id, i, w.mkString(" ")) }
        }
        val dup = wins.groupBy(_._3)
          .filter(_._2.map(_._1).distinct.size >= 2).keySet
        docs.map { case (id, _) =>
          val covered = wins.filter(w => w._1 == id && dup(w._3))
            .flatMap(w => w._2 until (w._2 + 4)).toSet
          id -> covered.size.toLong
        }.toMap
      }
      val tmp = tmpCorpus(docs)
      val got = TextAnalysis.spanRemoval(spark, tmp).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === refCounts, s"trial $trial: docs=$docs")
    }
  }

  test("passage chunks cover every token exactly, with no redundant tail") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 toks: 4 chunks
      (2L, (1 to 33).map(i => s"w$i").mkString(" ")),  // 33: starts 0,24
      (3L, (1 to 25).map(i => s"w$i").mkString(" ")),  // 25: tail redundant ⇒ 1 chunk
      (4L, "solo"),                                    // 1 token
      (5L, (1 to 32).map(i => s"w$i").mkString(" ")))  // exactly c
    val tmp = tmpCorpus(docs)
    val rows = TextAnalysis.passageChunks(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).length === 4 && byDoc(2L).length === 2)
    assert(byDoc(3L).length === 1 && byDoc(4L).length === 1)
    assert(byDoc(5L).length === 1)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val chunks = byDoc(id).sortBy(_._2)
      // chunk text IS the token slice it claims
      chunks.foreach { case (_, _, start, nToks, chunk) =>
        assert(chunk === toks.slice(start, start + 32).mkString(" "))
        assert(nToks === math.min(32, toks.length - start))
      }
      // coverage: every position in ≥1 chunk; starts on the stride grid
      val covered = chunks.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered === toks.indices.toSet)
      chunks.foreach(c => assert(c._3 === c._2 * 24))
      // no chunk fully contained in its predecessor
      chunks.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 < b._3 + b._4)
        case _ =>
      }
    }
  }

  test("chunk dedup: identical passages collapse to the least (doc, idx) survivor") {
    val boiler = (1 to 32).map(i => s"b$i").mkString(" ") // exactly one chunk
    val tmp = tmpCorpus(Seq(
      (7L, boiler),                                       // duplicate of 3's chunk
      (3L, boiler),                                       // survivor (least doc_id)
      (9L, (1 to 20).map(i => s"u$i").mkString(" "))))    // unique chunk
    val got = TextAnalysis.chunkDedup(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === Set((3L, 0, 2L), (9L, 0, 1L)))
  }

  test("PII redaction: typed placeholders, exact counts, fixed order, idempotent") {
    val tmp = tmpCorpus(Seq(
      (1L, "contact bob.smith+x@corp.example.com or visit https://x.io/a?u=me@yy.zz now"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 replied"),
      (3L, "plain text with no pii at all"),
      (4L, "mixed: http://a.b/c then c@d.ee then 8.8.8.8"),
      (5L, "ping http://10.0.0.1/x now")))
    val got = TextAnalysis.redactPii(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    // doc 1: me@yy.zz IS a well-formed email, but it sits inside the
    // URL — progressive counting sees only the outside address
    assert(got(1L) === ((1, 1, 0)))
    assert(got(2L) === ((0, 0, 2)))
    assert(got(3L) === ((0, 0, 0)))
    assert(got(4L) === ((1, 1, 1)))
    // doc 5: an IP that is only a URL's host never counts as an IP
    assert(got(5L) === ((1, 0, 0)))
    // the scrubbed text carries placeholders, no residual matches
    import spark.implicits._
    val texts = Tables.documents(spark, tmp)
      .select(col("doc_id"), TextAnalysis.redactedText(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(texts(1L) === "contact <EMAIL> or visit <URL> now")
    assert(texts(2L) === "server at <IP> and <IP> replied")
    assert(texts(4L) === "mixed: <URL> then <EMAIL> then <IP>")
    // idempotence: placeholders match none of the patterns
    val twice = Tables.documents(spark, tmp)
      .select(col("doc_id"),
        TextAnalysis.redactedText(TextAnalysis.redactedText(col("text"))).as("t"))
      .as[(Long, String)].collect().toMap
    assert(twice === texts)
  }

  test("span removal: within-doc repetition alone is not cross-doc duplication") {
    // the repeated phrase lives in ONE doc only ⇒ df=1 ⇒ nothing excised
    val tmp = tmpCorpus(Seq(
      (1L, "p q r s p q r s p q r s"),
      (2L, "a b c d e f g h")))
    val r = TextAnalysis.spanRemoval(spark, tmp).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(1L) === 0L)
    assert(r(2L) === 0L)
  }

  test("pack assignment: windows tile each source token stream exactly") {
    val rows = TextAnalysis.packAssign(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, ds) =>
      var cb = 0L
      ds.sortBy(_._2).foreach { case (_, id, nTok, first, last, spans) =>
        assert(first === cb / 256L, s"$src/$id pack_first")
        assert(last === (cb + nTok - 1) / 256L, s"$src/$id pack_last")
        assert(spans === last - first + 1 && spans >= 1L, s"$src/$id spans")
        cb += nTok
      }
    }
    // fragmentation is the point of the report: some doc must straddle
    assert(rows.exists(_._6 > 1L))
  }

  test("train order: a seeded md5 permutation, exact vs driver sort, seed-sensitive, shards balanced (r12)") {
    val rows = TextAnalysis.trainOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(n > 0)
    // ord is a permutation of 0..N-1
    assert(rows.map(_._3).toSet === (0L until n.toLong).toSet)
    // the two-level rank (bucket offsets + within-bucket ranks) equals
    // ONE driver-side global sort of the same keys, position for
    // position — the mechanism swap changes no math
    val ref = rows.map(r => (r._2, r._1)).sorted.map(_._2).toSeq
    assert(rows.sortBy(_._3).map(_._1).toSeq === ref)
    // round-robin shards, balanced within one doc
    assert(rows.forall(r => r._4 === r._3 % 16))
    val sizes = rows.groupBy(_._4).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
    // reproducible; a different seed is a DIFFERENT permutation (the
    // seed is load-bearing, not decorative)
    val byDoc = rows.map(r => (r._1, r._3)).sortBy(_._1).toSeq
    val again = TextAnalysis.trainOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(again === byDoc)
    val other = TextAnalysis.trainOrder(spark, sf, seed = 8L).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(other !== byDoc)
  }

  test("blocked two-level shard and pack assignment equal the single-level references exactly") {
    val shardRef = TextAnalysis.shardAssign(spark, sf).collect().toSeq
    val packRef = TextAnalysis.packAssign(spark, sf).collect().toSeq
    // 64 = the registered default; 7 = ragged blocks (id ranges that
    // straddle source boundaries and end mid-block)
    for (bd <- Seq(64L, 7L)) {
      assert(TextAnalysis.shardAssignBlocked(spark, sf, blockDocs = bd)
        .collect().toSeq === shardRef, s"shard blockDocs=$bd")
      assert(TextAnalysis.packAssignBlocked(spark, sf, blockDocs = bd)
        .collect().toSeq === packRef, s"pack blockDocs=$bd")
    }
  }

  test("URL canonicalization edge cases: case/port/fragment/query-sort, userinfo and IDN as documented (r9 #7)") {
    import spark.implicits._
    val urls = Seq(
      // mixed case + default port + unsorted query + fragment
      (0L, "HTTP://WWW.Example.COM:80/A/b?z=1&a=2#frag"),
      // empty path -> "/", https default port stripped
      (1L, "https://Host.com:443"),
      // non-default port kept
      (2L, "https://Host.com:8443/x"),
      // USERINFO: authority verbatim (usernames are case-sensitive);
      // scheme/query/fragment still canonicalize — documented limit
      (3L, "HtTpS://User:Pw@Host.COM:443/p?b=1&a=2#f"),
      // IDN: lowercased as-is, NOT punycoded — documented limit
      (4L, "http://Ünïcode.Example/path"),
      // trim + multi-label host -> two-label fallback (c.co is not a
      // listed public suffix)
      (5L, "  https://a.b.c.co/x?a=1  "),
      // unparseable: returned trimmed, untouched
      (6L, "not a url"),
      // PUBLIC-SUFFIX rule (r10 #4): last two labels are a listed
      // suffix -> eTLD+1 is the last THREE labels
      (7L, "https://Deep.Sub.Example.Co.UK/x"),
      // a BARE public suffix has no registrable name -> itself
      (8L, "http://CO.UK"),
      // bracketed IPv6 authority: verbatim pass-through in the canon
      // (ADVICE r10), bracketed address as the "domain"
      (9L, "http://[::1]:8080/p?b=2&a=1#f"),
      (10L, "https://shop.example.com.au"),
      // WILDCARD rule (r12, r11 #5): *.ck makes shop.ck a public
      // suffix -> eTLD+1 is the last THREE labels
      (11L, "https://A.B.Example.Shop.CK/x"),
      // EXCEPTION rule: !www.ck punctures the wildcard -> www.ck is
      // itself the registrable name, for itself and any subdomain
      (12L, "http://Sub.WWW.CK"),
      // a BARE wildcard-covered suffix has no registrable name
      (13L, "https://Shop.CK"),
      // PRIVATE section: each github.io / blogspot.com subdomain is
      // an independent site -> the FULL subdomain is the domain
      (14L, "https://Alice.GitHub.IO"),
      (15L, "http://My-Blog.BlogSpot.Com/post/1"),
      // 3-label private suffix -> last FOUR labels (the bucket)
      (16L, "http://Bucket.S3.AmazonAWS.com/key"),
      (17L, "https://Deep.Bucket.S3.AmazonAWS.com"),
      // bare 3-label private suffix -> itself
      (18L, "http://S3.AmazonAWS.com"),
      // FULL-LIST rule classes (r13): 2-label wildcard parent
      // (*.kawasaki.jp) -> suffix is <x>.kawasaki.jp, registrable one
      // label above it
      (19L, "https://A.B.Host.Kawasaki.JP"),
      // ...which the 3-label exception !city.kawasaki.jp punctures
      (20L, "http://www.City.Kawasaki.JP/x"),
      // a wildcard-covered bare suffix has no registrable name
      (21L, "https://bare.kawasaki.jp"),
      // the wildcard does NOT cover the bare parent itself: kawasaki.jp
      // registers under jp like any other name
      (22L, "http://kawasaki.jp"),
      // 3-label wildcard parent from the private section
      (23L, "http://x.B.CNS.Joyent.Com"),
      // 4-label normal private rule -> registrable = last FIVE labels
      (24L, "https://Data.Bucket.S3.AP-South-1.AmazonAWS.Com/key"),
      // 4-label wildcard parent (*.compute.amazonaws.com.cn)
      (25L, "http://y.VM.Compute.AmazonAWS.Com.CN")
    ).toDF("doc_id", "url")
    val got = urls.select(col("doc_id"),
        TextAnalysis.canonicalUrl(col("url")).as("c"),
        TextAnalysis.registrableDomain(col("url")).as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(got(0L) === (("http://www.example.com/A/b?a=2&z=1", "example.com")))
    assert(got(1L) === (("https://host.com/", "host.com")))
    assert(got(2L) === (("https://host.com:8443/x", "host.com")))
    assert(got(3L) === (("https://User:Pw@Host.COM:443/p?a=2&b=1", "host.com")))
    assert(got(4L) === (("http://ünïcode.example/path", "ünïcode.example")))
    assert(got(5L) === (("https://a.b.c.co/x?a=1", "c.co")))
    assert(got(6L) === (("not a url", "")))
    assert(got(7L) === (("https://deep.sub.example.co.uk/x", "example.co.uk")))
    assert(got(8L) === (("http://co.uk/", "co.uk")))
    assert(got(9L) === (("http://[::1]:8080/p?a=1&b=2", "[::1]")))
    assert(got(10L) === (("https://shop.example.com.au/", "example.com.au")))
    assert(got(11L) === (("https://a.b.example.shop.ck/x", "example.shop.ck")))
    assert(got(12L) === (("http://sub.www.ck/", "www.ck")))
    assert(got(13L) === (("https://shop.ck/", "shop.ck")))
    assert(got(14L) === (("https://alice.github.io/", "alice.github.io")))
    assert(got(15L) ===
      (("http://my-blog.blogspot.com/post/1", "my-blog.blogspot.com")))
    assert(got(16L) ===
      (("http://bucket.s3.amazonaws.com/key", "bucket.s3.amazonaws.com")))
    assert(got(17L) === (("https://deep.bucket.s3.amazonaws.com/",
      "bucket.s3.amazonaws.com")))
    assert(got(18L) === (("http://s3.amazonaws.com/", "s3.amazonaws.com")))
    assert(got(19L)._2 === "b.host.kawasaki.jp")
    assert(got(20L)._2 === "city.kawasaki.jp")
    assert(got(21L)._2 === "bare.kawasaki.jp")
    assert(got(22L)._2 === "kawasaki.jp")
    assert(got(23L)._2 === "x.b.cns.joyent.com")
    assert(got(24L)._2 === "bucket.s3.ap-south-1.amazonaws.com")
    assert(got(25L)._2 === "y.vm.compute.amazonaws.com.cn")
    // idempotence: canonicalizing a canonical URL is a fixed point
    val canon = urls.select(TextAnalysis.canonicalUrl(col("url")).as("c"))
    val twice = canon.select(col("c"),
      TextAnalysis.canonicalUrl(col("c")).as("cc"))
    assert(twice.filter(col("c") =!= col("cc")).count() === 0)
    // the registered rollup partitions the corpus: doc counts sum to
    // the corpus size and every domain resolves through one of the
    // planted PSL rule classes (doc_id % 12, r13: every rule class of
    // the FULL bundled list) — ALL present, so none is oracle-vacuous
    val roll = TextAnalysis.domainRollup(spark, sf).collect()
    assert(roll.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
    val domains = roll.map(_.getAs[String]("domain"))
    val exactOk = Set("www.ck", "city.kawasaki.jp")
    assert(domains.forall(d => exactOk(d) ||
      d.matches("src[0-9]+\\.(com|co\\.uk|blogspot\\.com|shop\\.ck|" +
        "s3\\.amazonaws\\.com|s3\\.ap-south-1\\.amazonaws\\.com|" +
        "vfs\\.cloud9\\.eu-west-2\\.amazonaws\\.com)") ||
      d.matches("www\\.src[0-9]+\\.(kawasaki\\.jp|cns\\.joyent\\.com|" +
        "compute\\.amazonaws\\.com\\.cn)")),
      domains.mkString(", "))
    for (cls <- Seq(".co.uk", ".blogspot.com", ".shop.ck",
        ".s3.amazonaws.com", ".kawasaki.jp",
        ".s3.ap-south-1.amazonaws.com",
        ".vfs.cloud9.eu-west-2.amazonaws.com", ".cns.joyent.com",
        ".compute.amazonaws.com.cn"))
      assert(domains.exists(_.endsWith(cls)),
        s"the $cls rule class must appear in the rollup")
    assert(domains.contains("www.ck") &&
      domains.contains("city.kawasaki.jp"),
      "both exception rule classes must appear in the rollup")
  }

  test("staged registrable-domain builder equals the reference Column form on the corpus and on pathological hosts (r14 #2)") {
    import spark.implicits._
    // the corpus side: every planted PSL rule class at sf scale
    val corpus = Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.syntheticUrl.as("url"))
    // the pathological side: hosts where the reference form's
    // `[^.]+` regex runs and the builder's slice+empty-label guard
    // must agree exactly (empty labels, trailing/leading dots, bare
    // hosts, brackets, userinfo, no-url rows)
    val edges = Seq(
      (100L, "http://a..b/x"), (101L, "http://b./"), (102L, "http://.b"),
      (103L, "https://x.co.uk."), (104L, "not a url"), (105L, ""),
      (106L, "http://[::1]:80/"), (107L, "https://u:p@deep.a.co.uk/y"),
      (108L, "http://..../"), (109L, "https://single"),
      (110L, "http://trail.example.com.")
    ).toDF("doc_id", "url")
    for (frame <- Seq(corpus, edges)) {
      val both = TextAnalysis
        .withRegistrableDomain(frame, col("url"), "d_staged")
        .withColumn("d_ref", TextAnalysis.registrableDomain(col("url")))
      val diff = both.filter(col("d_staged") =!= col("d_ref") ||
        col("d_staged").isNull =!= col("d_ref").isNull)
      assert(diff.count() === 0,
        diff.collect().take(5).mkString("; "))
    }
    // the builder leaves no staging columns behind
    val out = TextAnalysis.withRegistrableDomain(edges, col("url"), "d")
    assert(out.columns.toSeq === Seq("doc_id", "url", "d"))
  }

  test("per-domain cap: keep-first-K by doc id, exact per-domain counts, binds non-vacuously (r12)") {
    val cap = TextAnalysis.domainCap(spark, sf).collect()
    assert(cap.length === Tables.documents(spark, sf).count().toInt,
      "the verdict table must cover every document")
    cap.groupBy(_.getAs[String]("domain")).foreach { case (d, rows) =>
      val kept = rows.count(_.getAs[Long]("kept") == 1L)
      assert(kept === math.min(3, rows.length), s"domain $d keeps min(3, n)")
      // the kept set is exactly the first K in stable doc_id order
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      assert(sorted.take(kept).forall(_.getAs[Long]("kept") == 1L),
        s"domain $d kept set must be the doc_id-first block")
      assert(sorted.drop(kept).forall(_.getAs[Long]("kept") == 0L),
        s"domain $d overflow must be dropped")
    }
    assert(cap.exists(_.getAs[Long]("kept") == 0L),
      "the cap must bind at the gate scale (otherwise the test is vacuous)")
  }

  test("HTML extraction edges: script/style bodies go, nested tags, entity order, unknown entities pass through (r11 #7)") {
    import spark.implicits._
    def xt(html: String): String = Seq(html).toDF("h")
      .select(TextAnalysis.htmlExtractedText(col("h"))).head.getString(0)
    // script CONTENT is removed, not just the tags — a bare '<' in a
    // comparison must never leak into the text; (?i) covers SCRIPT
    assert(xt("a<SCRIPT>var x = 1 < 2; s(\"q\");</SCRIPT>b") === "a b")
    // multi-line script body ((?s) dotall)
    assert(xt("a<script>\nline1();\nline2();\n</script>b") === "a b")
    // style with attributes and a CSS body
    assert(xt("x<style media=\"all\">p { color: red; }</style>y") === "x y")
    // nested/sibling tags all strip; whitespace collapses
    assert(xt("<div><p>one <b>two</b></p>\n<p>three</p></div>")
      === "one two three")
    // entity decode AFTER tag strip: a decoded '<' does not start a
    // tag; '&amp;' decodes LAST so '&amp;lt;' is the literal '&lt;'
    assert(xt("<p>&lt;b&gt;not a tag&lt;/b&gt;</p>") === "<b>not a tag</b>")
    assert(xt("<p>&amp;lt;escaped&amp;gt;</p>") === "&lt;escaped&gt;")
    assert(xt("<p>fish &amp; chips&nbsp;&quot;hot&quot; &#39;now&#39;</p>")
      === "fish & chips \"hot\" 'now'")
    // entities OUTSIDE the decoded five pass through verbatim
    assert(xt("<footer>&copy; 2026 &hellip;</footer>") === "&copy; 2026 &hellip;")
    // a tagless payload is just whitespace-collapsed + trimmed
    assert(xt("  plain   text  ") === "plain text")
    // the registered report: ratio is exact integer ppm and the
    // extracted text is never longer than the markup
    val rep = TextAnalysis.htmlExtract(spark, sf).collect()
    assert(rep.nonEmpty)
    assert(rep.forall { r =>
      val (h, t, p) = (r.getAs[Long]("html_chars"),
        r.getAs[Long]("text_chars"), r.getAs[Long]("ratio_ppm"))
      t <= h && p === t * 1000000L / h
    })
  }
}
