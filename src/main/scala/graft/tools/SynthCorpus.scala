package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic on-the-fly generator for LARGER documents/embeddings
  * corpora with the same shape as the driver's `/root/testdata` tables
  * (same schemas, same 31-word vocabulary, same unit-norm 64-dim
  * embedding layout, planted near-duplicate structure) — the extra
  * scale points the VERDICT r5 #5 scaling curve needs without shipping
  * fixtures. Everything derives from SplitMix64 mixes of (seed, id,
  * position): no RNG state, so any row regenerates identically on any
  * executor, any partitioning, any run.
  */
object SynthCorpus {

  /** SplitMix64 finalizer (public-domain mixing constants) — the same
    * per-key hash the LSH hyperplane pool uses. */
  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def mix2(a: Long, b: Long): Long = mix(mix(a) ^ b)
  /** Uniform double in [0, 1). */
  private def u01(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  /** The test corpus' own 31-word vocabulary (sorted; extracted from
    * the sf0.01 documents table). */
  private val Vocab: IndexedSeq[String] = IndexedSeq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")
  private val Langs = IndexedSeq("en", "en", "en", "zh", "es", "de", "fr")

  // ------------------------------------- planted LOW-DF shingle groups
  // (VERDICT r6 #1): with a 31-word global vocabulary, every global
  // 3-gram's doc frequency outgrows the registered df≤6 Jaccard cap as
  // the corpus grows — exactly the "common boilerplate is excluded"
  // behavior the cap exists for, but it left dd_jaccard_pairs and
  // dd_clusters with EMPTY output above sf0.01. Real corpora also carry
  // RARE distinctive runs (a license header, a template, a lifted
  // paragraph) shared by a handful of documents — df under any sane cap
  // at any corpus size. We plant those: every `PlantStride`-th block of
  // 8 consecutive ids hosts a group of 2–6 documents whose words come
  // from a GROUP-UNIQUE token set (`g<gid>w<k>`), member texts differing
  // by an every-11th-word rewrite (Jaccard ≈ 0.5–0.9, never exact). No
  // other document can emit a shingle containing a group token, so every
  // planted shingle has df ≤ group size ≤ 6 — under the cap at ANY
  // scale, by construction.
  private val PlantStride = 125L // 1 planted block per 1000 ids
  private def groupHash(seed: Long, gid: Long): Long =
    mix2(seed ^ 0x51edb15fL, gid)
  private def groupSize(gh: Long): Int = 2 + ((gh >>> 5) % 5).toInt

  /** The planted low-df groups for a corpus of `n` docs: member doc ids
    * per group, mirroring [[documents]]' generation rule exactly —
    * DedupSpec asserts every intra-group pair is recovered by the
    * CAPPED registered Jaccard path and resolved into one cluster. */
  def plantedJaccardGroups(n: Long, seed: Long = 42L): Seq[Seq[Long]] =
    (0L until (n + 7) / 8 by PlantStride).map { gid =>
      val size = groupSize(groupHash(seed, gid))
      (gid * 8 until math.min(gid * 8 + size, n)).toSeq
    }.filter(_.length >= 2)

  /** `n` documents (doc_id, text, lang, source, n_chars). ~2% of docs
    * are EXACT duplicates of an earlier doc and ~4% are near-duplicates
    * (the earlier doc's words with every 11th word rewritten), so the
    * dedup family has planted structure at every scale; ~0.4% sit in
    * planted LOW-DF rare-shingle groups (above) so the df-capped
    * Jaccard family is non-vacuous at every scale; the rest draw
    * 30–110 words independently — with a 31-word vocabulary, organic
    * shingle overlap mirrors the real corpus' near-dup density. */
  def documents(spark: SparkSession, n: Long, seed: Long = 42L,
                sources: Int = 20): DataFrame = {
    import spark.implicits._
    spark.range(n).map { boxed =>
      val id: Long = boxed
      val h = mix2(seed, id)
      val gid = id / 8
      val gh = groupHash(seed, gid)
      val text =
        if (gid % PlantStride == 0 && (id % 8) < groupSize(gh)) {
          // planted rare-shingle group member: every token group-unique
          val member = (id % 8).toInt
          val nWords = 30 + ((gh >>> 20) % 81).toInt
          val words = Array.tabulate(nWords) { w =>
            s"g${gid}w${((mix2(gh, w) >>> 7) & 0x7fffffff).toInt % 31}"
          }
          if (member > 0) // members differ, but stay near-dups
            for (w <- words.indices by 11)
              words(w) =
                s"g${gid}w${(mix2(mix2(gh, 1000L + member), w) & 0x7fffffff).toInt % 31}"
          words.mkString(" ")
        } else {
          val kind = (h & 0xffffL) % 50 // 0 exact-dup, 1..2 near-dup, else fresh
          val baseId =
            if (id >= 50 && kind <= 2) {
              // an earlier doc — but never a planted-block member: its
              // text is group-unique, so a Vocab-built "dup" of it would
              // duplicate nothing and dilute the planted dup densities
              var b = id - 1 - ((h >>> 16) & 0x1f)
              while ((b / 8) % PlantStride == 0 &&
                (b % 8) < groupSize(groupHash(seed, b / 8))) b -= 1
              b
            } else id
          val bh = mix2(seed, baseId)
          val nWords = 30 + ((bh >>> 20) % 81).toInt
          val words = Array.tabulate(nWords) { w =>
            Vocab(((mix2(bh, w) >>> 7) & 0x7fffffff).toInt % Vocab.length)
          }
          if (id != baseId && kind > 0) // near-dup: rewrite every 11th word
            for (w <- words.indices by 11)
              words(w) = Vocab((mix2(h, w) & 0x7fffffff).toInt % Vocab.length)
          words.mkString(" ")
        }
      (id, text, Langs(((h >>> 33) % Langs.length).toInt),
        s"src${((h >>> 40) % sources).toInt}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** `n` unit-norm 64-dim embeddings (vec_id, embedding, label). Base
    * vectors are iid uniform(-1,1) normalized (the real corpus' weak
    * structure — random unit vectors, |cos| ~ 1/8); ~4% are TWINS of an
    * earlier vector (small jitter, cos ≈ 0.995) so the embedding
    * near-dup family has planted pairs at every scale. */
  def embeddings(spark: SparkSession, n: Long, seed: Long = 43L,
                 dims: Int = 64, labels: Int = 10): DataFrame = {
    import spark.implicits._
    spark.range(n).map { boxed =>
      val id: Long = boxed
      val h = mix2(seed, id)
      val twin = id >= 25 && (h & 0xffL) % 25 == 0
      val baseId = if (twin) id - 1 - ((h >>> 8) & 0xf) else id
      val bh = mix2(seed, baseId)
      val raw = Array.tabulate(dims) { d =>
        val base = u01(mix2(bh, d)) * 2.0 - 1.0
        if (twin) base + (u01(mix2(h, d + dims)) - 0.5) * 0.02 else base
      }
      val norm = math.sqrt(raw.map(x => x * x).sum)
      val vec = raw.map(x => (x / norm).toFloat)
      (id, vec, ((mix2(bh, 7777) >>> 17) % labels).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  /** `n` unit-norm embeddings with PLANTED CLUSTER structure (VERDICT
    * r9 #2): `nClusters` deterministic unit centers; vector i =
    * normalize(center(i % nClusters) + uniform(±noise/2) per dim).
    * Pure function of (seed, id) like everything here. At noise = 0.3
    * the within-cluster cosine sits near 0.68 and the cross-cluster
    * cosine near |0.08| — true neighbors CONCENTRATE in the query's
    * cluster, so ANN recall is governed by probe TARGETING instead of
    * the scanned fraction (the structure-free [[embeddings]] corpus,
    * where recall ≈ fraction by construction, can neither justify nor
    * refute sub-fraction probe defaults — this corpus can). */
  def clusteredEmbeddings(spark: SparkSession, n: Long, seed: Long = 47L,
                          dims: Int = 64, nClusters: Int = 50,
                          noise: Double = 0.3): DataFrame = {
    import spark.implicits._
    spark.range(n).map { boxed =>
      val id: Long = boxed
      val c = (id % nClusters).toInt
      val ch = mix2(seed ^ 0x5eedc1a5L, c.toLong)
      val center = Array.tabulate(dims)(d => u01(mix2(ch, d)) * 2.0 - 1.0)
      val cn = math.sqrt(center.map(x => x * x).sum)
      val h = mix2(seed, id)
      val raw = Array.tabulate(dims)(d =>
        center(d) / cn + (u01(mix2(h, d)) - 0.5) * noise)
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (id, raw.map(x => (x / norm).toFloat), c % 10)
    }.toDF("vec_id", "embedding", "label")
  }

  /** Write both tables under `dir` in the testdata layout, returning
    * `dir` for use as a `queries(name)(spark, dir)` scale point. */
  def writeCorpus(spark: SparkSession, dir: String,
                  nDocs: Long, nVecs: Long): String = {
    documents(spark, nDocs).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    embeddings(spark, nVecs).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }
}
