package graft.llmdata

import org.apache.spark.sql.{functions, DataFrame, SparkSession}

/** Registry + DuckDB oracles for the LLM-data-pipeline operator
  * families (dedup / similarity / text analysis / multimodal).
  *
  * Hash-based operators (MinHash, SimHash, hyperplane LSH) use
  * xxhash64/SplitMix64 which DuckDB cannot reproduce — those entries are
  * rows-only in CORRECTNESS and are instead verified in ScalaTests
  * against their exact counterparts (DedupSpec / SimilaritySpec), which
  * ARE oracle-checked here.
  *
  * DuckDB type note: SUM(BIGINT) yields HUGEINT (→ float64 in pandas),
  * so every integer SUM is CAST(... AS BIGINT) to hash-match Spark's
  * LongType.
  */
object LlmQueries {

  /** DuckDB mirror of [[Dedup.shingles]] (word 3-grams, 1-based list
    * indexing on the DuckDB side). */
  private val shingleCte: String =
    """sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) >= 3 THEN
      |      list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] ||
      |             ' ' || string_split(text, ' ')[i+2]))
      |    ELSE []::VARCHAR[] END AS sh
      |  FROM documents)""".stripMargin

  /** Calibration-histogram mirror of [[Dedup.simCalibration]]: same
    * deterministic sample, round-6 cosine, `::DOUBLE` bin math (a bare
    * 0.05 is DECIMAL in DuckDB). */
  val ddSimCalibrationSql: String =
    """WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |           WHERE vec_id % 10 = 0),
      |p AS (SELECT round(list_cosine_similarity(a.v, b.v), 6) AS sim
      |      FROM s a JOIN s b ON a.vec_id < b.vec_id),
      |h AS (SELECT CAST(floor(sim / 0.05::DOUBLE) AS BIGINT) AS bin,
      |        COUNT(*) AS n FROM p WHERE NOT isnan(sim) GROUP BY 1)
      |SELECT bin * 0.05::DOUBLE AS bin_lo, n FROM h ORDER BY bin_lo""".stripMargin

  val ddExactSql: String =
    """SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin

  /** Document-frequency cap for the REGISTERED jaccard query: a shingle
    * appearing in more than this many documents is dropped before pair
    * generation (VERDICT r03 #1 — a viral shingle otherwise makes one
    * task emit d(d-1)/2 pairs). 6 binds on this corpus already at
    * sf0.01 (max df there is 7) so the capped path is exercised
    * end-to-end by the oracle gate, while per-doc set sizes stay
    * uncapped — capping can only shrink the estimated Jaccard. */
  val JaccardDocFreqCap: Long = 6L

  val ddJaccardSql: String =
    s"""WITH $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= $JaccardDocFreqCap),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  inter::DOUBLE / (x.nsh + y.nsh - inter) AS jaccard
      |FROM p JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.2
      |ORDER BY jaccard DESC, id_a, id_b""".stripMargin

  /** Mirror of [[Dedup.minhashNearDup]] (r15, VERDICT r14 #4): the
    * SAME md5-hex minhash family (`min(md5("<j>:" || g)[1..15])` per
    * hash j), the same 16×2 banding by per-band min concatenation,
    * banded candidates, exact-Jaccard verification — the whole LSH
    * operator restated, not a looser exact-join stand-in. */
  val ddMinhashSql: String =
    s"""WITH $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |mh AS (SELECT doc_id, j,
      |         MIN(substr(md5(CAST(j AS VARCHAR) || ':' || g), 1, 15)) AS m
      |       FROM s, (SELECT unnest(range(0, 32)) AS j) js
      |       GROUP BY doc_id, j),
      |bands AS (SELECT doc_id, j // 2 AS band,
      |            string_agg(m, '|' ORDER BY j) AS sig
      |          FROM mh GROUP BY doc_id, j // 2),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |         FROM bands a JOIN bands b
      |           ON a.band = b.band AND a.sig = b.sig
      |              AND a.doc_id < b.doc_id),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT c.id_a, c.id_b, COUNT(*) AS inter
      |      FROM cand c
      |      JOIN s x ON x.doc_id = c.id_a
      |      JOIN s y ON y.doc_id = c.id_b AND y.g = x.g
      |      GROUP BY c.id_a, c.id_b)
      |SELECT id_a, id_b,
      |  inter::DOUBLE / (x.nsh + y.nsh - inter) AS jaccard
      |FROM p JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.5
      |ORDER BY jaccard DESC, id_a, id_b""".stripMargin

  /** 15-hex-digit → 60-bit integer, positional strpos arithmetic over
    * a column named `h` — the DuckDB twin of Spark's
    * `conv(substr(md5, 1, 15), 16, 10)`. */
  private val hexVal15: String = (1 to 15).map { k =>
    val w = java.math.BigInteger.valueOf(16L).pow(15 - k)
    s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1) * $w"
  }.mkString(" + ")

  /** Mirror of [[Dedup.simhashNearDup]] (r15, VERDICT r14 #4): the
    * same 60-bit md5-derived per-token hash, ±1 bit sums, sign
    * signature — then ALL-pairs Hamming ≤ 6, which equals the engine's
    * banded join exactly (the 8×8-bit pigeonhole layout GUARANTEES
    * every pair at distance ≤ 7 agrees on some band, so banding loses
    * nothing at maxDist 6 — the DedupSpec exhaustiveness sweep). */
  val ddSimhashSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |             FROM documents),
      |th AS (SELECT doc_id, $hexVal15 AS hv
      |       FROM (SELECT doc_id, md5(t) AS h FROM tok)),
      |bits AS (SELECT doc_id, j,
      |           SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
      |         FROM th, (SELECT unnest(range(0, 60)) AS j) js
      |         GROUP BY doc_id, j),
      |sig AS (SELECT doc_id,
      |          CAST(SUM(CASE WHEN sgn >= 0
      |            THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS sh
      |        FROM bits GROUP BY doc_id)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 6
      |ORDER BY hamming, id_a, id_b""".stripMargin

  /** Mirror of [[graft.llmdata.TextAnalysis.rollingOverlapPairs]] (r15,
    * VERDICT r14 #4): the same md5 4-token-window fingerprints (the
    * contamination oracle's window identity), distinct per doc,
    * inverted-index pair counts at minShared = 3. */
  val txtRollingOverlapSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
      |             FROM documents),
      |wd AS (SELECT DISTINCT doc_id,
      |         md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) AS w
      |       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i
      |             FROM tok)),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |        COUNT(*) AS shared_windows
      |      FROM wd a JOIN wd b ON a.w = b.w AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT id_a, id_b, shared_windows FROM p
      |WHERE shared_windows >= 3
      |ORDER BY shared_windows DESC, id_a, id_b""".stripMargin

  /** Mirror of [[Dedup.containmentPairs]]: identical postings/cap CTEs
    * as [[ddJaccardSql]], coefficients = |∩|/|S(side)| with UNCAPPED
    * per-doc sizes (conservative under the cap, like the Jaccard
    * denominator). */
  val ddContainmentSql: String =
    s"""WITH $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= $JaccardDocFreqCap),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  inter::DOUBLE / x.nsh AS cont_a,
      |  inter::DOUBLE / y.nsh AS cont_b
      |FROM p JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |WHERE greatest(inter::DOUBLE / x.nsh, inter::DOUBLE / y.nsh) >= 0.6
      |ORDER BY greatest(cont_a, cont_b) DESC, id_a, id_b""".stripMargin

  /** Connected components over the same capped-Jaccard pair graph as
    * [[ddJaccardSql]], as a recursive reachability fixpoint: seed every
    * node with itself, propagate labels along (symmetrized) edges until
    * closure, take the MIN reachable id per node — exactly the fixpoint
    * [[Dedup.connectedComponents]] converges to. The recursive UNION
    * dedups rows, so cycles terminate; closure size is bounded by
    * Σ component², fine at oracle scale. */
  val ddClustersSql: String =
    s"""WITH RECURSIVE $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= $JaccardDocFreqCap),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |  WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.2),
      |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |      UNION ALL SELECT id_b, id_a FROM pairs),
      |r(id, label) AS (
      |  SELECT DISTINCT src, src FROM e
      |  UNION
      |  SELECT e.dst, r.label FROM r JOIN e ON e.src = r.id),
      |lab AS (SELECT id, MIN(label) AS cluster_id FROM r GROUP BY id),
      |cs AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
      |SELECT lab.id AS doc_id, lab.cluster_id, cs.cluster_size,
      |  (lab.id = lab.cluster_id) AS keep
      |FROM lab JOIN cs USING (cluster_id)
      |ORDER BY cluster_id, doc_id""".stripMargin

  /** Corpus-dedup accounting: exact drops (non-min doc per md5) +
    * near-dup cluster non-canonicals (same recursive fixpoint as
    * [[ddClustersSql]]), attributed exact-first, rolled up per source. */
  val ddCorpusDedupSql: String =
    s"""WITH RECURSIVE $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= $JaccardDocFreqCap),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |  WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.2),
      |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |      UNION ALL SELECT id_b, id_a FROM pairs),
      |r(id, label) AS (
      |  SELECT DISTINCT src, src FROM e
      |  UNION
      |  SELECT e.dst, r.label FROM r JOIN e ON e.src = r.id),
      |nd AS (SELECT id AS doc_id FROM r GROUP BY id HAVING id <> MIN(label)),
      |ex AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS min_id
      |       FROM documents),
      |d AS (SELECT doc.doc_id, doc.source,
      |        len(string_split(doc.text, ' ')) AS n_tokens,
      |        (doc.doc_id <> ex.min_id) AS exact_drop,
      |        (nd.doc_id IS NOT NULL) AS is_nd
      |      FROM documents doc JOIN ex USING (doc_id) LEFT JOIN nd USING (doc_id))
      |SELECT source, COUNT(*) AS n_raw,
      |  CAST(SUM(CASE WHEN NOT exact_drop AND NOT is_nd THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN exact_drop THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_exact,
      |  CAST(SUM(CASE WHEN NOT exact_drop AND is_nd THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_neardup,
      |  CAST(SUM(CASE WHEN NOT exact_drop AND NOT is_nd THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Mirror of [[Dedup.urlDedupCorpus]]: the crawl-url generator and
    * the FULL canonicalization chain (same regexes and CASE structure
    * as [[urlCanonCte]]'s canon), the url-first fate attribution, and
    * the same recursive near-dup fixpoint as [[ddCorpusDedupSql]]. */
  val ddUrlDedupSql: String =
    s"""WITH RECURSIVE $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= $JaccardDocFreqCap),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |  WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.2),
      |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |      UNION ALL SELECT id_b, id_a FROM pairs),
      |r(id, label) AS (
      |  SELECT DISTINCT src, src FROM e
      |  UNION
      |  SELECT e.dst, r.label FROM r JOIN e ON e.src = r.id),
      |nd AS (SELECT id AS doc_id FROM r GROUP BY id HAVING id <> MIN(label)),
      |cu0 AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0
      |          THEN (CASE WHEN doc_id % 4 = 0 THEN 'HTTP' ELSE 'http' END)
      |          ELSE (CASE WHEN doc_id % 4 = 1 THEN 'HTTPS' ELSE 'https' END) END)
      |    || '://WWW.'
      |    || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
      |    || '.CoM'
      |    || (CASE WHEN doc_id % 8 < 2
      |          THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
      |          ELSE '' END)
      |    || '/p/' || substr(md5(CAST(doc_id AS VARCHAR) || ':url'), 1, 1)
      |    || (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS url
      |  FROM documents),
      |cp AS (
      |  SELECT doc_id, trim(url) AS turl,
      |    lower(regexp_extract(trim(url),
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)', 1)) AS scheme,
      |    regexp_extract(trim(url),
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)', 2) AS auth,
      |    regexp_extract(trim(url),
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)', 3) AS path,
      |    regexp_extract(trim(url),
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)', 4) AS query
      |  FROM cu0),
      |cc AS (
      |  SELECT doc_id,
      |    CASE WHEN scheme = '' THEN turl ELSE
      |      scheme || '://' ||
      |      (CASE WHEN contains(auth, '@') OR starts_with(auth, '[') THEN auth ELSE
      |        lower(regexp_extract(auth, '^([^:]*)', 1)) ||
      |        (CASE WHEN regexp_extract(auth, ':([0-9]+)${"$"}', 1) = ''
      |               OR (scheme = 'http' AND regexp_extract(auth, ':([0-9]+)${"$"}', 1) = '80')
      |               OR (scheme = 'https' AND regexp_extract(auth, ':([0-9]+)${"$"}', 1) = '443')
      |              THEN '' ELSE ':' || regexp_extract(auth, ':([0-9]+)${"$"}', 1) END)
      |       END) ||
      |      (CASE WHEN path = '' THEN '/' ELSE path END) ||
      |      (CASE WHEN query = '' THEN ''
      |            ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&') END)
      |    END AS cu
      |  FROM cp),
      |um AS (SELECT cu, MIN(doc_id) AS url_min FROM cc GROUP BY cu),
      |ex AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS min_id
      |       FROM documents),
      |d AS (SELECT doc.doc_id, doc.source,
      |        len(string_split(doc.text, ' ')) AS n_tokens,
      |        (doc.doc_id <> um.url_min) AS url_drop,
      |        (doc.doc_id <> ex.min_id) AS exact_d,
      |        (nd.doc_id IS NOT NULL) AS is_nd
      |      FROM documents doc
      |      JOIN cc ON doc.doc_id = cc.doc_id
      |      JOIN um USING (cu)
      |      JOIN ex ON doc.doc_id = ex.doc_id
      |      LEFT JOIN nd ON doc.doc_id = nd.doc_id)
      |SELECT source, COUNT(*) AS n_raw,
      |  CAST(SUM(CASE WHEN NOT url_drop AND NOT exact_d AND NOT is_nd THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN url_drop THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_url,
      |  CAST(SUM(CASE WHEN NOT url_drop AND exact_d THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_exact,
      |  CAST(SUM(CASE WHEN NOT url_drop AND NOT exact_d AND is_nd THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_neardup,
      |  CAST(SUM(CASE WHEN NOT url_drop AND NOT exact_d AND NOT is_nd THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Mirror of [[TextAnalysis.stratifiedSample]]'s per-source md5 hex
    * cuts: src0 0.5→'8000', src1 1.0→'g' (above every 4-hex string),
    * src2 0.25→'4000', default 0.1→'1999'. */
  val txtStratifiedSampleSql: String =
    """SELECT source, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN kept THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS tokens_sampled
      |FROM (SELECT source, text,
      |        substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 4) <
      |          CASE source WHEN 'src0' THEN '8000' WHEN 'src1' THEN 'g'
      |                      WHEN 'src2' THEN '4000' ELSE '1999' END AS kept
      |      FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  val txtRepetitionSql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg
      |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)),
      |pb AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |sc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
      |         COUNT(*) AS n_distinct, MAX(c) AS top_c
      |       FROM pb GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(sc.n_bigrams, 0) AS n_bigrams,
      |  COALESCE(sc.n_distinct, 0) AS n_distinct,
      |  COALESCE(1 - sc.n_distinct::DOUBLE / sc.n_bigrams, 0.0) AS dup_ratio,
      |  COALESCE(sc.top_c::DOUBLE / sc.n_bigrams, 0.0) AS top_frac,
      |  COALESCE(1 - sc.n_distinct::DOUBLE / sc.n_bigrams > 0.2
      |           OR sc.top_c::DOUBLE / sc.n_bigrams > 0.18, TRUE) AS flagged
      |FROM documents d LEFT JOIN sc USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Delta dedup: incoming = doc_id % 5 = 4; exact via md5 against the
    * existing side's min-id table, near via the same capped-Jaccard
    * pairs restricted to incoming↔existing, exact-first precedence. */
  val ddDeltaSql: String =
    s"""WITH $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= $JaccardDocFreqCap),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |  WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.2),
      |exm AS (SELECT md5(text) AS h, MIN(doc_id) AS exact_match
      |        FROM documents WHERE doc_id % 5 <> 4 GROUP BY 1),
      |ndm AS (SELECT CASE WHEN id_a % 5 = 4 THEN id_a ELSE id_b END AS doc_id,
      |               MIN(CASE WHEN id_a % 5 = 4 THEN id_b ELSE id_a END) AS near_match
      |        FROM pairs WHERE (id_a % 5 = 4) <> (id_b % 5 = 4)
      |        GROUP BY 1)
      |SELECT d.doc_id,
      |  CASE WHEN exm.exact_match IS NOT NULL THEN 'exact_dup'
      |       WHEN ndm.near_match IS NOT NULL THEN 'near_dup'
      |       ELSE 'new' END AS status,
      |  COALESCE(exm.exact_match, ndm.near_match) AS match_id
      |FROM documents d
      |LEFT JOIN exm ON md5(d.text) = exm.h
      |LEFT JOIN ndm ON d.doc_id = ndm.doc_id
      |WHERE d.doc_id % 5 = 4
      |ORDER BY d.doc_id""".stripMargin

  /** Bloom-prefiltered delta mirror: the Bloom filter changes the
    * PLAN, never the answer (no false negatives + exact confirm join),
    * so the oracle is the plain content-hash left join. */
  val ddBloomDeltaSql: String =
    """WITH exm AS (SELECT md5(text) AS h, MIN(doc_id) AS match_id
      |             FROM documents WHERE doc_id % 5 <> 4 GROUP BY 1)
      |SELECT d.doc_id,
      |  CASE WHEN exm.match_id IS NOT NULL THEN 'exact_dup' ELSE 'new' END AS status,
      |  exm.match_id
      |FROM documents d
      |LEFT JOIN exm ON md5(d.text) = exm.h
      |WHERE d.doc_id % 5 = 4
      |ORDER BY d.doc_id""".stripMargin

  /** PageRank mirror of [[Dedup.pageRank]] — the micro-exact power
    * iteration UNROLLED as one CTE per round over the same
    * capped-Jaccard pair graph. Rank state is BIGINT micro-units; the
    * per-node contribution `FLOOR(0.85::DOUBLE * prm / deg + 0.5)` is
    * the identical double expression (literal + association) as the
    * Spark side — `::DOUBLE` matters: DuckDB's bare `0.85 * prm` is
    * DECIMAL arithmetic, which rounds differently from the JVM double —
    * so each round reproduces Spark's longs bit-for-bit and an
    * ITERATIVE graph computation becomes hash-oracle-able. */
  val ddPagerankSql: String = {
    val iter = (i: Int) =>
      s"""p$i AS (SELECT e.dst AS id,
         |  CAST(FLOOR(0.15::DOUBLE * 1000000.0 / nn.n + 0.5) AS BIGINT)
         |    + CAST(SUM(CAST(FLOOR(0.85::DOUBLE * p.prm / d.deg + 0.5) AS BIGINT)) AS BIGINT) AS prm
         |  FROM e JOIN p${i - 1} p ON e.src = p.id JOIN deg d ON e.src = d.src, nn
         |  GROUP BY e.dst, nn.n)""".stripMargin
    s"""WITH $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= $JaccardDocFreqCap),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |  WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.2),
      |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |      UNION ALL SELECT id_b, id_a FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
      |nn AS (SELECT COUNT(*) AS n FROM deg),
      |p0 AS (SELECT src AS id,
      |         CAST(FLOOR(1000000.0 / nn.n + 0.5) AS BIGINT) AS prm
      |       FROM deg, nn),
      |${iter(1)},
      |${iter(2)},
      |${iter(3)}
      |SELECT id AS doc_id, prm AS pr_micro, prm::DOUBLE / 1000000.0 AS pr
      |FROM p3 ORDER BY pr_micro DESC, doc_id""".stripMargin
  }

  /** Contamination mirror: identical md5 4-token windows + the
    * [[txtSplitAssignSql]] split hash, window df-cap (16, over the
    * train+test windows — same population the Spark side counts),
    * bipartite pair counting. */
  val txtContaminationSql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |w AS (SELECT DISTINCT doc_id,
      |        md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) AS w
      |      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i FROM tk)),
      |sp AS (SELECT doc_id,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cc' THEN 'train'
      |              WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6' THEN 'val'
      |              ELSE 'test' END AS split
      |       FROM documents),
      |wf AS (SELECT w.w FROM w JOIN sp USING (doc_id)
      |       WHERE sp.split <> 'val' GROUP BY w.w HAVING COUNT(*) <= 16)
      |SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
      |  COUNT(*) AS shared_windows
      |FROM w tr JOIN wf ON tr.w = wf.w
      |JOIN sp str ON tr.doc_id = str.doc_id AND str.split = 'train'
      |JOIN w te ON tr.w = te.w
      |JOIN sp ste ON te.doc_id = ste.doc_id AND ste.split = 'test'
      |GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |ORDER BY shared_windows DESC, train_id, test_id""".stripMargin

  /** Filtered vector search mirror: quality predicate (≥40 tokens on
    * the companion doc) pre-filters the corpus side, then brute-force
    * cosine rank — the one ANN variant DuckDB can reproduce with a
    * filter attached. */
  val annFilteredTopkSql: String =
    """WITH ok AS (SELECT doc_id FROM documents
      |            WHERE len(string_split(text, ' ')) >= 40),
      |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      |      FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT query_id, e.vec_id AS neighbor_id,
      |        round(list_cosine_similarity(qe, e.embedding::DOUBLE[]), 6) AS sim
      |      FROM q, embeddings e JOIN ok ON e.vec_id = ok.doc_id
      |      WHERE e.vec_id <> q.query_id),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
      |      FROM c)
      |SELECT query_id, neighbor_id, rnk, sim FROM r
      |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  /** BM25 mirror of [[TextAnalysis.bm25TopK]]: identical expression
    * tree (same literals, same left-to-right association — `2.2` and
    * `0.25` are pre-folded on BOTH sides because `1.2 + 1` rounds to a
    * different double than the literal `2.2`), identical micro-unit
    * quantization `floor(x·1e6 + 0.5)` so per-doc sums are exact-long
    * and order-free. */
  val txtBm25Sql: String =
    """WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      |st AS (SELECT COUNT(*)::DOUBLE AS n,
      |         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
      |       WHERE term IN ('vector', 'window', 'merge', 'spark') GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id)::DOUBLE AS df FROM tf GROUP BY 1),
      |m AS (SELECT tf.doc_id,
      |        CAST(floor(
      |          ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * (tf.tf * 2.2) /
      |            (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))
      |          * 1000000.0 + 0.5) AS BIGINT) AS micro
      |      FROM tf JOIN df ON tf.term = df.term
      |      JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st)
      |SELECT doc_id, n_terms, score_micro, score_micro / 1000000.0 AS score
      |FROM (SELECT doc_id, COUNT(*) AS n_terms,
      |        CAST(SUM(micro) AS BIGINT) AS score_micro
      |      FROM m GROUP BY doc_id)
      |ORDER BY score_micro DESC, doc_id LIMIT 15""".stripMargin

  /** TF-IDF mirror of [[TextAnalysis.tfidfTopTerms]] — same micro-unit
    * quantization and term-ASC tie-break; df counts rows of the
    * already-(doc,term)-distinct tf table in both engines. */
  val txtTfidfSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
      |s AS (SELECT doc_id, tf.term AS term, tf,
      |        CAST(floor(tf * ln(n_docs / df) * 1000000.0 + 0.5) AS BIGINT)
      |          AS score_micro
      |      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY doc_id ORDER BY score_micro DESC, term) AS rnk
      |      FROM s)
      |SELECT doc_id, rnk, term, tf, score_micro,
      |  score_micro / 1000000.0 AS score
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  /** Unigram-logprob mirror of [[TextAnalysis.unigramLogprob]] — same
    * micro-unit quantization, exact-long per-doc sums. */
  val txtUnigramLogprobSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM tok),
      |freq AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
      |m AS (SELECT doc_id,
      |        CAST(floor(ln(cnt / tot) * 1000000.0 + 0.5) AS BIGINT) AS micro
      |      FROM tok JOIN freq USING (term) CROSS JOIN tot)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_logprob
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Mirror of [[Ingest.ingestLmGate]] — the base LM (corpus MINUS
    * the doc_id % 10 == 7 shard) recomputed from the raw tables, the
    * identical OOV floor (COALESCE(cnt, 1)), per-token micro
    * quantization, and the same threshold order — a hash match proves
    * the persisted-artifact-served gate ≡ batch curation semantics. */
  /** Mirror of [[Ingest.ingestQualityGate]] (r15, VERDICT r14 #6):
    * DuckDB RE-TRAINS the classifier from the raw tables — the base
    * split's hashed-unigram counts per class under the same
    * GoldSources contrast, the same +1-smoothed micro-quantized
    * log-odds — and re-scores the shard, so a hash match proves the
    * artifact-served scores ≡ from-scratch training end-to-end. */
  val ingestQualityGateSql: String = {
    val gold = QualityStore.GoldSources
      .map(s => s"'$s'").mkString("(", ", ", ")")
    val b = QualityStore.Buckets
    s"""WITH btok AS (SELECT pos, substr(md5(t), 1, 3) AS qb FROM
      |  (SELECT source IN $gold AS pos,
      |     unnest(string_split(text, ' ')) AS t
      |   FROM documents WHERE doc_id % 10 <> 7)),
      |cnts AS (SELECT qb,
      |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS c_pos,
      |    CAST(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS c_neg
      |  FROM btok GROUP BY qb),
      |tots AS (SELECT CAST(SUM(c_pos) AS BIGINT) AS tp,
      |    CAST(SUM(c_neg) AS BIGINT) AS tn FROM cnts),
      |w AS (SELECT qb,
      |    CAST(floor((ln((c_pos + 1)::DOUBLE / (tp + $b)) -
      |                ln((c_neg + 1)::DOUBLE / (tn + $b))) * 1000000.0
      |      + 0.5) AS BIGINT) AS w_micro
      |  FROM cnts, tots),
      |oov AS (SELECT CAST(floor((ln(1.0 / (tp + $b)) -
      |    ln(1.0 / (tn + $b))) * 1000000.0 + 0.5) AS BIGINT) AS w0
      |  FROM tots),
      |stok AS (SELECT doc_id, substr(md5(t), 1, 3) AS qb FROM
      |  (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |   FROM documents WHERE doc_id % 10 = 7)),
      |sc AS (SELECT s.doc_id, COALESCE(w.w_micro, oov.w0) AS m
      |  FROM stok s LEFT JOIN w ON s.qb = w.qb CROSS JOIN oov)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(m) AS BIGINT) AS micro_sum,
      |  CASE WHEN CAST(SUM(m) AS DOUBLE) / 1000000.0 / COUNT(*) >= 0.0
      |       THEN 'gold_like' ELSE 'junk_like' END AS verdict
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Mirror of [[LangIdStore.langIdTrained]] (r15, VERDICT r14 #8):
    * DuckDB RE-TRAINS the per-language hashed char-trigram profiles
    * from the raw tables (same deterministic train split, same md5
    * buckets, same micro-quantized smoothed log-probs and priors) and
    * re-runs the argmax with the same lang-ascending tie-break. */
  val txtLangIdTrainedSql: String = {
    val b = LangIdStore.Buckets
    s"""WITH tr AS (SELECT lang, text FROM documents
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cc'
      |    AND len(text) >= 3),
      |ttok AS (SELECT lang, substr(md5(substr(text, i, 3)), 1, 3) AS qb
      |  FROM (SELECT lang, text, unnest(range(1, len(text) - 1)) AS i
      |        FROM tr)),
      |cnts AS (SELECT lang, qb, COUNT(*) AS c FROM ttok GROUP BY 1, 2),
      |tots AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM cnts
      |         GROUP BY 1),
      |docsn AS (SELECT lang, COUNT(*) AS nd FROM tr GROUP BY 1),
      |alln AS (SELECT CAST(SUM(nd) AS BIGINT) AS n FROM docsn),
      |langs AS (SELECT t.lang, t.tot,
      |    CAST(floor(ln(1.0 / (t.tot + $b)) * 1000000.0 + 0.5)
      |      AS BIGINT) AS oov,
      |    CAST(floor(ln(d.nd::DOUBLE / a.n) * 1000000.0 + 0.5)
      |      AS BIGINT) AS prior
      |  FROM tots t JOIN docsn d ON t.lang = d.lang CROSS JOIN alln a),
      |w AS (SELECT c.lang, c.qb,
      |    CAST(floor(ln((c.c + 1)::DOUBLE / (t.tot + $b)) * 1000000.0
      |      + 0.5) AS BIGINT) AS wm
      |  FROM cnts c JOIN tots t ON c.lang = t.lang),
      |stok AS (SELECT doc_id, substr(md5(substr(text, i, 3)), 1, 3) AS qb
      |  FROM (SELECT doc_id, text, unnest(range(1, len(text) - 1)) AS i
      |        FROM documents WHERE len(text) >= 3)),
      |sc AS (SELECT s.doc_id, l.lang,
      |    l.prior + CAST(SUM(COALESCE(w.wm, l.oov)) AS BIGINT) AS m
      |  FROM stok s CROSS JOIN langs l
      |  LEFT JOIN w ON w.lang = l.lang AND w.qb = s.qb
      |  GROUP BY s.doc_id, l.lang, l.prior)
      |SELECT doc_id, lang AS lang_pred, m AS score_micro
      |FROM (SELECT doc_id, lang, m,
      |        ROW_NUMBER() OVER (PARTITION BY doc_id
      |          ORDER BY m DESC, lang ASC) AS rn
      |      FROM sc)
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  val ingestLmGateSql: String =
    s"""WITH btok AS (SELECT unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE doc_id % 10 <> 7),
      |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM btok),
      |freq AS (SELECT term, COUNT(*) AS cnt FROM btok GROUP BY term),
      |stok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE doc_id % 10 = 7),
      |m AS (SELECT doc_id,
      |        CAST(floor(ln(COALESCE(cnt, 1)::DOUBLE / tot) * 1000000.0 + 0.5)
      |          AS BIGINT) AS micro
      |      FROM stok LEFT JOIN freq USING (term) CROSS JOIN tot),
      |agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
      |          CAST(SUM(micro) AS BIGINT) AS micro_sum
      |        FROM m GROUP BY doc_id),
      |sig AS (SELECT doc_id,
      |          len(string_split(text, ' ')) AS n_tok,
      |          len(list_distinct(string_split(text, ' ')))::DOUBLE
      |            / len(string_split(text, ' ')) AS ttr
      |        FROM documents WHERE doc_id % 10 = 7)
      |SELECT agg.doc_id, agg.n_tokens, agg.micro_sum,
      |  CASE WHEN sig.n_tok < ${Ingest.MinTokens} THEN 'too_short'
      |       WHEN sig.ttr < ${Ingest.MinTypeTokenRatio} THEN 'low_diversity'
      |       WHEN CAST(agg.micro_sum AS DOUBLE) / 1000000.0 / agg.n_tokens
      |            < ${Ingest.LmMinAvgLogprob} THEN 'rare_tokens'
      |       ELSE 'kept' END AS verdict
      |FROM agg JOIN sig USING (doc_id) ORDER BY agg.doc_id""".stripMargin

  /** [[ingestLmGateSql]] with the VOCABULARY CAP (r14, VERDICT r13
    * #6): the freq CTE keeps only the top-[[Ingest.LmVocabCapK]]
    * terms at the SAME deterministic (cnt desc, term asc) boundary
    * the Spark writer cuts ([[LmStore.write]]'s `keepTopK`); the
    * total stays the FULL token count, so capped-out terms hit the
    * OOV floor without inflating the kept terms' probabilities. */
  val ingestLmGateCappedSql: String =
    s"""WITH btok AS (SELECT unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE doc_id % 10 <> 7),
      |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM btok),
      |freq AS (SELECT term, COUNT(*) AS cnt FROM btok GROUP BY term
      |         ORDER BY cnt DESC, term ASC LIMIT ${Ingest.LmVocabCapK}),
      |stok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE doc_id % 10 = 7),
      |m AS (SELECT doc_id,
      |        CAST(floor(ln(COALESCE(cnt, 1)::DOUBLE / tot) * 1000000.0 + 0.5)
      |          AS BIGINT) AS micro
      |      FROM stok LEFT JOIN freq USING (term) CROSS JOIN tot),
      |agg AS (SELECT doc_id, COUNT(*) AS n_tokens,
      |          CAST(SUM(micro) AS BIGINT) AS micro_sum
      |        FROM m GROUP BY doc_id),
      |sig AS (SELECT doc_id,
      |          len(string_split(text, ' ')) AS n_tok,
      |          len(list_distinct(string_split(text, ' ')))::DOUBLE
      |            / len(string_split(text, ' ')) AS ttr
      |        FROM documents WHERE doc_id % 10 = 7)
      |SELECT agg.doc_id, agg.n_tokens, agg.micro_sum,
      |  CASE WHEN sig.n_tok < ${Ingest.MinTokens} THEN 'too_short'
      |       WHEN sig.ttr < ${Ingest.MinTypeTokenRatio} THEN 'low_diversity'
      |       WHEN CAST(agg.micro_sum AS DOUBLE) / 1000000.0 / agg.n_tokens
      |            < ${Ingest.LmMinAvgLogprob} THEN 'rare_tokens'
      |       ELSE 'kept' END AS verdict
      |FROM agg JOIN sig USING (doc_id) ORDER BY agg.doc_id""".stripMargin

  /** Mirror of [[TextAnalysis.dsirWeights]]: identical md5 bucket hash,
    * add-one smoothing, and per-ln micro-quantization. */
  val txtDsirWeightsSql: String =
    """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |tokb AS (SELECT doc_id, lang, substr(md5(term), 1, 2) AS b FROM tok),
      |corpus AS (SELECT b, COUNT(*) AS cnt_c FROM tokb GROUP BY b),
      |target AS (SELECT b, COUNT(*) AS cnt_t FROM tokb WHERE lang = 'en' GROUP BY b),
      |tot AS (SELECT COUNT(*) AS tot_c,
      |               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tot_t FROM tokb),
      |m AS (SELECT doc_id,
      |        CAST(floor(ln((COALESCE(cnt_t, 0) + 1)::DOUBLE / (tot_t + 256)::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
      |      - CAST(floor(ln((cnt_c + 1)::DOUBLE / (tot_c + 256)::DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS micro
      |      FROM tokb JOIN corpus USING (b) LEFT JOIN target USING (b) CROSS JOIN tot)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS dsir_weight
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** End-to-end corpus-materialization mirror of
    * [[TextAnalysis.finalCorpus]] — the verbatim composition of the
    * already-verified component mirrors: curation verdicts
    * ([[txtCurationReportSql]]'s CTEs at doc grain), exact-dedup min-id
    * ([[ddCorpusDedupSql]]), the recursive cluster fixpoint
    * ([[ddClustersSql]]), and the contamination postings
    * ([[txtContaminationSql]]), stitched with the same quality → exact
    * → near-dup → contamination precedence. */
  val txtFinalCorpusSql: String =
    s"""WITH RECURSIVE $shingleCte,
      |tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |base AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
      |           len(list_distinct(string_split(text, ' ')))::DOUBLE
      |             / len(string_split(text, ' ')) AS ttr
      |         FROM documents),
      |bg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg
      |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)),
      |pb AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |rep AS (SELECT doc_id, COUNT(*) AS n_distinct,
      |          CAST(SUM(c) AS BIGINT) AS n_bigrams FROM pb GROUP BY doc_id),
      |rep2 AS (SELECT d.doc_id,
      |           COALESCE(1 - rep.n_distinct::DOUBLE / rep.n_bigrams, 0.0) AS dup_ratio
      |         FROM documents d LEFT JOIN rep USING (doc_id)),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM tok),
      |freq AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
      |mm AS (SELECT doc_id,
      |         CAST(floor(ln(cnt / tot) * 1000000.0 + 0.5) AS BIGINT) AS micro
      |       FROM tok JOIN freq USING (term) CROSS JOIN tot),
      |lp AS (SELECT doc_id,
      |         CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS alp
      |       FROM mm GROUP BY doc_id),
      |vd AS (SELECT b.doc_id, b.source, b.n_tok,
      |        CASE WHEN b.n_tok < 20 THEN 'too_short'
      |             WHEN r2.dup_ratio > 0.08 THEN 'repetitive'
      |             WHEN b.ttr < 0.30 THEN 'low_diversity'
      |             WHEN lp.alp < -3.43 THEN 'rare_tokens'
      |             ELSE 'kept' END AS verdict
      |      FROM base b JOIN rep2 r2 USING (doc_id) JOIN lp USING (doc_id)),
      |hh AS (SELECT doc_id, md5(text) AS h FROM documents),
      |exm AS (SELECT h, MIN(doc_id) AS min_id FROM hh GROUP BY h),
      |exd AS (SELECT hh.doc_id FROM hh JOIN exm USING (h)
      |        WHERE hh.doc_id <> exm.min_id),
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= $JaccardDocFreqCap),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |prs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |  WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.2),
      |e AS (SELECT id_a AS src, id_b AS dst FROM prs
      |      UNION ALL SELECT id_b, id_a FROM prs),
      |r(id, label) AS (
      |  SELECT DISTINCT src, src FROM e
      |  UNION
      |  SELECT e.dst, r.label FROM r JOIN e ON e.src = r.id),
      |lab AS (SELECT id, MIN(label) AS cluster_id FROM r GROUP BY id),
      |ndd AS (SELECT id AS doc_id FROM lab WHERE id <> cluster_id),
      |w AS (SELECT DISTINCT doc_id,
      |        md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) AS w
      |      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i FROM tk)),
      |sp AS (SELECT doc_id,
      |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cc' THEN 'train'
      |              WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6' THEN 'val'
      |              ELSE 'test' END AS split
      |       FROM documents),
      |wf AS (SELECT w.w FROM w JOIN sp USING (doc_id)
      |       WHERE sp.split <> 'val' GROUP BY w.w HAVING COUNT(*) <= 16),
      |ctp AS (SELECT tr.doc_id AS train_id, te.doc_id AS test_id
      |        FROM w tr JOIN wf ON tr.w = wf.w
      |        JOIN sp str ON tr.doc_id = str.doc_id AND str.split = 'train'
      |        JOIN w te ON tr.w = te.w
      |        JOIN sp ste ON te.doc_id = ste.doc_id AND ste.split = 'test'
      |        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |ctr AS (SELECT DISTINCT train_id AS doc_id FROM ctp),
      |fin AS (SELECT vd.source, vd.n_tok,
      |          CASE WHEN exd.doc_id IS NOT NULL THEN 'exact_dup'
      |               WHEN ndd.doc_id IS NOT NULL THEN 'near_dup'
      |               WHEN vd.verdict <> 'kept' THEN 'filtered_' || vd.verdict
      |               WHEN ctr.doc_id IS NOT NULL THEN 'contaminated'
      |               ELSE 'kept' END AS status
      |        FROM vd LEFT JOIN exd USING (doc_id)
      |        LEFT JOIN ndd USING (doc_id)
      |        LEFT JOIN ctr USING (doc_id))
      |SELECT source, status, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN status = 'kept' THEN n_tok ELSE 0 END) AS BIGINT)
      |    AS tokens_kept
      |FROM fin GROUP BY 1, 2 ORDER BY source, status""".stripMargin

  /** Weighted-sample mirror of [[TextAnalysis.weightedSample]] —
    * identical salted-md5 uniform (positional strpos arithmetic),
    * ln(u)/w key, nano-unit quantization, doc_id tie-break. */
  val txtWeightedSampleSql: String =
    """WITH d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS w,
      |             substr(md5(CAST(doc_id AS VARCHAR) || ':wsample'), 1, 4) AS h4
      |           FROM documents),
      |v AS (SELECT doc_id, source, w,
      |        (strpos('0123456789abcdef', substr(h4, 1, 1)) - 1) * 4096
      |      + (strpos('0123456789abcdef', substr(h4, 2, 1)) - 1) * 256
      |      + (strpos('0123456789abcdef', substr(h4, 3, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(h4, 4, 1)) - 1) AS hv
      |      FROM d WHERE w > 0),
      |s AS (SELECT doc_id, source, w AS n_tokens,
      |        CAST(floor(ln((hv + 0.5) / 65536.0) / w * 1000000000.0 + 0.5)
      |          AS BIGINT) AS keyq
      |      FROM v)
      |SELECT doc_id, source, n_tokens, keyq, keyq / 1000000000.0 AS key
      |FROM s ORDER BY keyq DESC, doc_id LIMIT 100""".stripMargin

  /** Bigram-LM mirror of [[TextAnalysis.bigramLogprob]] — identical
    * λ-interpolation literals, association order, and micro-unit
    * quantization; bigrams enumerated positionally (`t[i], t[i+1]`)
    * exactly as the per-doc `lead` window produces them. */
  val txtBigramLogprobSql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tok AS (SELECT doc_id, unnest(t) AS term FROM tk),
      |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM tok),
      |uni AS (SELECT term, COUNT(*) AS cu FROM tok GROUP BY 1),
      |bg AS (SELECT doc_id, t[i] AS w0, t[i + 1] AS w1
      |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)),
      |bgc AS (SELECT w0, w1, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
      |ctx AS (SELECT w0, SUM(cb) AS cc FROM bgc GROUP BY 1),
      |m AS (SELECT doc_id,
      |        CAST(floor(ln(0.75 * (cb::DOUBLE / cc::DOUBLE)
      |          + 0.25 * (cu::DOUBLE / tot)) * 1000000.0 + 0.5) AS BIGINT)
      |          AS micro
      |      FROM bg JOIN bgc USING (w0, w1) JOIN ctx USING (w0)
      |      JOIN uni ON bg.w1 = uni.term CROSS JOIN tot)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*)
      |    AS avg_logprob
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Curation-report mirror of [[TextAnalysis.curationReport]]: same
    * signals (inline length/TTR, bigram dup ratio, micro-quantized
    * unigram log-prob), same first-failing-filter CASE order, same
    * thresholds. */
  val txtCurationReportSql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |base AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
      |           len(list_distinct(string_split(text, ' ')))::DOUBLE
      |             / len(string_split(text, ' ')) AS ttr
      |         FROM documents),
      |bg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg
      |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)),
      |pb AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
      |rep AS (SELECT doc_id, COUNT(*) AS n_distinct,
      |          CAST(SUM(c) AS BIGINT) AS n_bigrams FROM pb GROUP BY doc_id),
      |rep2 AS (SELECT d.doc_id,
      |           COALESCE(1 - rep.n_distinct::DOUBLE / rep.n_bigrams, 0.0) AS dup_ratio
      |         FROM documents d LEFT JOIN rep USING (doc_id)),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM tok),
      |freq AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
      |mm AS (SELECT doc_id,
      |         CAST(floor(ln(cnt / tot) * 1000000.0 + 0.5) AS BIGINT) AS micro
      |       FROM tok JOIN freq USING (term) CROSS JOIN tot),
      |lp AS (SELECT doc_id,
      |         CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS alp
      |       FROM mm GROUP BY doc_id),
      |v AS (SELECT b.source, b.n_tok,
      |        CASE WHEN b.n_tok < 20 THEN 'too_short'
      |             WHEN r.dup_ratio > 0.08 THEN 'repetitive'
      |             WHEN b.ttr < 0.30 THEN 'low_diversity'
      |             WHEN lp.alp < -3.43 THEN 'rare_tokens'
      |             ELSE 'kept' END AS verdict
      |      FROM base b JOIN rep2 r USING (doc_id) JOIN lp USING (doc_id))
      |SELECT source, verdict, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS tokens
      |FROM v GROUP BY 1, 2 ORDER BY source, verdict""".stripMargin

  /** Dynamic-threshold mirror of [[TextAnalysis.dynamicThreshold]]:
    * identical micro-exact avg_logprob, `quantile_cont` = Spark
    * `percentile` (shared linear-interpolation definition, round 6),
    * strict-less flag on the reproducible doubles. */
  val txtDynamicThresholdSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tot AS (SELECT COUNT(*)::DOUBLE AS tot FROM tok),
      |freq AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
      |m AS (SELECT doc_id,
      |        CAST(floor(ln(cnt / tot) * 1000000.0 + 0.5) AS BIGINT) AS micro
      |      FROM tok JOIN freq USING (term) CROSS JOIN tot),
      |lp AS (SELECT doc_id,
      |         CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_logprob
      |       FROM m GROUP BY doc_id),
      |s AS (SELECT d.source, lp.avg_logprob
      |      FROM documents d JOIN lp USING (doc_id)),
      |c AS (SELECT source, round(quantile_cont(avg_logprob, 0.1), 6) AS cutoff
      |      FROM s GROUP BY source)
      |SELECT s.source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN s.avg_logprob < c.cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  c.cutoff AS cutoff
      |FROM s JOIN c USING (source)
      |GROUP BY s.source, c.cutoff
      |ORDER BY s.source""".stripMargin

  /** Mixture-weights mirror of [[TextAnalysis.mixtureWeights]]: exact
    * token sums, double shares, micro-quantized α-power, exact-long
    * normalizer. */
  val txtMixtureWeightsSql: String =
    """WITH ps AS (SELECT source,
      |             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      |           FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(tokens) AS BIGINT)::DOUBLE AS tot FROM ps),
      |raw AS (SELECT source, tokens, tokens::DOUBLE / tot AS share,
      |          CAST(floor(pow(tokens::DOUBLE / tot, 0.3::DOUBLE)
      |            * 1000000.0 + 0.5) AS BIGINT) AS raw_micro
      |        FROM ps CROSS JOIN tot),
      |rt AS (SELECT CAST(SUM(raw_micro) AS BIGINT)::DOUBLE AS raw_tot FROM raw)
      |SELECT source, tokens, share,
      |  raw_micro::DOUBLE / raw_tot AS weight,
      |  raw_micro::DOUBLE / raw_tot / share AS factor
      |FROM raw CROSS JOIN rt ORDER BY source""".stripMargin

  /** Diversity mirror of [[Similarity.labelDiversity]]: identical
    * left-to-right norm fold, micro-quantized unit components, exact
    * long sums per (label, dim), micro-quantized squared means. */
  val embDiversitySql: String =
    """WITH e AS (SELECT label, embedding::DOUBLE[] AS v,
      |             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      |           FROM embeddings),
      |u AS (SELECT label, dim,
      |        CAST(floor(v[dim] / nrm * 1000000.0 + 0.5) AS BIGINT) AS micro
      |      FROM (SELECT label, v, nrm, unnest(range(1, len(v) + 1)) AS dim
      |            FROM e WHERE nrm > 0)),
      |d AS (SELECT label, dim, CAST(SUM(micro) AS BIGINT) AS s, COUNT(*) AS cnt
      |      FROM u GROUP BY 1, 2),
      |m AS (SELECT label, cnt,
      |        CAST(floor((s::DOUBLE / 1000000.0 / cnt) * (s::DOUBLE / 1000000.0 / cnt)
      |          * 1000000.0 + 0.5) AS BIGINT) AS mic2
      |      FROM d),
      |g AS (SELECT label, MAX(cnt) AS n_vectors, CAST(SUM(mic2) AS BIGINT) AS s2
      |      FROM m GROUP BY 1)
      |SELECT label, n_vectors,
      |  round(sqrt(s2::DOUBLE / 1000000.0), 6) AS mean_norm,
      |  round(1.0 - sqrt(s2::DOUBLE / 1000000.0), 6) AS diversity
      |FROM g ORDER BY label""".stripMargin

  val annTopkSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT query_id, e.vec_id AS neighbor_id,
      |        round(list_cosine_similarity(qe, e.embedding::DOUBLE[]), 6) AS sim
      |      FROM q, embeddings e WHERE e.vec_id <> q.query_id),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
      |      FROM c)
      |SELECT query_id, neighbor_id, rnk, sim FROM r
      |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  /** Hybrid RRF mirror of [[Similarity.hybridRrfTopK]]: dense arm =
    * the [[annTopkSql]] shape at perArm=20; lexical arm = the BM25
    * more-like-this with the query doc's distinct tokens as terms
    * (same literals/association as [[txtBm25Sql]]); fusion = exact
    * integer-rank micro contributions, full outer join. */
  val annHybridRrfSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT query_id, e.vec_id AS neighbor_id,
      |        round(list_cosine_similarity(qe, e.embedding::DOUBLE[]), 6) AS sim
      |      FROM q, embeddings e WHERE e.vec_id <> q.query_id),
      |dense AS (SELECT query_id, neighbor_id, rnk AS rnk_dense FROM (
      |    SELECT *, row_number() OVER
      |      (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
      |    FROM c) WHERE rnk <= 20),
      |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      |st AS (SELECT COUNT(*)::DOUBLE AS n,
      |         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      |qt AS (SELECT doc_id AS query_id,
      |         unnest(list_distinct(string_split(text, ' '))) AS term
      |       FROM documents WHERE doc_id < 5),
      |qv AS (SELECT DISTINCT term FROM qt),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tfq AS (SELECT doc_id, term, COUNT(*) AS tf
      |        FROM tok JOIN qv USING (term) GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id)::DOUBLE AS df FROM tfq GROUP BY 1),
      |m AS (SELECT qt.query_id, tfq.doc_id AS neighbor_id,
      |        CAST(floor(
      |          ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * (tfq.tf * 2.2) /
      |            (tfq.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))
      |          * 1000000.0 + 0.5) AS BIGINT) AS micro
      |      FROM tfq JOIN qt USING (term) JOIN df ON tfq.term = df.term
      |      JOIN dl ON tfq.doc_id = dl.doc_id CROSS JOIN st
      |      WHERE tfq.doc_id <> qt.query_id),
      |lexs AS (SELECT query_id, neighbor_id,
      |           CAST(SUM(micro) AS BIGINT) AS score_micro FROM m GROUP BY 1, 2),
      |lex AS (SELECT query_id, neighbor_id, rnk_lex FROM (
      |    SELECT *, row_number() OVER
      |      (PARTITION BY query_id ORDER BY score_micro DESC, neighbor_id) AS rnk_lex
      |    FROM lexs) WHERE rnk_lex <= 20),
      |f AS (SELECT COALESCE(d.query_id, l.query_id) AS query_id,
      |        COALESCE(d.neighbor_id, l.neighbor_id) AS neighbor_id,
      |        COALESCE(CAST(floor(1000000.0 / (60 + d.rnk_dense) + 0.5) AS BIGINT), 0)
      |          + COALESCE(CAST(floor(1000000.0 / (60 + l.rnk_lex) + 0.5) AS BIGINT), 0)
      |          AS rrf_micro,
      |        d.rnk_dense, l.rnk_lex
      |      FROM dense d FULL JOIN lex l
      |        ON d.query_id = l.query_id AND d.neighbor_id = l.neighbor_id)
      |SELECT query_id, neighbor_id, rnk, rrf_micro, rnk_dense, rnk_lex FROM (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY rrf_micro DESC, neighbor_id) AS rnk
      |  FROM f)
      |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  /** Training-order mirror of [[TextAnalysis.trainOrder]]: the same
    * md5 keying, 2-hex-digit bucketing, exclusive bucket-count prefix
    * offsets, and within-bucket ranks — integer-exact, so the global
    * permutation matches position-for-position. */
  val txtTrainOrderSql: String =
    """WITH k AS (SELECT doc_id,
      |             md5(concat('7:', CAST(doc_id AS VARCHAR))) AS key
      |           FROM documents),
      |b AS (SELECT doc_id, key, substring(key, 1, 2) AS bucket FROM k),
      |o AS (SELECT bucket,
      |        CAST(COALESCE(SUM(n) OVER (ORDER BY bucket
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          AS BIGINT) AS off
      |      FROM (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket)),
      |r AS (SELECT doc_id, key, bucket,
      |        row_number() OVER (PARTITION BY bucket
      |                           ORDER BY key, doc_id) - 1 AS ir
      |      FROM b)
      |SELECT r.doc_id, r.key, CAST(o.off + r.ir AS BIGINT) AS ord,
      |  CAST((o.off + r.ir) % 16 AS BIGINT) AS shard
      |FROM r JOIN o USING (bucket) ORDER BY ord""".stripMargin

  /** Shard-packing mirror of [[TextAnalysis.shardAssign]]: identical
    * exclusive prefix sum per source and integer-exact arithmetic. */
  val txtShardAssignSql: String =
    """WITH d AS (SELECT source, doc_id,
      |             len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
      |s AS (SELECT source, doc_id, n_tok,
      |        CAST(floor(CAST(COALESCE(SUM(n_tok) OVER (
      |            PARTITION BY source ORDER BY doc_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |          / 2000) AS BIGINT) AS shard_id
      |      FROM d)
      |SELECT source, shard_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM s GROUP BY 1, 2 ORDER BY source, shard_id""".stripMargin

  /** Context-window packing mirror of [[TextAnalysis.packAssign]] —
    * the same per-source token prefix sum, window indices as
    * floor-divisions of exact BIGINTs (both engines: double division
    * then floor, identical for these magnitudes). */
  val txtPackAssignSql: String =
    """WITH d AS (SELECT source, doc_id,
      |             len(string_split(text, ' '))::BIGINT AS n_tok FROM documents),
      |c AS (SELECT source, doc_id, n_tok,
      |        CAST(COALESCE(SUM(n_tok) OVER (
      |            PARTITION BY source ORDER BY doc_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |          AS cb
      |      FROM d)
      |SELECT source, doc_id, n_tok,
      |  CAST(floor(cb / 256) AS BIGINT) AS pack_first,
      |  CAST(floor((cb + n_tok - 1) / 256) AS BIGINT) AS pack_last,
      |  CAST(floor((cb + n_tok - 1) / 256) - floor(cb / 256) + 1 AS BIGINT) AS spans
      |FROM c ORDER BY source, doc_id""".stripMargin

  val txtTermTopkSql: String =
    """SELECT t AS term, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |GROUP BY t ORDER BY n DESC, term LIMIT 20""".stripMargin

  /** Mirror of the [[graft.queries.StableIds]] dense-id assignment:
    * ids ≡ global rank in (source, doc_id) order — the engine computes
    * them distributed (range partition + zipWithIndex), the oracle with
    * the plain single-reducer window. */
  val txtDocIndexSql: String =
    """SELECT source, doc_id,
      |  row_number() OVER (ORDER BY source, doc_id) - 1 AS stable_id
      |FROM documents ORDER BY source, doc_id""".stripMargin

  /** Mirror of [[graft.queries.StableIds.extend]] on a doc_id%4 corpus
    * split: existing rows (¬div4) hold ids 0..n−1 (their own assign),
    * so the incoming delta's ids are its (source, doc_id) ranks offset
    * by n — existing ids never move on ingest. */
  val txtDocIndexDeltaSql: String =
    """WITH ex AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id % 4 <> 0)
      |SELECT source, doc_id,
      |  row_number() OVER (ORDER BY source, doc_id) - 1 + (SELECT n FROM ex)
      |    AS stable_id
      |FROM documents WHERE doc_id % 4 = 0
      |ORDER BY source, doc_id""".stripMargin

  /** Mirror of [[TextAnalysis.redactPii]] — the IDENTICAL RE2∩Java
    * patterns (explicit whitespace class, no `\s`), the same
    * URL→EMAIL→IP scrub order, and the same PROGRESSIVE counting
    * (each pattern counted on the previous stage's scrubbed text);
    * DuckDB's regexp_replace needs the explicit 'g' flag (Spark's is
    * global by default). */
  /** DuckDB mirror of [[TextAnalysis.syntheticUrl]] +
    * [[TextAnalysis.canonicalUrl]] / registrableDomain — the same
    * Java∩RE2-safe regexes and the same CASE structure (including
    * the IPv6-bracket pass-through and the FULL-PSL longest-match
    * chain, whose IN lists are generated from the very [[Psl.rules]]
    * value the engine evaluates), binary-collation list_sort
    * matching Spark's array_sort. */
  /** IN-list / last-K-labels / domain-CASE SQL fragments GENERATED
    * from [[Psl.rules]] — the same value [[TextAnalysis
    * .registrableDomain]] evaluates, so the two engines' lookups can
    * never drift (r13: the full ~9.5k-rule bundled list replaced the
    * hand-curated snapshots; the oracle grew with it mechanically). */
  private def sqlIn(vs: Seq[String]): String =
    vs.map(v => s"'$v'").mkString(", ")

  /** `lastK` SQL columns for the `d` CTE, 1..maxSuffixLen+1, from the
    * SAME pattern generator as the Column side. */
  private val pslLastCols: String = {
    val maxL = Psl.rules.maxSuffixLen
    (1 to maxL + 1).map { k =>
      "    regexp_extract(host, '" + Psl.lastKPattern(k) +
        s"', 1) AS last$k"
    }.mkString(",\n")
  }

  /** The registrable-domain CASE chain, mirrored branch-for-branch
    * (exceptions longest-first, then suffix length descending with
    * normal-OR-wildcard arms, bare-suffix-returns-itself, default
    * last-two fallback). */
  private val pslDomainCase: String = {
    val R = Psl.rules
    val sb = new StringBuilder
    sb ++= "CASE WHEN starts_with(after_user, '[')\n"
    sb ++= "           THEN (CASE WHEN brkt <> '' THEN brkt ELSE after_user END)\n"
    sb ++= "         WHEN last2 = '' THEN host\n"
    for (e <- R.exc.keys.toSeq.sorted.reverse)
      sb ++= s"         WHEN last$e IN (${sqlIn(R.exc(e))}) THEN last$e\n"
    for (l <- (2 to R.maxSuffixLen).reverse) {
      val conds = R.norm.get(l).map(vs => s"last$l IN (${sqlIn(vs)})").toSeq ++
        R.wild.get(l - 1).map(vs =>
          s"(last$l <> '' AND last${l - 1} IN (${sqlIn(vs)}))").toSeq
      if (conds.nonEmpty)
        sb ++= s"         WHEN ${conds.mkString("\n           OR ")}\n" +
          s"           THEN (CASE WHEN last${l + 1} <> '' THEN last${l + 1} " +
          s"ELSE last$l END)\n"
    }
    sb ++= "         ELSE last2\n    END"
    sb.toString
  }

  private val urlCanonCte: String =
    s"""u AS (
      |  SELECT doc_id, text,
      |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTP'
      |          WHEN doc_id % 3 = 1 THEN 'https' ELSE 'HtTpS' END)
      |    || '://'
      |    || (CASE WHEN doc_id % 11 = 0 THEN 'User:Pw@' ELSE '' END)
      |    || 'WWW.'
      |    || (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END)
      |    || (CASE WHEN doc_id % 12 = 0 THEN '.Co.UK'
      |             WHEN doc_id % 12 = 1 THEN '.BlogSpot.CoM'
      |             WHEN doc_id % 12 = 2 THEN '.Shop.CK'
      |             WHEN doc_id % 12 = 3 THEN '.WwW.Ck'
      |             WHEN doc_id % 12 = 4 THEN '.S3.AmazonAWS.Com'
      |             WHEN doc_id % 12 = 5 THEN '.Kawasaki.JP'
      |             WHEN doc_id % 12 = 6 THEN '.City.Kawasaki.JP'
      |             WHEN doc_id % 12 = 7 THEN '.S3.AP-South-1.AmazonAWS.Com'
      |             WHEN doc_id % 12 = 8 THEN '.VFS.Cloud9.EU-West-2.AmazonAWS.Com'
      |             WHEN doc_id % 12 = 9 THEN '.CNS.Joyent.Com'
      |             WHEN doc_id % 12 = 10 THEN '.Compute.AmazonAWS.Com.CN'
      |             ELSE '.CoM' END)
      |    || (CASE WHEN doc_id % 4 = 0 THEN ':80'
      |             WHEN doc_id % 4 = 1 THEN ':443'
      |             WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN ''
      |             ELSE '/docs/' || lang || '/' || (doc_id % 100) END)
      |    || (CASE WHEN doc_id % 7 = 0 THEN ''
      |             ELSE '?b=' || (n_chars % 10) || '&a=' || (doc_id % 5) END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN '#s' || (doc_id % 3) ELSE '' END)
      |    AS url
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, text, url,
      |    lower(regexp_extract(trim(url),
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)', 1)) AS scheme,
      |    regexp_extract(trim(url),
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)', 2) AS auth,
      |    regexp_extract(trim(url),
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)', 3) AS path,
      |    regexp_extract(trim(url),
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)[?]?([^#]*)', 4) AS query
      |  FROM u),
      |h AS (
      |  SELECT doc_id, text, url, scheme, auth, path, query,
      |    regexp_extract(auth, '([^@]*)${"$"}', 1) AS after_user,
      |    regexp_extract(regexp_extract(auth, '([^@]*)${"$"}', 1),
      |      '^(\\[[^\\]]*\\])', 1) AS brkt,
      |    lower(regexp_extract(regexp_extract(auth, '([^@]*)${"$"}', 1),
      |      '^([^:]*)', 1)) AS host
      |  FROM p),
      |d AS (
      |  SELECT *,
$pslLastCols
      |  FROM h),
      |c AS (
      |  SELECT doc_id, text, url,
      |    CASE WHEN scheme = '' THEN trim(url) ELSE
      |      scheme || '://' ||
      |      (CASE WHEN contains(auth, '@') OR starts_with(auth, '[') THEN auth ELSE
      |        host ||
      |        (CASE WHEN regexp_extract(auth, ':([0-9]+)${"$"}', 1) = ''
      |               OR (scheme = 'http' AND regexp_extract(auth, ':([0-9]+)${"$"}', 1) = '80')
      |               OR (scheme = 'https' AND regexp_extract(auth, ':([0-9]+)${"$"}', 1) = '443')
      |              THEN '' ELSE ':' || regexp_extract(auth, ':([0-9]+)${"$"}', 1) END)
      |       END) ||
      |      (CASE WHEN path = '' THEN '/' ELSE path END) ||
      |      (CASE WHEN query = '' THEN ''
      |            ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&') END)
      |    END AS canon_url,
      |    $pslDomainCase AS domain
      |  FROM d)""".stripMargin

  // plain concatenation, NOT an outer stripMargin: the CTE's `||`
  // concat operators start lines, and a second stripMargin pass would
  // eat one pipe of each
  val txtUrlCanonSql: String =
    "WITH " + urlCanonCte +
      "\nSELECT doc_id, url, canon_url, domain FROM c ORDER BY doc_id"

  val txtDomainRollupSql: String =
    "WITH " + urlCanonCte +
      "\nSELECT domain, COUNT(*) AS n_docs," +
      "\n  COUNT(DISTINCT canon_url) AS n_urls," +
      "\n  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot_tokens" +
      "\nFROM c GROUP BY domain ORDER BY domain"

  val txtRedactSql: String =
    """WITH s AS (
      |  SELECT doc_id, text,
      |    regexp_replace(text,
      |      'https?://[^ \t\n\f\r\x0B]+', '<URL>', 'g') AS after_url
      |  FROM documents),
      |s2 AS (
      |  SELECT *, regexp_replace(after_url,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
      |    '<EMAIL>', 'g') AS after_email
      |  FROM s)
      |SELECT doc_id,
      |  len(regexp_extract_all(text, 'https?://[^ \t\n\f\r\x0B]+')) AS n_urls,
      |  len(regexp_extract_all(after_url,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |  len(regexp_extract_all(after_email,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
      |  md5(regexp_replace(after_email,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS clean_md5
      |FROM s2 ORDER BY doc_id""".stripMargin

  /** Mirror of [[TextAnalysis.domainCap]] — reuses the url/domain CTE
    * (same generated IN lists, same CASE chain) + the identical
    * deterministic window. */
  val txtDomainCapSql: String =
    "WITH " + urlCanonCte +
      """
      |SELECT doc_id, domain, domain_rank,
      |  CASE WHEN domain_rank <= 3 THEN 1 ELSE 0 END AS kept
      |FROM (SELECT doc_id, domain,
      |        CAST(row_number() OVER (PARTITION BY domain ORDER BY doc_id)
      |             AS BIGINT) AS domain_rank
      |      FROM c)
      |ORDER BY doc_id""".stripMargin

  /** Mirror of [[TextAnalysis.syntheticHtml]] + [[TextAnalysis
    * .htmlExtractedText]] — the IDENTICAL `(?is)` lazy-body
    * script/style strips, tag strip, literal entity decodes in the
    * same order (`&amp;` last), and the same explicit-whitespace
    * collapse; ratio_ppm is integer floor division on both engines. */
  val txtHtmlExtractSql: String =
    s"""WITH hh AS (
      |  SELECT doc_id,
      |    '<html><head><title>doc ' || doc_id || '</title>'
      |    || (CASE WHEN doc_id % 4 = 0
      |             THEN '<STYLE media="all">body { color: #000; }</STYLE>'
      |             ELSE '' END)
      |    || '</head><body><div class="nav"><a href="/">Home</a> '
      |    || '<a href="/about">About</a></div>'
      |    || (CASE WHEN doc_id % 3 = 0
      |             THEN '<script type="text/javascript">var ok = 1 < 2;'
      |                  || chr(10) || 'track("x");</script>'
      |             ELSE '' END)
      |    || '<h1>Doc ' || (doc_id % 100) || '</h1><p>' || text
      |    || (CASE WHEN doc_id % 5 = 0
      |             THEN ' Fish &amp; Chips &lt;fresh&gt;&nbsp;&quot;daily&quot; &#39;now&#39;'
      |             ELSE '' END)
      |    || '</p><footer>&copy; 2026</footer></body></html>' AS html
      |  FROM documents),
      |xx AS (
      |  SELECT doc_id, html,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(html,
      |              '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |          '<[^>]*>', ' ', 'g'),
      |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
      |      '[ \t\n\f\r]+', ' ', 'g')) AS xt
      |  FROM hh)
      |SELECT doc_id,
      |  CAST(len(html) AS BIGINT) AS html_chars,
      |  CAST(len(xt) AS BIGINT) AS text_chars,
      |  CAST((len(xt) * 1000000) // len(html) AS BIGINT) AS ratio_ppm,
      |  md5(xt) AS clean_md5
      |FROM xx ORDER BY doc_id""".stripMargin

  /** Mirror of [[TextAnalysis.passageChunks]] (c=32, s=24): same
    * start-grid (`0..n−c+s−1 step s`, always ≥ one chunk) and the same
    * clipped 32-token slices, via DuckDB list functions. */
  val txtChunksSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |s AS (SELECT doc_id, tk, len(tk) AS n FROM t),
      |g AS (SELECT doc_id, tk, n,
      |        unnest(range(0, greatest(n - 32 + 24 - 1, 0) + 1, 24)) AS start
      |      FROM s)
      |SELECT doc_id, (start // 24)::INT AS chunk_idx, start::INT AS start,
      |  least(32, n - start)::INT AS n_toks,
      |  array_to_string(list_slice(tk, start + 1, start + 32), ' ') AS chunk
      |FROM g ORDER BY doc_id, chunk_idx""".stripMargin

  /** Mirror of [[TextAnalysis.chunkDedup]] — the [[txtChunksSql]] grid
    * feeding an md5-per-chunk dedup window (survivor = least
    * (doc_id, chunk_idx) per hash). */
  val txtChunkDedupSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |s AS (SELECT doc_id, tk, len(tk) AS n FROM t),
      |g AS (SELECT doc_id, tk, n,
      |        unnest(range(0, greatest(n - 32 + 24 - 1, 0) + 1, 24)) AS start
      |      FROM s),
      |ch AS (SELECT doc_id, (start // 24)::INT AS chunk_idx,
      |         md5(array_to_string(list_slice(tk, start + 1, start + 32), ' '))
      |           AS h
      |       FROM g),
      |w AS (SELECT doc_id, chunk_idx,
      |        COUNT(*) OVER (PARTITION BY h) AS n_copies,
      |        ROW_NUMBER() OVER (PARTITION BY h
      |          ORDER BY doc_id, chunk_idx) AS rn
      |      FROM ch)
      |SELECT doc_id, chunk_idx, n_copies FROM w WHERE rn = 1
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Mirror of [[TextAnalysis.ngramTopK]] — positional (non-distinct)
    * 3-grams, unlike [[shingleCte]]'s list_distinct sets. */
  val txtNgramTopkSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(CASE WHEN len(w) >= 3 THEN
      |          list_transform(range(1, len(w) - 1),
      |            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |        ELSE []::VARCHAR[] END) AS ngram
      |      FROM t)
      |SELECT ngram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
      |FROM g GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""".stripMargin

  val txtSourceStatsSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot_tokens,
      |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val txtLangIdSql: String =
    """SELECT lang,
      |  CASE WHEN len(list_filter(string_split(text, ' '),
      |         t -> t IN ('the','a','of','to','and')))::DOUBLE
      |         / len(string_split(text, ' ')) >= 0.05
      |       THEN 'en' ELSE 'unk' END AS predicted,
      |  COUNT(*) AS n
      |FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin

  val txtTokenCountsSql: String =
    """SELECT source,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
      |  COUNT(*) AS n_docs
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val txtFingerprintSql: String =
    """SELECT COUNT(DISTINCT md5(array_to_string(
      |    list_sort(list_distinct(string_split(text, ' '))), ' '))) AS n_fingerprints,
      |  COUNT(*) AS n_docs
      |FROM documents""".stripMargin

  val txtQualitySql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_types,
      |  len(list_distinct(string_split(text, ' ')))::DOUBLE
      |    / len(string_split(text, ' ')) AS type_token_ratio,
      |  len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the','a','of','to','and')))::DOUBLE
      |    / len(string_split(text, ' ')) AS stopword_ratio,
      |  len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE / n_chars AS punct_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The registered form runs on the deterministic 10% id sample
    * (VERDICT r6 #3) — same device as `dd_sim_calibration`, so the
    * registry carries no unbounded all-pairs plan; threshold 0.3 keeps
    * the sampled output non-vacuous at both verified scales (11 rows
    * at sf0.01, 148 at sf0.1, measured). Oracle stays exact on the
    * identical sampled set. */
  val EmbedPairsSampleMod: Int = 10
  val ddEmbedPairsSql: String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE a.vec_id % $EmbedPairsSampleMod = 0 AND b.vec_id % $EmbedPairsSampleMod = 0
      |  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3
      |ORDER BY cos_sim DESC, id_a, id_b""".stripMargin

  /** Exact sampled semantic-contamination oracle: DuckDB reproduces
    * the salted-md5 split, the round-6 cosine, and the top-1 window —
    * every row of the registered query. */
  val ddSemanticContaminationSql: String =
    s"""WITH s AS (
      |  SELECT vec_id, embedding,
      |    CASE WHEN substr(md5(CAST(vec_id AS VARCHAR) || ':split'), 1, 2) < 'cc' THEN 'train'
      |         WHEN substr(md5(CAST(vec_id AS VARCHAR) || ':split'), 1, 2) < 'e6' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM embeddings WHERE vec_id % $EmbedPairsSampleMod = 0),
      |pairs AS (
      |  SELECT t.vec_id AS test_id, a.vec_id AS train_id,
      |    round(list_cosine_similarity(t.embedding::DOUBLE[], a.embedding::DOUBLE[]), 6) AS cos_sim
      |  FROM s t, s a
      |  WHERE t.split = 'test' AND a.split = 'train'
      |    AND round(list_cosine_similarity(t.embedding::DOUBLE[], a.embedding::DOUBLE[]), 6) >= 0.3)
      |SELECT test_id, train_id, cos_sim FROM (
      |  SELECT *, row_number() OVER (PARTITION BY test_id ORDER BY cos_sim DESC, train_id) AS rnk
      |  FROM pairs)
      |WHERE rnk = 1 ORDER BY test_id""".stripMargin

  val txtSplitAssignSql: String =
    """SELECT source,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cc' THEN 'train'
      |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6' THEN 'val'
      |       ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot_tokens
      |FROM documents GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  val mmMetaStatsSql: String =
    """SELECT lang AS format, COUNT(*) AS n,
      |  CAST(SUM(n_chars) AS BIGINT) AS size_total,
      |  CAST(SUM(octet_length(text::BLOB)) AS BIGINT) AS payload_bytes,
      |  CAST(SUM(n_chars % 1024) AS BIGINT) AS width_total
      |FROM documents GROUP BY lang ORDER BY format""".stripMargin

  /** Mirror of [[Multimodal.formatSniff]]: this DuckDB build cannot
    * slice BLOBs directly, so byte positions map onto the hex string
    * instead (byte k ↔ hex chars 2k−1..2k; both engines' `hex` is
    * uppercase) — semantically identical to Spark's
    * hex(substring(payload, …)) prefix tests, including short-payload
    * behavior (a truncated slice hexes to a shorter string and every
    * comparison is simply false). */
  val mmFormatSniffSql: String =
    """WITH p AS (SELECT lang, hex(text::BLOB) AS hx,
      |             octet_length(text::BLOB) AS len FROM documents)
      |SELECT lang AS declared,
      |  CASE
      |    WHEN substring(hx, 1, 8) = '89504E47' THEN 'png'
      |    WHEN substring(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
      |    WHEN substring(hx, 1, 8) = '47494638' THEN 'gif'
      |    WHEN substring(hx, 1, 4) = '424D' THEN 'bmp'
      |    WHEN substring(hx, 1, 8) = '52494646'
      |      AND substring(hx, 17, 8) = '57415645' THEN 'wav'
      |    WHEN substring(hx, 1, 8) = '464F524D'
      |      AND substring(hx, 17, 8) = '41494646' THEN 'aiff'
      |    WHEN substring(hx, 1, 4) = '1F8B' THEN 'gzip'
      |    WHEN substring(hx, 1, 8) = '504B0304' THEN 'zip'
      |    WHEN substring(hx, 1, 8) = '25504446' THEN 'pdf'
      |    ELSE 'other' END AS sniffed,
      |  COUNT(*) AS n, CAST(SUM(len) AS BIGINT) AS payload_bytes
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Mirror of [[Dedup.bestOfClusters]]: the [[ddClustersSql]] cluster
    * fixpoint at the looser 0.1/df-cap-16 graph (the registered 0.2/6
    * graph is empty at sf0.1 — this one binds at both scales) with the
    * survivor picked by (n_types DESC, doc_id ASC) — the same
    * lexicographic order the Spark struct-max encodes. */
  val ddBestSurvivorSql: String =
    s"""WITH RECURSIVE $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= 16),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM p
      |  JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |  WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.1),
      |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |      UNION ALL SELECT id_b, id_a FROM pairs),
      |r(id, label) AS (
      |  SELECT DISTINCT src, src FROM e
      |  UNION
      |  SELECT e.dst, r.label FROM r JOIN e ON e.src = r.id),
      |lab AS (SELECT id, MIN(label) AS cluster_id FROM r GROUP BY id),
      |q AS (SELECT doc_id, len(list_distinct(string_split(text, ' '))) AS n_types
      |      FROM documents),
      |rk AS (SELECT lab.cluster_id, lab.id, q.n_types,
      |         row_number() OVER (PARTITION BY lab.cluster_id
      |           ORDER BY q.n_types DESC, lab.id ASC) AS rn,
      |         COUNT(*) OVER (PARTITION BY lab.cluster_id) AS cluster_size
      |       FROM lab JOIN q ON lab.id = q.doc_id)
      |SELECT cluster_id, cluster_size, id AS survivor_id,
      |  n_types AS survivor_n_types
      |FROM rk WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  /** Mirror of [[TextAnalysis.spanRemoval]]: identical md5 4-token
    * windows (cf. the contamination mirror); a window is duplicated
    * when ≥2 distinct docs contain it; covered positions expand
    * per-occurrence and de-duplicate per doc. DuckDB lists are 1-based
    * where Spark positions are 0-based — only distinct-position COUNTS
    * cross the engine boundary, so the offset never shows. */
  val txtSpanRemovalSql: String =
    """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |w AS (SELECT doc_id, i,
      |        md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]) AS w
      |      FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i FROM tk)),
      |dup AS (SELECT w FROM (SELECT DISTINCT w, doc_id FROM w)
      |        GROUP BY w HAVING COUNT(*) >= 2),
      |cov AS (SELECT doc_id, COUNT(DISTINCT p) AS n_dup
      |        FROM (SELECT doc_id, unnest(range(i, i + 4)) AS p
      |              FROM w WHERE w.w IN (SELECT w FROM dup))
      |        GROUP BY doc_id)
      |SELECT d.doc_id, d.source,
      |  len(string_split(d.text, ' '))::BIGINT AS n_tokens,
      |  COALESCE(cov.n_dup, 0)::BIGINT AS n_dup_tokens,
      |  len(string_split(d.text, ' '))::BIGINT - COALESCE(cov.n_dup, 0)
      |    AS n_kept_tokens
      |FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Mirror of [[Similarity.hofStats]]: DuckDB's list higher-order
    * functions reproduce Spark's array HOFs; both sides quantize the
    * squared component BEFORE any sum so the fold order never shows. */
  val embHofStatsSql: String =
    """WITH v AS (SELECT label,
      |    list_sum(list_transform(embedding::DOUBLE[],
      |      x -> CAST(floor(x * x * 1000000.0 + 0.5) AS BIGINT))) AS sq_micro,
      |    len(list_filter(embedding::DOUBLE[], x -> x >= 0)) AS n_nonneg,
      |    list_max(embedding::DOUBLE[]) AS max_comp
      |  FROM embeddings)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(sq_micro) AS BIGINT) AS tot_sq_micro,
      |  CAST(SUM(n_nonneg) AS BIGINT) AS tot_nonneg,
      |  MAX(max_comp) AS max_comp
      |FROM v GROUP BY label ORDER BY label""".stripMargin

  /** Mirror of [[TextAnalysis.sourceEntropy]]: identical exact-count
    * ratios, ln, and micro-quantization on both sides. */
  val txtSourceEntropySql: String =
    """WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS term
      |            FROM documents),
      |sc AS (SELECT source, term, COUNT(*) AS c FROM st GROUP BY 1, 2),
      |ts AS (SELECT source, SUM(c) AS ts FROM sc GROUP BY 1),
      |cc AS (SELECT term, SUM(c) AS cc FROM sc GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tot FROM sc),
      |m AS (SELECT sc.source, sc.c,
      |        CAST(floor(-((sc.c::DOUBLE / ts.ts) * ln(sc.c::DOUBLE / ts.ts))
      |          * 1000000.0 + 0.5) AS BIGINT) AS h_micro,
      |        CAST(floor((sc.c::DOUBLE / ts.ts)
      |          * ln((sc.c::DOUBLE / ts.ts) / (cc.cc::DOUBLE / tot.tot))
      |          * 1000000.0 + 0.5) AS BIGINT) AS kl_micro
      |      FROM sc JOIN ts USING (source) JOIN cc USING (term), tot)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_terms,
      |  CAST(SUM(h_micro) AS BIGINT)::DOUBLE / 1000000.0 AS entropy,
      |  CAST(SUM(kl_micro) AS BIGINT)::DOUBLE / 1000000.0 AS kl_vs_corpus
      |FROM m GROUP BY source ORDER BY source""".stripMargin

  /** Mirror of [[Dedup.triangleStats]] (threshold 0.1, df-cap 16 —
    * deliberately looser than the dedup queries' 0.2/6). DuckDB
    * enumerates triangles by plain id order (a<b<c); Spark orients by
    * (degree, id) — any total order counts each triangle exactly once,
    * so the counts agree. */
  val ddTrianglesSql: String =
    s"""WITH $shingleCte,
      |s AS (SELECT doc_id, unnest(sh) AS g FROM sh),
      |dfc AS (SELECT g FROM s GROUP BY g HAVING COUNT(*) <= 16),
      |sc AS (SELECT s.doc_id, s.g FROM s JOIN dfc USING (g)),
      |sz AS (SELECT doc_id, len(sh) AS nsh FROM sh),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |      FROM sc a JOIN sc b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |e AS (SELECT id_a, id_b FROM p
      |      JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
      |      WHERE inter::DOUBLE / (x.nsh + y.nsh - inter) >= 0.1),
      |deg AS (SELECT id, COUNT(*) AS deg FROM
      |          (SELECT id_a AS id FROM e UNION ALL SELECT id_b FROM e)
      |        GROUP BY 1),
      |tri AS (SELECT COUNT(*) AS n_triangles
      |        FROM e e1 JOIN e e2 ON e1.id_b = e2.id_a
      |        JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
      |g AS (SELECT COUNT(*) AS n_nodes,
      |        CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
      |ec AS (SELECT COUNT(*) AS n_edges FROM e)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles,
      |  CASE WHEN n_wedges > 0 THEN 3.0 * n_triangles / n_wedges
      |       ELSE 0.0 END AS clustering_coeff
      |FROM g, ec, tri""".stripMargin

  /** Mirror of [[Similarity.sq8Report]]: DuckDB lists are 1-based so
    * `i - 1` aligns the dim ids; every arithmetic step is the identical
    * per-component IEEE chain, errors quantized to 1e-8 units. */
  val embSq8Sql: String =
    """WITH c AS (SELECT i - 1 AS dim, v[i] AS x
      |           FROM (SELECT embedding::DOUBLE[] AS v,
      |                   unnest(range(1, len(embedding) + 1)) AS i
      |                 FROM embeddings)),
      |st AS (SELECT dim, MIN(x) AS vmin, MAX(x) AS vmax FROM c GROUP BY 1),
      |m AS (SELECT c.dim, x, vmin, vmax, (vmax - vmin) / 255.0 AS scale
      |      FROM c JOIN st USING (dim)),
      |q AS (SELECT dim, x, vmin, vmax, scale,
      |        CASE WHEN scale > 0
      |             THEN least(255.0, floor((x - vmin) / scale + 0.5))
      |             ELSE 0.0 END AS code
      |      FROM m),
      |e AS (SELECT dim, vmin, vmax,
      |        CAST(floor(abs(x - (vmin + code * scale)) * 100000000.0 + 0.5)
      |          AS BIGINT) AS err8
      |      FROM q)
      |SELECT dim, COUNT(*) AS n, MIN(vmin) AS vmin, MAX(vmax) AS vmax,
      |  CAST(SUM(err8) AS BIGINT) AS tot_err_1e8,
      |  CAST(MAX(err8) AS BIGINT) AS max_err_1e8,
      |  CAST(SUM(err8) AS BIGINT)::DOUBLE / 100000000.0 / COUNT(*) AS mae
      |FROM e GROUP BY dim ORDER BY dim""".stripMargin

  /** Mirror of [[TextAnalysis.splitOov]]: identical split hash, 3-gram
    * units, occurrence-grain counts. */
  val txtSplitOovSql: String =
    """WITH sp AS (SELECT doc_id, text,
      |        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cc' THEN 'train'
      |             WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6' THEN 'val'
      |             ELSE 'test' END AS split
      |      FROM documents),
      |tg AS (SELECT split, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
      |       FROM (SELECT split, string_split(text, ' ') AS t,
      |               unnest(range(1, len(string_split(text, ' ')) - 1)) AS i
      |             FROM sp)),
      |tv AS (SELECT DISTINCT g FROM tg WHERE split = 'train')
      |SELECT tg.split, COUNT(*) AS n_ngrams,
      |  CAST(SUM(CASE WHEN tv.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(SUM(CASE WHEN tv.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
      |    / COUNT(*) AS oov_rate
      |FROM tg LEFT JOIN tv ON tg.g = tv.g
      |GROUP BY tg.split ORDER BY tg.split""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_span_removal" -> ((s, d) => TextAnalysis.spanRemoval(s, d)),
    "txt_split_oov" -> ((s, d) => TextAnalysis.splitOov(s, d)),
    "dd_triangles" -> ((s, d) => Dedup.triangleStats(s, d)),
    "dd_best_survivor" -> ((s, d) =>
      Dedup.bestOfClusters(s, d, 0.1, maxDocFreq = Some(16L))),
    "emb_sq8_error" -> ((s, d) => Similarity.sq8Report(s, d)),
    "txt_source_entropy" -> ((s, d) => TextAnalysis.sourceEntropy(s, d)),
    "emb_hof_stats" -> ((s, d) => Similarity.hofStats(s, d)),
    "dd_exact" -> ((s, d) => Dedup.exactDedup(s, d)),
    "dd_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(s, d, 0.2, maxDocFreq = Some(JaccardDocFreqCap))),
    "dd_containment" -> ((s, d) =>
      Dedup.containmentPairs(s, d, 0.6, maxDocFreq = Some(JaccardDocFreqCap))),
    "dd_minhash_neardup" -> ((s, d) => Dedup.minhashNearDup(s, d, 0.5)),
    "dd_clusters" -> ((s, d) =>
      Dedup.nearDupClusters(s, d, 0.2, maxDocFreq = Some(JaccardDocFreqCap))),
    "dd_corpus_dedup" -> ((s, d) =>
      Dedup.dedupCorpus(s, d, 0.2, maxDocFreq = Some(JaccardDocFreqCap))),
    // the crawl-pipeline composition (r11): canonical-URL dedup runs
    // AHEAD of content hashing — fates url_dup → exact_dup → near_dup
    // → kept, per-source; full SQL oracle incl. the canon chain
    "dd_url_dedup" -> ((s, d) =>
      Dedup.urlDedupCorpus(s, d, 0.2, maxDocFreq = Some(JaccardDocFreqCap))),
    "txt_stratified_sample" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "txt_repetition" -> ((s, d) => TextAnalysis.repetitionScores(s, d)),
    "txt_contamination" -> ((s, d) => TextAnalysis.contaminationPairs(s, d)),
    "txt_cms_terms" -> ((s, d) => TextAnalysis.cmsTermCounts(s, d)),
    "dd_delta" -> ((s, d) =>
      Dedup.dedupDelta(s, d, 0.2, maxDocFreq = Some(JaccardDocFreqCap))),
    "dd_pagerank" -> ((s, d) =>
      Dedup.pageRank(s, d, 0.2, maxDocFreq = Some(JaccardDocFreqCap))),
    "dd_sim_calibration" -> ((s, d) => Dedup.simCalibration(s, d)),
    "dd_simhash_pairs" -> ((s, d) => Dedup.simhashNearDup(s, d, 6)),
    "dd_embed_pairs" -> ((s, d) => Dedup.embeddingNearDupExact(s, d, 0.3,
      sampleMod = Some(EmbedPairsSampleMod))),
    "dd_embed_neardup" -> ((s, d) => Dedup.embeddingNearDup(s, d, 0.4)),
    // the SHUFFLE-JOIN deployment of the streaming semantic gate
    // (VERDICT r9 #4): the form an index too big to broadcast
    // actually runs — a 10% incoming shard keyed row-locally, equi-
    // joined against the corpus band index on (band, bucket) with NO
    // broadcast, then the consumer-side rollup every deployment runs
    // on the candidate stream: matched-band count per (incoming,
    // corpus) pair, thresholded at ≥ half the bands (an exact copy
    // matches all 8; at the corpus-adaptive bit widths a random pair
    // rarely clears 4 — the high-precision router signal). Rows-only
    // (hyperplane hashes aren't SQL); raw-gate stream ≡ batch is
    // pinned in StreamingAnalyticsSpec at the 10× index scale.
    "dd_embed_gate_shuffle" -> ((s, d) => {
      val e = graft.Tables.embeddings(s, d)
        .select(functions.col("vec_id"), functions.col("embedding"))
      Dedup.streamingEmbedGate(
        e.filter(functions.col("vec_id") % 10 === 3),
        Dedup.corpusEmbedBandIndex(s, d), broadcastIndex = false)
        .filter(functions.col("vec_id") =!= functions.col("corpus_id"))
        .groupBy(functions.col("vec_id"), functions.col("corpus_id"))
        .agg(functions.count(functions.lit(1)).as("n_bands"))
        .filter(functions.col("n_bands") >= 4)
    }),
    "dd_embed_clusters" -> ((s, d) => Dedup.embeddingClusters(s, d, 0.4)),
    "txt_quality" -> ((s, d) => TextAnalysis.qualityScores(s, d)),
    "txt_rolling_overlap" -> ((s, d) => TextAnalysis.rollingOverlapPairs(s, d, 3)),
    "ann_cosine_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d, 5, 10)),
    "ann_lsh_topk" -> ((s, d) => Similarity.lshTopK(s, d, 5, 10)),
    "ann_ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d, 5, 10)),
    // the forced two-level coarse-model sibling — the 100 TB
    // mechanism (distributive Lloyd + table-join assignment + dense
    // ids) benched and curve-measured at every scale; the size
    // dispatcher only takes it past IvfFlatMaxCells, which no test
    // corpus reaches (the dd_semdedup_2l pattern, VERDICT r9 #1)
    "ann_ivf_topk_2l" -> ((s, d) =>
      Similarity.ivfTopK(s, d, 5, 10, forceTable = true)),
    "ann_pq_topk" -> ((s, d) => Similarity.pqTopK(s, d, 5, 10)),
    "ann_ivfpq_topk" -> ((s, d) => Similarity.ivfPqTopK(s, d, 5, 10)),
    // the corpus-scale BATCH deployment of the same query program
    // (r11): probe ranking and ADC math run per-executor against the
    // broadcast model — zero driver flops grow with the query batch
    // (the auto-dispatch takes this path past QFrameThreshold; forced
    // here so it is benched at the registered scale). Outputs pinned
    // row-for-row equal to ann_ivfpq_topk's (SimilaritySpec) —
    // rows-only like it
    "ann_ivfpq_frame" -> ((s, d) =>
      Similarity.ivfPqTopK(s, d, 5, 10, frameQueries = true)),
    // the PERSISTED-index deployment path (r10): model sides loaded
    // from the on-disk artifact, candidate scan reading the
    // cell-partitioned codes table with partition pruning; results
    // row-for-row equal the memoized path (AnnIndexSpec) — rows-only
    "ann_ivfpq_stored" -> ((s, d) =>
      AnnIndex.ivfPqTopK(s, d, AnnIndex.storedIndexFor(s, d), 5, 10)),
    // the INCREMENTAL-maintenance deployment path (r11): base
    // generation indexes the corpus minus a 10% shard, the shard
    // arrives via AnnIndex.append against the frozen persisted model —
    // the composed code set is row-for-row the full build's (same
    // encode kernel, same model), so the query output is pinned equal
    // to ann_ivfpq_stored's (AnnIndexSpec) — rows-only like it
    "ann_ivfpq_append" -> ((s, d) =>
      AnnIndex.ivfPqTopK(s, d, AnnIndex.appendIndexFor(s, d), 5, 10)),
    "ann_pca_topk" -> ((s, d) => Similarity.pcaTopK(s, d, 5, 10)),
    "emb_kmeans" -> ((s, d) => Similarity.kmeansReport(s, d)),
    "ann_filtered_topk" -> ((s, d) => Similarity.filteredTopK(s, d, 5, 10)),
    "ann_hybrid_rrf" -> ((s, d) => Similarity.hybridRrfTopK(s, d, 5, 10)),
    // the PERSISTED-postings deployment of the lexical arm (r11):
    // loads the on-disk BM25 index (bucket-pruned) instead of the
    // session memo — bit-identical scores, so the SAME SQL oracle
    // hash-gates it (the strongest stored ≡ memoized proof available)
    "ann_hybrid_rrf_stored" -> ((s, d) =>
      Similarity.hybridRrfStoredTopK(s, d, 5, 10)),
    // the scale sibling: dense arm = IVF∘PQ (probe-bounded + constant
    // exact rerank) instead of the per-query corpus scan; rows-only
    // (trained cells aren't SQL-reproducible — the brute sibling
    // keeps the oracle)
    "ann_hybrid_rrf_ivfpq" -> ((s, d) => Similarity.hybridRrfIvfPqTopK(s, d, 5, 10)),
    // the FULLY-STORED serving stack (r11 #6): dense arm from the
    // persisted IVF∘PQ artifact + lexical arm from the persisted
    // postings, zero session memos — the restarted-server shape;
    // rows-only (the dense arm's trained cells aren't
    // SQL-reproducible), spec-pinned ≡ the memoized hybrid
    // (LexStoreSpec's stored-stack case)
    "ann_hybrid_rrf_stored_stack" -> ((s, d) =>
      Similarity.hybridRrfStoredStackTopK(s, d, 5, 10)),
    "ann_mmr_rerank" -> ((s, d) => Similarity.mmrRerank(s, d, 5, 20, 10)),
    "txt_bm25_topk" -> ((s, d) => TextAnalysis.bm25TopK(s, d)),
    // BM25 served from the base+appended-shard PERSISTED postings
    // (r11 #1): additive stats make the composition bit-identical to
    // a full build, so the IDENTICAL SQL oracle hash-gates base+shard
    // ≡ full rebuild on the lexical surface
    "txt_bm25_topk_append" -> ((s, d) =>
      TextAnalysis.bm25TopKFromStore(s, LexStore.appendLexFor(s, d))),
    // the composed continuous-ingestion job's fate ledger (r11 #1):
    // one Ingest.run over the doc_id % 10 == 7 shard against base
    // artifacts — rows-only (the near-dup arm rides the xxhash64
    // minhash gate), gated by IngestMainSpec's kill/convergence and
    // non-vacuity cases
    "ingest_fates" -> ((s, d) => Ingest.ingestFates(s, d)),
    "txt_tfidf_topterms" -> ((s, d) => TextAnalysis.tfidfTopTerms(s, d)),
    "txt_curation_report" -> ((s, d) => TextAnalysis.curationReport(s, d)),
    "txt_dynamic_threshold" -> ((s, d) => TextAnalysis.dynamicThreshold(s, d)),
    "txt_dsir_weights" -> ((s, d) => TextAnalysis.dsirWeights(s, d)),
    "txt_bpe_merges" -> ((s, d) => TextAnalysis.bpeMerges(s, d)),
    "txt_bpe_encode" -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    "txt_mixture_weights" -> ((s, d) => TextAnalysis.mixtureWeights(s, d)),
    "emb_diversity" -> ((s, d) => Similarity.labelDiversity(s, d)),
    "emb_pca_project" -> ((s, d) => Similarity.pcaProject(s, d)),
    "txt_shard_assign" -> ((s, d) => TextAnalysis.shardAssignBlocked(s, d)),
    "txt_train_order" -> ((s, d) => TextAnalysis.trainOrder(s, d)),
    "txt_pack_assign" -> ((s, d) => TextAnalysis.packAssignBlocked(s, d)),
    "dd_bloom_delta" -> ((s, d) => Dedup.bloomDelta(s, d)),
    "dd_semantic_contamination" -> ((s, d) => Dedup.semanticContamination(s, d)),
    "dd_semantic_contamination_lsh" -> ((s, d) => Dedup.semanticContaminationLsh(s, d)),
    "dd_semdedup" -> ((s, d) => Dedup.semDedup(s, d, 0.4)),
    // the forced centroid-TABLE model — the 100 TB mechanism benched
    // and curve-measured at every scale (the size dispatcher only
    // takes it past SemFlatMaxK, which no test corpus reaches)
    "dd_semdedup_2l" -> ((s, d) => Dedup.semDedup(s, d, 0.4, twoLevel = true)),
    "txt_unigram_logprob" -> ((s, d) => TextAnalysis.unigramLogprob(s, d)),
    // ingest quality gate from the PERSISTED unigram LM (r13): the
    // held-out shard scored against the standing-corpus generation
    "ingest_lm_gate" -> ((s, d) => Ingest.ingestLmGate(s, d)),
    "ingest_quality_gate" -> ((s, d) => Ingest.ingestQualityGate(s, d)),
    "ingest_lm_gate_capped" -> ((s, d) => Ingest.ingestLmGateCapped(s, d)),
    "txt_bigram_logprob" -> ((s, d) => TextAnalysis.bigramLogprob(s, d)),
    "txt_weighted_sample" -> ((s, d) => TextAnalysis.weightedSample(s, d)),
    "txt_final_corpus" -> ((s, d) =>
      TextAnalysis.finalCorpus(s, d, 0.2, Some(JaccardDocFreqCap))),
    // terminal sort matches the oracle's ORDER BY contract — the
    // operator itself stays sort-free (chunkDedup re-shuffles anyway)
    "txt_chunks" -> ((s, d) => TextAnalysis.passageChunks(s, d)
      .orderBy("doc_id", "chunk_idx")),
    "txt_redact" -> TextAnalysis.redactPii _,
    // HTML main-content extraction (r11 #7): strip script/style WITH
    // bodies, strip tags, decode entities, text-to-markup ratio —
    // the stage a crawl pipeline runs before every filter above
    "txt_html_extract" -> TextAnalysis.htmlExtract _,
    "txt_url_canon" -> ((s, d) => TextAnalysis.canonicalUrls(s, d)),
    "txt_domain_rollup" -> ((s, d) => TextAnalysis.domainRollup(s, d)),
    // per-domain cap (r12): the curation stage the PSL private
    // section exists for — deterministic keep-first-K per registrable
    // domain, per-doc verdicts so the decision is auditable
    "txt_domain_cap" -> ((s, d) => TextAnalysis.domainCap(s, d)),
    "txt_chunk_dedup" -> ((s, d) => TextAnalysis.chunkDedup(s, d)),
    "txt_term_topk" -> ((s, d) => TextAnalysis.termTopK(s, d, 20)),
    "txt_ngram_topk" -> ((s, d) => TextAnalysis.ngramTopK(s, d, 3, 20)),
    "txt_doc_index" -> ((s, d) =>
      graft.queries.StableIds.assign(
        graft.Tables.documents(s, d)
          .select(functions.col("source"), functions.col("doc_id")),
        Seq(functions.col("source"), functions.col("doc_id")))),
    "txt_doc_index_delta" -> ((s, d) => {
      val keys = graft.Tables.documents(s, d)
        .select(functions.col("source"), functions.col("doc_id"))
      val sort = Seq(functions.col("source"), functions.col("doc_id"))
      val existing = graft.queries.StableIds.assign(
        keys.filter(functions.col("doc_id") % 4 =!= 0), sort)
      graft.queries.StableIds.extend(existing,
        keys.filter(functions.col("doc_id") % 4 === 0), sort)
    }),
    "txt_source_stats" -> ((s, d) => TextAnalysis.sourceStats(s, d)),
    "txt_langid_profile" -> ((s, d) => TextAnalysis.langIdProfile(s, d)),
    "txt_langid_trained" -> ((s, d) => LangIdStore.langIdTrained(s, d)),
    "txt_token_counts" -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "txt_fingerprint" -> ((s, d) => TextAnalysis.fingerprintSummary(s, d)),
    "txt_split_assign" -> ((s, d) => TextAnalysis.splitAssign(s, d)),
    "mm_meta_stats" -> ((s, d) => Multimodal.metaStats(s, d)),
    "mm_decode_stats" -> ((s, d) => Multimodal.decodeStats(s, d)),
    "mm_format_sniff" -> ((s, d) => Multimodal.formatSniff(s, d)),
    "mm_phash_dedup" -> ((s, d) => Multimodal.imageNearDup(s, d)),
    "mm_audio_dedup" -> ((s, d) => Multimodal.audioNearDup(s, d))
  )

  /** dd_embed_neardup /
    * ann_lsh_topk / ann_ivf_topk / ann_ivf_topk_2l / ann_pq_topk /
    * ann_ivfpq_topk / ann_ivfpq_frame / ann_ivfpq_stored /
    * ann_ivfpq_append / dd_embed_gate_shuffle intentionally absent
    * (rows-only): hyperplane-LSH hash functions / trained quantizers
    * aren't reproducible in DuckDB; their correctness gates live in
    * DedupSpec/SimilaritySpec (PQ additionally reranks with the exact
    * cosine, so its reported sims are brute-force-identical; the
    * shuffle-join gate is pinned stream ≡ batch at the 10× index
    * scale in StreamingAnalyticsSpec). dd_minhash_neardup /
    * dd_simhash_pairs / txt_rolling_overlap moved to FULL oracles in
    * r15 (VERDICT r14 #4): their registered forms restate the hash
    * family as md5-derived values DuckDB computes byte-identically,
    * with plan shapes unchanged.
    * ann_mmr_rerank is likewise rows-only: a greedy argmax chain isn't
    * SQL-expressible; SimilaritySpec gates it against a driver-side
    * reference and the λ=1 ≡ brute-force identity. txt_bpe_merges is
    * rows-only too (iterative list-fold state isn't reasonable SQL);
    * ann_pca_topk is rows-only for the same reason as emb_pca_project
    * (the eigenbasis isn't SQL) — SimilaritySpec gates its recall floor,
    * exact-rerank sims, and determinism. txt_bpe_merges is additionally
    * TextAnalysisSpec gates it against an exact driver-side BPE
    * reference, and txt_bpe_encode (the trained table applied back to
    * the corpus) is gated the same way. emb_pca_project is rows-only (an eigendecomposition
    * isn't SQL); SimilaritySpec gates orthonormality, eigenvalue ≡
    * projected-variance, trace preservation, reconstruction, and
    * bit-determinism. */
  val oracles: Map[String, String] = Map(
    "txt_span_removal" -> txtSpanRemovalSql,
    "txt_split_oov" -> txtSplitOovSql,
    "txt_source_entropy" -> txtSourceEntropySql,
    "dd_triangles" -> ddTrianglesSql,
    "dd_best_survivor" -> ddBestSurvivorSql,
    "emb_sq8_error" -> embSq8Sql,
    "emb_hof_stats" -> embHofStatsSql,
    "dd_exact" -> ddExactSql,
    "dd_jaccard_pairs" -> ddJaccardSql,
    "dd_containment" -> ddContainmentSql,
    "dd_minhash_neardup" -> ddMinhashSql,
    "dd_simhash_pairs" -> ddSimhashSql,
    "txt_rolling_overlap" -> txtRollingOverlapSql,
    "dd_clusters" -> ddClustersSql,
    "dd_corpus_dedup" -> ddCorpusDedupSql,
    "dd_url_dedup" -> ddUrlDedupSql,
    "txt_stratified_sample" -> txtStratifiedSampleSql,
    "txt_repetition" -> txtRepetitionSql,
    "txt_contamination" -> txtContaminationSql,
    "dd_delta" -> ddDeltaSql,
    "dd_bloom_delta" -> ddBloomDeltaSql,
    "txt_pack_assign" -> txtPackAssignSql,
    "dd_pagerank" -> ddPagerankSql,
    "dd_sim_calibration" -> ddSimCalibrationSql,
    "dd_embed_pairs" -> ddEmbedPairsSql,
    "dd_semantic_contamination" -> ddSemanticContaminationSql,
    "txt_quality" -> txtQualitySql,
    "ann_cosine_topk" -> annTopkSql,
    "ann_filtered_topk" -> annFilteredTopkSql,
    "ann_hybrid_rrf" -> annHybridRrfSql,
    // the stored-postings sibling is gated by the IDENTICAL oracle:
    // persistence must not change a single fused score
    "ann_hybrid_rrf_stored" -> annHybridRrfSql,
    "txt_bm25_topk" -> txtBm25Sql,
    // base + appended shard served from the persisted postings is
    // gated by the IDENTICAL oracle: the composition must score
    // bit-for-bit like a full rebuild (additive BM25 stats)
    "txt_bm25_topk_append" -> txtBm25Sql,
    "txt_tfidf_topterms" -> txtTfidfSql,
    "txt_curation_report" -> txtCurationReportSql,
    "txt_dynamic_threshold" -> txtDynamicThresholdSql,
    "txt_dsir_weights" -> txtDsirWeightsSql,
    "txt_mixture_weights" -> txtMixtureWeightsSql,
    "emb_diversity" -> embDiversitySql,
    "txt_shard_assign" -> txtShardAssignSql,
    "txt_train_order" -> txtTrainOrderSql,
    "txt_unigram_logprob" -> txtUnigramLogprobSql,
    "ingest_lm_gate" -> ingestLmGateSql,
    "ingest_quality_gate" -> ingestQualityGateSql,
    "txt_langid_trained" -> txtLangIdTrainedSql,
    "ingest_lm_gate_capped" -> ingestLmGateCappedSql,
    "txt_bigram_logprob" -> txtBigramLogprobSql,
    "txt_weighted_sample" -> txtWeightedSampleSql,
    "txt_final_corpus" -> txtFinalCorpusSql,
    "txt_term_topk" -> txtTermTopkSql,
    "txt_ngram_topk" -> txtNgramTopkSql,
    "txt_doc_index" -> txtDocIndexSql,
    "txt_doc_index_delta" -> txtDocIndexDeltaSql,
    "txt_chunks" -> txtChunksSql,
    "txt_redact" -> txtRedactSql,
    "txt_html_extract" -> txtHtmlExtractSql,
    "txt_url_canon" -> txtUrlCanonSql,
    "txt_domain_rollup" -> txtDomainRollupSql,
    "txt_domain_cap" -> txtDomainCapSql,
    "txt_chunk_dedup" -> txtChunkDedupSql,
    "txt_source_stats" -> txtSourceStatsSql,
    "txt_langid_profile" -> txtLangIdSql,
    "txt_token_counts" -> txtTokenCountsSql,
    "txt_fingerprint" -> txtFingerprintSql,
    "txt_split_assign" -> txtSplitAssignSql,
    "mm_meta_stats" -> mmMetaStatsSql,
    "mm_format_sniff" -> mmFormatSniffSql
  )
}
