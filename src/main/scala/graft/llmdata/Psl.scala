package graft.llmdata

/** THE FULL PUBLIC SUFFIX LIST, bundled (r13, VERDICT r12 #7): the
  * complete publicsuffix.org snapshot — ~9.5k rules across both the
  * ICANN and PRIVATE sections — parsed once from the resource file
  * into per-rule-class, per-label-count sets. Public data (Mozilla's
  * Public Suffix List, the same snapshot OS distributions and Guava
  * ship); the bundled `.dat` is the canonical interchange format, so
  * a deployment tracking upstream swaps ONE file.
  *
  * Rule classes (https://publicsuffix.org/list/ semantics):
  *  - NORMAL `a.b`: the listed name is a public suffix — registrable
  *    = suffix + 1 label;
  *  - WILDCARD `*.p`: EVERY name directly under the parent is a
  *    public suffix (the parent itself is NOT made one by the
  *    wildcard) — registrable = parent + 2 labels;
  *  - EXCEPTION `!x.p`: carves the listed name back OUT of a
  *    wildcard — the name itself is registrable, for itself and any
  *    subdomain. Exceptions always beat other rules; otherwise the
  *    LONGEST matching rule wins; an unlisted TLD takes the implicit
  *    default rule `*` (suffix = last label).
  *
  * The r10–r12 hand-curated snapshots (~210 entries across four
  * constants) are retired in favor of this parse; the lookup stays a
  * row-local IN set ([[TextAnalysis.registrableDomain]]) because at
  * 9.5k constant entries an `InSet` probe is O(1) per row with zero
  * shuffle — a broadcast join only wins past list sizes the PSL will
  * never reach. The DuckDB oracle generates its IN lists from this
  * very object, preserving the generated-from-the-same-constant
  * discipline. */
private[llmdata] object Psl {

  /** Parsed rules, each map keyed by LABEL COUNT: `norm(2)` holds the
    * two-label normal suffixes (`co.uk`), `wild(1)` the one-label
    * wildcard PARENTS (`ck` for `*.ck`), `exc(3)` the three-label
    * exception names (`city.kawasaki.jp` for `!city.kawasaki.jp`).
    * Lists are sorted so both engines' generated lookups are
    * byte-stable run over run. */
  final case class Rules(norm: Map[Int, Seq[String]],
                         wild: Map[Int, Seq[String]],
                         exc: Map[Int, Seq[String]]) {
    /** Longest public-suffix label count any rule can produce — a
      * normal rule's own length, or a wildcard parent's + 1. */
    val maxSuffixLen: Int =
      (norm.keys ++ wild.keys.map(_ + 1)).max
  }

  lazy val rules: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null,
      "bundled /graft/public_suffix_list.dat missing from resources")
    val raw =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val entries = raw.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.split("\\s+")(0).toLowerCase(java.util.Locale.ROOT))
    def labels(s: String): Int = s.count(_ == '.') + 1
    def byLen(vs: Seq[String]): Map[Int, Seq[String]] =
      vs.distinct.groupBy(labels).map { case (k, v) => k -> v.sorted }
    val (excRaw, rest) = entries.partition(_.startsWith("!"))
    val (wildRaw, normRaw) = rest.partition(_.startsWith("*."))
    val r = Rules(byLen(normRaw), byLen(wildRaw.map(_.stripPrefix("*."))),
      byLen(excRaw.map(_.stripPrefix("!"))))
    // sanity: the parse found both sections and every class the
    // lookup generation assumes; a truncated resource fails loudly
    // here, not as silently-wrong domains
    require(r.norm.getOrElse(1, Nil).size > 1000 &&
      r.norm.getOrElse(2, Nil).size > 3000 &&
      r.wild.nonEmpty && r.exc.nonEmpty,
      s"public_suffix_list.dat parse looks truncated: " +
        s"norm=${r.norm.view.mapValues(_.size).toMap} " +
        s"wild=${r.wild.view.mapValues(_.size).toMap} " +
        s"exc=${r.exc.view.mapValues(_.size).toMap}")
    // the SQL-literal safety the oracle generation relies on
    entries.foreach(e => require(!e.contains("'") && !e.contains("\\"),
      s"PSL entry '$e' is unsafe for SQL literal generation"))
    r
  }

  /** The `([^.]+[.][^.]+...)$` last-K-labels pattern — ONE generator
    * shared by the Column side and the oracle SQL so the two engines
    * can never disagree on label slicing. Group 1 is the whole match
    * (no nested groups). */
  def lastKPattern(k: Int): String =
    "([^.]+" + "[.][^.]+" * (k - 1) + ")$"
}
