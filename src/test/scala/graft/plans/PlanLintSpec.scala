package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The linter must flag each scale-killer class on a plan that
  * genuinely contains it, and stay silent on the healthy twin. */
class PlanLintSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("source"), col("n_chars"))

  test("flags a cartesian product; silent on the equi join") {
    val other = docs.select(col("doc_id").as("id2"))
    // shuffle_replicate_nl blocks the broadcast fallback: a small side
    // would otherwise plan as BNLJ (the OTHER finding) and a true
    // CartesianProduct would never appear at test scale
    val cart = docs.hint("shuffle_replicate_nl").crossJoin(other)
    assert(PlanLint.lint(cart).exists(_.kind == "cartesian"))
    val equi = docs.join(other, col("doc_id") === col("id2"))
    assert(!PlanLint.lint(equi).exists(_.kind == "cartesian"))
  }

  test("flags a broadcast nested-loop join; silent on the broadcast equi join") {
    val dim = docs.select(col("n_chars").as("lo")).limit(3)
    val bnl = docs.join(broadcast(dim), col("n_chars") > col("lo"))
    assert(PlanLint.lint(bnl).exists(_.kind == "bnl-join"))
    val equi = docs.join(broadcast(docs.select(col("doc_id").as("id2"))),
      col("doc_id") === col("id2"))
    assert(!PlanLint.lint(equi).exists(_.kind == "bnl-join"))
  }

  test("flags the global-window single-partition exchange; silent on partitioned windows and top-k") {
    val global = docs.withColumn("r",
      row_number().over(Window.orderBy(col("doc_id"))))
    assert(PlanLint.lint(global)
      .exists(_.kind == "single-partition-exchange"))
    val partitioned = docs.withColumn("r",
      row_number().over(Window.partitionBy(col("source")).orderBy(col("doc_id"))))
    assert(!PlanLint.lint(partitioned)
      .exists(_.kind == "single-partition-exchange"))
    // top-k via sort+limit plans TakeOrderedAndProject — no exchange
    val topk = docs.orderBy(col("n_chars").desc).limit(5)
    assert(PlanLint.lint(topk).isEmpty, PlanLint.lint(topk).mkString(", "))
  }

  test("healthy single-partition shapes are exempt: global aggregate and global limit") {
    // partial buffers cross the exchange, not the dataset
    val globalAgg = docs.agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
    assert(PlanLint.lint(globalAgg).isEmpty,
      PlanLint.lint(globalAgg).mkString(", "))
    // LocalLimit bounds what crosses; the dim side of the BNL test
    // used exactly this shape
    val limited = docs.limit(3)
    assert(!PlanLint.lint(limited).exists(_.kind == "single-partition-exchange"))
    // …but the exemption is itself bounded: a huge limit is a global
    // collect wearing a limit costume (ADVICE r05) and must lint dirty
    // in BOTH physical shapes — terminal (CollectLimit, no Exchange
    // node at all) and mid-plan (Exchange SinglePartition over
    // LocalLimit)
    val hugeTerminal = docs.limit(100000000)
    assert(PlanLint.lint(hugeTerminal).exists(_.kind == "single-partition-exchange"),
      "terminal limit(100M) must flag the CollectLimit funnel")
    val hugeMidPlan = docs.limit(100000000).groupBy(col("source")).count()
    assert(PlanLint.lint(hugeMidPlan).exists(_.kind == "single-partition-exchange"),
      "mid-plan limit(100M) above MaxExemptLocalLimit must flag the funnel")
    // and the bound is the caller's knob
    assert(!PlanLint.lint(hugeTerminal, maxExemptLimit = Int.MaxValue)
      .exists(_.kind == "single-partition-exchange"))
    assert(!PlanLint.lint(hugeMidPlan, maxExemptLimit = Int.MaxValue)
      .exists(_.kind == "single-partition-exchange"))
  }

  test("scale-killers inside subquery expressions are found") {
    docs.createOrReplaceTempView("lint_docs")
    val q = spark.sql(
      """SELECT * FROM lint_docs
        |WHERE n_chars > (SELECT MIN(a.n_chars + b.id2) FROM lint_docs a
        |  JOIN (SELECT doc_id AS id2 FROM lint_docs) b)""".stripMargin)
    assert(PlanLint.lint(q).exists(f =>
      f.kind == "cartesian" || f.kind == "bnl-join"),
      PlanLint.lint(q).mkString(", "))
  }

  test("RegistryAudit policy: exemptions bind to the NAMED query and kind, cartesians never exempt") {
    // the shared policy object is what both PlanAuditSpec and Bench
    // enforce — its filtering logic needs direct gates of its own:
    //  - a BNLJ under an allow-listed name passes; the SAME plan under
    //    a non-listed name is a finding;
    //  - a cartesian is a finding even under a BNLJ-allow-listed name
    //    (no kind leakage between exemption maps);
    //  - localResult names skip the lint entirely.
    val other = docs.select(col("doc_id").as("id2"))
    val bnl = docs.crossJoin(broadcast(other.limit(1)))
    assert(graft.plans.PlanLint.lint(bnl).exists(_.kind == "bnl-join"),
      "fixture must actually plan a BNLJ")
    assert(RegistryAudit.unexempt("ea18_funnel", bnl).isEmpty,
      "allow-listed name must exempt its BNLJ")
    assert(RegistryAudit.unexempt("not_a_registered_name", bnl)
      .exists(_.kind == "bnl-join"),
      "non-listed name must surface the BNLJ")
    val cart = docs.hint("shuffle_replicate_nl").crossJoin(other)
    assert(RegistryAudit.unexempt("ea18_funnel", cart)
      .exists(_.kind == "cartesian"),
      "a cartesian must never be exempt, whatever the name's other exemptions")
    assert(RegistryAudit.unexempt("txt_bpe_merges", cart).isEmpty,
      "localResult names skip the audit (their plan is a LocalRelation in registry use)")
    // every exemption key must point at a REAL registered query — a
    // renamed query must not leave a stale exemption silently exempting
    // nothing (or worse, a future query inheriting the old name's pass)
    val registered = graft.SparkEntry.queries.keySet
    val stale = (RegistryAudit.bnlAllowed.keySet ++
      RegistryAudit.singlePartitionAllowed.keySet ++
      RegistryAudit.localResult) -- registered
    assert(stale.isEmpty, s"exemptions for unregistered queries: $stale")
  }

  test("registered healthy queries lint clean") {
    assert(PlanLint.lint(
      graft.queries.Relational.q2RegionRevenue(spark, sf)).isEmpty)
    assert(PlanLint.lint(
      graft.queries.Relational.q10TopPartsPerSupplier(spark, sf)).isEmpty)
  }
}
