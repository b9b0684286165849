package graft

/** Whole-registry physical-plan audit — the "would this survive 100×"
  * check as an executable gate over every SparkEntry query:
  *
  *  - No CartesianProduct anywhere, ever.
  *  - BroadcastNestedLoopJoin only where one side is provably tiny or
  *    the all-pairs shape is the operator's intent; anywhere else it
  *    means an equi-join key was lost and the query would melt at
  *    scale.
  *  - No un-exempt single-partition exchange.
  *
  * The POLICY (finding kinds + per-query exemptions with boundedness
  * reasons) lives in [[graft.plans.RegistryAudit]], shared verbatim
  * with the bench-scale executed-plan gate in [[Bench]] — the
  * test-scale and bench-scale audits can never drift.
  */
class PlanAuditSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (name, _) => graft.plans.RegistryAudit.localResult(name) }
    .foreach { case (name, fn) =>
    test(s"plan audit: $name") {
      // the audit IS the productized linter (graft.plans.PlanLint) —
      // the user-facing API and the registry gate can never drift
      val df = fn(spark, sf)
      val findings = graft.plans.RegistryAudit.unexempt(name, df)
      assert(findings.isEmpty,
        s"$name plans un-exempt scale-killers ${findings.mkString(", ")}:\n" +
          df.queryExecution.executedPlan.toString)
    }
  }
}
