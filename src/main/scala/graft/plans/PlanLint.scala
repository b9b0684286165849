package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{LocalLimitExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Runtime PLAN LINTER — the engine's own "would this survive 100×"
  * audit ([[graft.PlanAuditSpec]] gates every registered query with
  * it) exposed as a library API, so users can gate THEIR queries the
  * same way before a 100 TB run: `PlanLint.lint(df)` inspects the
  * compiled physical plan (nothing executes) and returns the
  * scale-killers by kind. CI usage is one assert:
  * `assert(PlanLint.lint(df).isEmpty)`.
  *
  * Checks (each a class of plan, not a heuristic on strings):
  *  - `cartesian`: a `CartesianProduct` — an equi-join key was lost;
  *    |L|×|R| rows at the reducers.
  *  - `bnl-join`: a `BroadcastNestedLoopJoin` — every broadcast row
  *    tested against every stream row; legitimate only against a
  *    provably tiny side (1-row aggregates, bounded query sets), which
  *    the caller allow-lists by catching the finding.
  *  - `single-partition-exchange`: an `Exchange` to `SinglePartition`
  *    whose input is NOT already reduced — the whole dataset funnels
  *    through ONE task (the classic un-partitioned `Window.orderBy`
  *    shape). Exchanges fed by a PARTIAL aggregate or a local limit
  *    are exempt: only per-partition buffers / ≤limit rows cross
  *    them, the healthy global-aggregate and global-limit plans.
  *    (A global `orderBy` plans a RANGE exchange — scalable, and
  *    deliberately not flagged; `TakeOrderedAndProject` top-k
  *    triggers nothing either.)
  *
  * The linter reads through AQE roots (the initial plan — AQE can
  * improve it at runtime but never introduces these shapes). */
object PlanLint {

  final case class Finding(kind: String, operator: String) {
    override def toString: String = s"[$kind] $operator"
  }

  /** Lint the query's compiled physical plan; empty = clean. */
  def lint(df: DataFrame): Seq[Finding] =
    collectPlan(df.queryExecution.executedPlan).flatMap { p =>
      val name = p.getClass.getSimpleName
      p match {
        case _ if name.contains("CartesianProduct") =>
          Some(Finding("cartesian", p.nodeName))
        case _ if name.contains("BroadcastNestedLoopJoin") =>
          Some(Finding("bnl-join", p.nodeName))
        case e: ShuffleExchangeLike
            if e.outputPartitioning == SinglePartition &&
              !inputAlreadyReduced(e.child) =>
          Some(Finding("single-partition-exchange", p.nodeName))
        case _ => None
      }
    }

  /** True when only reduced data crosses the exchange: a PARTIAL
    * aggregate (per-partition buffers) or a local limit (≤limit rows
    * per partition) directly below it. */
  private def inputAlreadyReduced(child: SparkPlan): Boolean = child match {
    case agg: BaseAggregateExec =>
      agg.aggregateExpressions.nonEmpty &&
        agg.aggregateExpressions.forall(e =>
          e.mode == Partial || e.mode == PartialMerge)
    case _: LocalLimitExec => true
    case _ => false
  }

  /** Pre-order walk that descends into AQE roots (whose `children` is
    * empty — the plan hangs off the node itself) AND into subquery
    * expression plans (a cartesian hiding inside `WHERE x > (SELECT
    * …)` lives in `subqueries`, not `children`). `executedPlan`, not
    * `inputPlan`, for AQE: the input predates `EnsureRequirements`, so
    * it contains NO exchange nodes yet and the single-partition check
    * would never fire. */
  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: collectPlan(a.executedPlan)
    case _ =>
      p +: (p.children ++ p.subqueries).flatMap(collectPlan)
  }
}
