package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CollectLimitExec, LocalLimitExec, SparkPlan}
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
  *    them, the healthy global-aggregate and global-limit plans —
  *    but the limit itself must be ≤ [[MaxExemptLocalLimit]]: a
  *    `limit(100M)` is a global collect wearing a limit costume.
  *    The TERMINAL-limit twin (`CollectLimitExec`, which has no
  *    Exchange node at all yet funnels every partition into one
  *    task) is held to the same bound.
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

  /** Largest `LocalLimit` that still exempts a single-partition
    * exchange: a top-k funnel is healthy because k is SMALL, and an
    * unbounded exemption would let `limit(100_000_000)` funnel through
    * one task while linting clean. 1M rows/upstream-partition is far
    * above any registered top-k and far below a memory hazard. */
  val MaxExemptLocalLimit: Int = 1000000

  /** Lint the query's compiled physical plan; empty = clean. */
  def lint(df: DataFrame,
           maxExemptLimit: Int = MaxExemptLocalLimit): Seq[Finding] =
    collectPlan(df.queryExecution.executedPlan).flatMap { p =>
      val name = p.getClass.getSimpleName
      p match {
        case _ if name.contains("CartesianProduct") =>
          Some(Finding("cartesian", p.nodeName))
        case _ if name.contains("BroadcastNestedLoopJoin") =>
          Some(Finding("bnl-join", p.nodeName))
        case e: ShuffleExchangeLike
            if e.outputPartitioning == SinglePartition &&
              !inputAlreadyReduced(e.child, maxExemptLimit) =>
          Some(Finding("single-partition-exchange", p.nodeName))
        case c: CollectLimitExec if c.limit > maxExemptLimit ||
              c.limit < 0 =>
          // a TERMINAL limit plans CollectLimit — no Exchange node
          // exists, but all partitions still funnel into one task
          // (and limit(-1)/tail shapes are unbounded outright)
          Some(Finding("single-partition-exchange", p.nodeName))
        case _ => None
      }
    }

  /** True when only reduced data crosses the exchange: a PARTIAL
    * aggregate (per-partition buffers) or a SMALL local limit (≤limit
    * rows per partition, limit itself bounded — see
    * [[MaxExemptLocalLimit]]) directly below it. */
  private def inputAlreadyReduced(child: SparkPlan,
                                  maxExemptLimit: Int): Boolean = child match {
    case agg: BaseAggregateExec =>
      agg.aggregateExpressions.nonEmpty &&
        agg.aggregateExpressions.forall(e =>
          e.mode == Partial || e.mode == PartialMerge)
    case l: LocalLimitExec => l.limit <= maxExemptLimit
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
