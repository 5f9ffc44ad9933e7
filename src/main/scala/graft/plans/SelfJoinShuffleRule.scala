package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: identical-subtree self-joins must not broadcast.
  *
  * When a join's two inputs are the SAME subplan (canonicalized
  * equality — the self-join shape every dedup/similarity candidate
  * generator produces), a shuffle join lets the two sides share ONE
  * exchange (ReuseExchange / AQE stage reuse): the subtree is evaluated
  * once. AQE's runtime broadcast conversion breaks exactly that — a
  * BroadcastExchange cannot reuse a shuffle, so the subtree evaluates
  * once per side (measured 2-4× on the r2 dedup pipelines, see
  * BENCH.md). This rule pins NO_BROADCAST_HASH on both sides so the
  * planner — and AQE's re-planning — keep the reusable shuffle.
  *
  * Guarded to non-trivial subtrees (expansion/aggregation/join/window
  * below the join): for a bare scan, re-scanning for a broadcast is
  * cheap and broadcasting may legitimately win; leave those to AQE.
  * Joins that already carry any user hint are left untouched.
  *
  * Injected through the public SparkSessionExtensions API
  * (graft.functions.GraftExtensions) — SURVEY §2.9's "custom Rule"
  * extension point.
  */
object SelfJoinShuffleRule extends Rule[LogicalPlan] {

  private def nonTrivial(p: LogicalPlan): Boolean = p.exists {
    case _: Aggregate | _: Generate | _: Join | _: Window | _: Distinct => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, _, _, JoinHint(None, None))
        if l.canonicalized == r.canonicalized && nonTrivial(l) =>
      val noBhj = Some(HintInfo(strategy = Some(NO_BROADCAST_HASH)))
      j.copy(hint = JoinHint(noBhj, noBhj))
  }
}
