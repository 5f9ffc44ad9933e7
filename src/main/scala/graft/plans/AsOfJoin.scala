package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Whole-operator extension (SURVEY §2.9 option (c)): a NATIVE as-of
  * join — custom LogicalPlan + optimizer Rule + SparkStrategy +
  * SparkPlan, all injected through the public SparkSessionExtensions
  * API.
  *
  * Semantics (DuckDB `ASOF LEFT JOIN` / pandas `merge_asof`): for each
  * left row, the single right row with equal key and the greatest
  * right-time ≤ left-time; unmatched left rows keep null right columns.
  *
  * Physical shape: both sides hash-partitioned on the key and sorted
  * (key, time) — EnsureRequirements inserts exactly the exchanges a
  * sort-merge join would get — then ONE forward-only merge pass per
  * co-partition: O(|L|+|R|), no window state, no union of the two
  * streams (the composed alternative in operators.Temporal), and at
  * 100 TB the same partitioning story as any sort-merge join.
  *
  * User API: `left.join(right, asof_cond(lk, rk, lt, rt), "left")` —
  * the marker predicate never executes; the optimizer rule rewrites
  * the marked join into [[AsOfJoinPlan]] before planning.
  */
case class AsOfCondExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == second.dataType && third.dataType == fourth.dataType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "asof_cond expects (key, key, time, time) with matching types, got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType}, ${fourth.dataType})")
  private def unplanned: Nothing =
    throw new UnsupportedOperationException(
      "asof_cond is a marker predicate; the AsOfJoinRewrite rule must replace it " +
        "before execution (is GraftExtensions installed, and the join type LEFT?)")
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = unplanned
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    unplanned
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q)
}

/** Logical as-of join: left columns + nullable right columns. */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan = copy(left = l, right = r)
}

/** Optimizer rule: marked LEFT join → AsOfJoinPlan. Runs in the
  * user-rule batch (post main optimization, pre planning).
  */
object AsOfJoinRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Join(l, r, LeftOuter, Some(AsOfCondExpr(lk, rk, lt, rt)), _)
        if lk.references.subsetOf(l.outputSet) && rk.references.subsetOf(r.outputSet)
          && lt.references.subsetOf(l.outputSet) && rt.references.subsetOf(r.outputSet) =>
      AsOfJoinPlan(l, r, lk, rk, lt, rt)
  }
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned (key-clustered), per-partition
  * forward merge over (key, time)-sorted inputs.
  */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // forward-only right cursor; the latest consumed right row per
      // current key is the candidate match
      var rNext: InternalRow = null
      var curMatch: InternalRow = null
      var curMatchKey: Any = null
      def advanceRight(): Unit =
        rNext = if (rIter.hasNext) rIter.next() else null
      advanceRight()
      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        if (lk != null && lt != null) {
          var continue = rNext != null
          while (continue) {
            val rk = rKeyB.eval(rNext)
            val rt = rTimeB.eval(rNext)
            val cmp = if (rk == null) -1 else keyOrd.asInstanceOf[Ordering[Any]].compare(rk, lk)
            // null right times are non-matches (DuckDB ASOF semantics)
            // but must still be consumed: Ascending sorts them to the
            // head of their key group, and leaving one unconsumed would
            // block every later valid right row for that key.
            if (cmp < 0 ||
              (cmp == 0 && (rt == null
                || timeOrd.asInstanceOf[Ordering[Any]].compare(rt, lt) <= 0))) {
              if (cmp == 0 && rt != null) {
                curMatch = rNext.copy() // iterator reuses row objects
                curMatchKey = rk
              }
              advanceRight()
              continue = rNext != null
            } else continue = false
          }
        }
        val matched = lk != null && curMatch != null &&
          keyOrd.asInstanceOf[Ordering[Any]].compare(curMatchKey, lk) == 0
        proj(joiner(lRow, if (matched) curMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(left = l, right = r)
}
