package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite a global-window `row_number()` (empty
  * PARTITION BY — the plan Spark executes by moving EVERY row to one
  * task) into the range-partitioned two-pass rank of
  * [[graft.operators.GlobalRank]], transparently.
  *
  * Fires only on `Window` nodes whose window expressions are exactly one
  * `row_number()` with an empty partition spec (`ntile`/`percent_rank`/
  * aggregates are left untouched — their two-pass forms exist in
  * `GlobalRank` but the API caller opts in explicitly). Rewritten shape:
  *
  *   child
  *     → RepartitionByExpression(orderSpec)        (range shuffle)
  *     → Project(+ __pid = spark_partition_id)
  *     → Window(row_number PARTITION BY __pid)     (parallel local rank)
  *     ⋈ broadcast( Aggregate(__pid → count)       (metadata-scale)
  *                  → Window(running sum → __off) )
  *     → Project(child.* , __off + __lrn AS <orig rank attr>)
  *
  * The counts branch re-reads the range-partitioned child — identical
  * exchange on both branches, so AQE's exchange reuse materializes it
  * once. The rank attribute keeps the ORIGINAL exprId, so everything
  * downstream resolves unchanged. Registered via
  * [[graft.GraftExtensions]] (injectOptimizerRule) — sessions without
  * the extension keep stock planning.
  */
class GlobalRankRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w @ Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(Nil, _, _)), _)),
        Nil, orderSpec, child, _)
        if w.resolved && orderSpec.nonEmpty && safeToDuplicate(child) =>
      rewrite(alias, orderSpec, child)
  }

  /** The rewrite instantiates `child` under BOTH join branches; they must
    * materialize identically. Exchange reuse (default on) collapses the
    * two identical range exchanges into one, and a deterministic child
    * guarantees identical content even if reuse is missed — a
    * nondeterministic source (sample/rand) could otherwise feed the two
    * branches different rows and silently corrupt the ranks, so those
    * plans keep the stock single-task window. */
  private def safeToDuplicate(child: LogicalPlan): Boolean =
    conf.exchangeReuseEnabled &&
      child.find(p => p.expressions.exists(e => !e.deterministic)).isEmpty

  private def rewrite(orig: Alias, orderSpec: Seq[SortOrder],
                      child: LogicalPlan): LogicalPlan = {
    val rowFrame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

    // main branch: range partition → pid → parallel local row_number
    val pidL = Alias(SparkPartitionID(), "__grr_pid")()
    val rangedL = RepartitionByExpression(orderSpec, child, None)
    val withPidL = Project(child.output :+ pidL, rangedL)
    val lrn = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(Seq(pidL.toAttribute), orderSpec, rowFrame)), "__grr_lrn")()
    val localWin = Window(Seq(lrn), Seq(pidL.toAttribute), orderSpec, withPidL)

    // counts branch: same range shuffle (AQE reuses the exchange),
    // per-pid counts, running-sum offsets — all over #partitions rows
    val pidR = Alias(SparkPartitionID(), "__grr_pid_r")()
    val rangedR = RepartitionByExpression(orderSpec, child, None)
    val withPidR = Project(child.output :+ pidR, rangedR)
    val cnt = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "__grr_cnt")()
    val agg = Aggregate(Seq(pidR.toAttribute), Seq(pidR.toAttribute, cnt), withPidR)
    val offFrame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1))
    val offSum = Alias(WindowExpression(
      AggregateExpression(Sum(cnt.toAttribute), Complete, isDistinct = false),
      WindowSpecDefinition(Nil, Seq(SortOrder(pidR.toAttribute, Ascending)), offFrame)),
      "__grr_off")()
    val offWin = Window(Seq(offSum), Nil,
      Seq(SortOrder(pidR.toAttribute, Ascending)), agg)
    val offsets = Project(Seq(pidR.toAttribute, offSum.toAttribute), offWin)

    // broadcast join back + global rank under the ORIGINAL exprId
    val join = Join(localWin, offsets, Inner,
      Some(EqualTo(pidL.toAttribute, pidR.toAttribute)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
    val rank = Alias(
      Cast(Add(Coalesce(Seq(offSum.toAttribute, Literal(0L))),
        Cast(lrn.toAttribute, org.apache.spark.sql.types.LongType)), IntegerType),
      orig.name)(exprId = orig.exprId)
    Project(child.output :+ rank, join)
  }
}
