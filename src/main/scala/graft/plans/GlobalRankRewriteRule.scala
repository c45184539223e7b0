package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a global-window `row_number()` (empty
  * PARTITION BY — the plan Spark executes by moving EVERY row to one
  * task) into a fully parallel range-sorted sequence, transparently.
  *
  * Fires only on `Window` nodes whose window expressions are exactly one
  * `row_number()` with an empty partition spec (`ntile`/`percent_rank`/
  * aggregates are left untouched — their two-pass forms exist in
  * [[graft.operators.GlobalRank]] but the API caller opts in
  * explicitly). Rewritten shape:
  *
  *   child
  *     → Sort(orderSpec, global)            (range shuffle + local sort)
  *     → AttachDistributedSequence(__seq)   (0-based contiguous index)
  *     → Project(child.* , __seq + 1 AS <orig rank attr>)
  *
  * `AttachDistributedSequence` is Spark's own distributed-sequence
  * operator (`SparkStrategies.BasicOperators` plans it to
  * `AttachDistributedSequenceExec`, which pins ONE materialization of
  * the sorted child — `localCheckpoint` + `zipWithIndex` — then offsets
  * each partition by the total count of earlier partitions). Because
  * ranks and offsets derive from the SAME materialized stage, no
  * exchange-reuse, range-bound-sampling, or AQE-coalescing divergence
  * can ever split them: an earlier two-branch formulation of this
  * rewrite relied on both join branches canonicalizing to one exchange,
  * which column pruning silently broke whenever the query selected a
  * non-sort column. Single lineage removes that failure mode entirely,
  * so the rewrite needs no determinism or conf preconditions.
  *
  * The rank attribute keeps the ORIGINAL exprId, so everything
  * downstream resolves unchanged. Registered via
  * [[graft.GraftExtensions]] (injectOptimizerRule) — sessions without
  * the extension keep stock planning.
  *
  * Scale note: the pinned materialization caches the sorted data on
  * executors (memory, spilling to disk) for the duration of the two
  * internal jobs — bounded, parallel, and strictly cheaper than the
  * stock plan's alternative of sorting the entire input on one task.
  */
class GlobalRankRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w @ Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(Nil, _, _)), _)),
        Nil, orderSpec, child, _)
        if w.resolved && orderSpec.nonEmpty =>
      rewrite(alias, orderSpec, child)
  }

  private def rewrite(orig: Alias, orderSpec: Seq[SortOrder],
                      child: LogicalPlan): LogicalPlan = {
    val seq = AttributeReference("__grr_seq", LongType, nullable = false)()
    val sorted = Sort(orderSpec, global = true, child)
    // EliminateSorts cannot drop this sort: its recursive removal only
    // descends through Project/Filter/Repartition, and
    // AttachDistributedSequence is none of those — the sequence stays
    // ordered even under an order-insensitive parent (agg/join).
    val attached = AttachDistributedSequence(seq, sorted)
    val rank = Alias(
      Cast(Add(seq, Literal(1L)), IntegerType), orig.name)(exprId = orig.exprId)
    Project(child.output :+ rank, attached)
  }
}
