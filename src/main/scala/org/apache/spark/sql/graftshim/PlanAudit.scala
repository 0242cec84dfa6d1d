package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CollectLimitExec, GenerateExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec, UnionExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Physical-plan audit helpers for the scale-shape specs. Lives in the
  * sql package tree to unwrap AQE and inspect partitioning without the
  * string-matching fragility of `plan.toString` asserts. */
object PlanAudit {

  /** The current physical plan, unwrapped from the AQE root. */
  def physical(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  /** Is this subtree's output cardinality bounded by a limit? A limit
    * node bounds everything below it; ROW-MULTIPLYING nodes between the
    * limit and the consumer void the bound — `explode` fans out
    * data-dependently, a join's output is bounded only when BOTH inputs
    * are, a union when ALL are. (A `collectFirst` for limit nodes
    * anywhere below would false-pass Exchange ← explode ← limit.) */
  private def limitBounded(p: SparkPlan): Boolean = p match {
    // LocalLimit bounds per-partition output to k, so the exchange above
    // it carries ≤ k × partitions rows — the canonical df.limit(k) plan
    // is GlobalLimit ← Exchange(SinglePartition) ← LocalLimit ← scan
    case _: GlobalLimitExec | _: TakeOrderedAndProjectExec |
        _: CollectLimitExec | _: LocalLimitExec => true
    // an UNGROUPED aggregate's partial output is one row per partition
    // — a SinglePartition exchange above it carries ≤ #partitions rows
    // (grouped aggregates shuffle by hashpartitioning, never through
    // this path, so their cardinality needs no proving here)
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
        if a.groupingExpressions.isEmpty => true
    case _: GenerateExec => false // explode: data-dependent fan-out
    case j: BaseJoinExec => limitBounded(j.left) && limitBounded(j.right)
    case u: UnionExec => u.children.forall(limitBounded)
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(limitBounded)
  }

  /** Release the storage blocks behind a `Dataset.localCheckpoint()`
    * result. `Dataset.unpersist` only touches the CacheManager; the
    * checkpointed RDD's blocks live outside it and are otherwise freed
    * only when the RDD is GC'd — an iterative caller (connected
    * components) must release each superseded round eagerly. No-op for
    * frames not directly backed by a checkpointed RDD. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Single-partition shuffles whose input is NOT bounded by a limit
    * below them — the "entire input into one task" shape that a global
    * `Window.orderBy` plans. A SinglePartition exchange sitting ABOVE a
    * `limit(k)` carries ≤ k rows and is scale-safe (ranking a top-k
    * result); one without a limit underneath ships the whole relation
    * into a single task. Empty result = scale-safe plan. */
  def unboundedSinglePartitionExchanges(df: DataFrame): Seq[String] =
    physical(df).collect {
      case e: ShuffleExchangeLike
          if e.outputPartitioning == SinglePartition && !limitBounded(e.child) =>
        e.nodeName + " over " + e.child.nodeName
    }
}
