package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Physical-plan audit helpers for the scale-shape specs. Lives in the
  * sql package tree to unwrap AQE and inspect partitioning without the
  * string-matching fragility of `plan.toString` asserts. */
object PlanAudit {

  /** The current physical plan, unwrapped from the AQE root. */
  def physical(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  private def limitBounded(p: SparkPlan): Boolean = p.collectFirst {
    case g: GlobalLimitExec => g
    case t: TakeOrderedAndProjectExec => t
    case c: CollectLimitExec => c
  }.nonEmpty

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
