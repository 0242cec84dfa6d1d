package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL-read soundness for merge-on-read delete vectors: a `SELECT` over
  * a graft catalog table whose pinned snapshot carries vectors must not
  * return soft-deleted rows. The DSv2 parquet scan underneath
  * [[GraftTable]] has no row-filter injection point, so this resolution
  * rule swaps the RELATION for the engine's own masked read plan (the
  * V1 `GraftFileIndex` relation + the vector mask filter — the exact
  * plan `SpaceDataset.read` produces), re-aliased onto the original
  * output attribute ids so everything referencing the relation is
  * untouched. Vector-free snapshots — the steady state, since
  * compaction folds vectors in — never match, keeping the DSv2 path
  * (aggregate pushdown, storage-partitioned joins) intact.
  *
  * DML/write targets are skipped: their command machinery routes reads
  * through `scanPhysical`, which masks internally, and Spark's own
  * resolution of DELETE/INSERT needs the raw relation shape.
  */
case class GraftDvMaskRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val hasGraftDv = plan.exists {
      case r: DataSourceV2Relation => needsMask(r)
      case _ => false
    }
    if (!hasGraftDv) return plan

    // relations that sit in a DML-target / write-target position keep
    // their raw shape (identity-collected, so the same table read as a
    // MERGE SOURCE elsewhere in the plan still masks)
    val targets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def mark(p: LogicalPlan): Unit = p.foreach(n => { targets.add(n); () })
    def markTargets(p: LogicalPlan): Unit = p.foreach {
      case u: UpdateTable => mark(u.table)
      case m: MergeIntoTable => mark(m.targetTable)
      case d: DeleteFromTable => mark(d.table)
      case a: AppendData => mark(a.table)
      case o: OverwriteByExpression => mark(o.table)
      case o: OverwritePartitionsDynamic => mark(o.table)
      case _ => ()
    }
    markTargets(plan)

    plan.resolveOperators {
      case r: DataSourceV2Relation if !targets.contains(r) && needsMask(r) =>
        masked(r)
    }
  }

  private def needsMask(r: DataSourceV2Relation): Boolean = r.table match {
    case t: GraftTable =>
      t.dataset.storage.deleteVectors(t.pinnedSnapshotId).nonEmpty
    case _ => false
  }

  private def masked(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftTable]
    // the engine's masked read at the relation's pinned snapshot;
    // referenceRead keeps record fields as address structs — exactly the
    // schema the SQL surface declares for record-field tables
    val df = t.dataset.read(
      version = Some(t.pinnedSnapshotId.toString), referenceRead = true)
    val child = df.queryExecution.analyzed
    require(child.output.length == r.output.length,
      s"dv-mask rewrite arity mismatch for ${t.name()}: " +
        s"${child.output.length} vs ${r.output.length}")
    val aliases: Seq[NamedExpression] = r.output.zip(child.output).map {
      case (orig, n) =>
        Alias(n, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier,
          explicitMetadata = Some(orig.metadata))
    }
    Project(aliases, child)
  }
}
