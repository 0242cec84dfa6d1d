package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{AnalysisException, Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit

import graft.core.SpaceDataset

/** SQL row-level parity for graft tables: resolves `UPDATE graft.t SET …`
  * and `MERGE INTO graft.t USING …` into commands that run the SAME
  * copy-on-write machinery as the Scala API ([[SpaceDataset.update]] /
  * [[SpaceDataset.merge]]) — one snapshot, DELETE+ADD change encoding,
  * optimistic transaction. `DELETE FROM graft.t` already works through
  * DSv2 `SupportsDelete`; this closes the gap where a SQL user could
  * delete but not update or merge.
  *
  * The rule is injected by [[graft.GraftExtensions]]
  * (`injectResolutionRule`), so it fires inside the analyzer's main
  * resolution batch, before Spark's own row-level rewrites would reject
  * the plan for not implementing `SupportsRowLevelOperations`. The
  * delegation keeps the SQL and API surfaces byte-identical in behavior
  * instead of maintaining a second rewrite engine.
  *
  * Supported MERGE shape (what [[graft.core.MergeBuilder]] executes; the
  * reference engine has no SQL surface, so the bar is internal
  * consistency):
  *   - `ON` must equate all of the target's primary keys with same-named
  *     source columns (graft merges key by PRIMARY KEY);
  *   - `WHEN MATCHED [AND cond] THEN DELETE` — cond over SOURCE columns;
  *   - `WHEN MATCHED THEN UPDATE SET *` — replace matched rows with the
  *     source row (general per-column assignments need the row-level API);
  *   - `WHEN NOT MATCHED THEN INSERT *` / explicit all-column inserts;
  *   - `WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE` and
  *     `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET c = expr`
  *     — conditions and values over TARGET columns (there is no source
  *     row); DELETE is evaluated before UPDATE.
  * Anything else raises a clear AnalysisException instead of silently
  * changing semantics.
  */
case class GraftRowLevelSqlRule(session: SparkSession) extends Rule[LogicalPlan] {

  import GraftRowLevelSql._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      graftTableOf(target) match {
        case Some(t) =>
          requireMutable(t, "UPDATE")
          // assignment keys are attributes or struct-member accesses
          // (SET meta.b = …) — flatten the latter to the dotted logical
          // path the API's update() takes
          def keyPath(e: Expression): Option[String] = ColumnExpr.dottedPath(e)
          // standard SQL rejects duplicate assignment targets; silently
          // collapsing them (toMap, last wins) would execute invalid SQL
          // with arbitrary pick-the-last semantics
          val targetPaths = assignments.flatMap(a => keyPath(a.key))
          val dups = targetPaths.diff(targetPaths.distinct).distinct
          if (dups.nonEmpty)
            fail(s"duplicate UPDATE assignment target(s): ${dups.mkString(", ")}")
          val assigns = assignments.flatMap { a =>
            val name = keyPath(a.key).getOrElse(
              fail(s"unsupported UPDATE assignment target: ${a.key}"))
            // alignment may add identity assignments (col = col) for
            // unmentioned columns — including primary keys, which the
            // API path rightly refuses to assign. Drop the no-ops
            // (top-level and member-level alike).
            if (keyPath(a.value).contains(name)) None
            else Some(name -> a.value)
          }
          // every SET was an identity no-op (e.g. SET x = x): still valid
          // SQL — rewrite the matched rows unchanged (one snapshot,
          // DELETE+ADD change encoding, like any other UPDATE) via an
          // identity assignment on a non-key column
          val effective =
            if (assigns.nonEmpty) assigns.map { case (n, v) => n -> asColumn(v) }
            else {
              val pks = t.dataset.primaryKeys.toSet
              val nonPk = t.dataset.schema.fieldNames.find(!pks.contains(_))
                .getOrElse(fail("UPDATE with no effective assignment on an " +
                  "all-primary-key table"))
              Seq(nonPk -> ColumnExpr.column(UnresolvedAttribute.quoted(nonPk)))
            }
          GraftUpdateCommand(new GraftUpdateSpec(t.dataset,
            condition.map(asColumn), effective))
        case None => u
      }

    case m: MergeIntoTable if m.resolved && graftTableOf(m.targetTable).isDefined =>
      buildMergeCommand(m, graftTableOf(m.targetTable).get)
  }

  private def buildMergeCommand(m: MergeIntoTable, t: GraftTable): LogicalPlan = {
    requireMutable(t, "MERGE")
    if (m.withSchemaEvolution)
      fail("MERGE WITH SCHEMA EVOLUTION is not supported on graft tables")

    val ds = t.dataset
    val sourceOut = m.sourceTable.outputSet
    val targetOut = m.targetTable.outputSet

    // ON must equate every primary key with a same-named source column:
    // graft MERGE keys by primary key (DmlOps.merge joins by PK name)
    val pks = ds.primaryKeys.toSet
    val conjuncts = splitConjuncts(m.mergeCondition)
    val equated = conjuncts.map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (tAttr, sAttr) =
          if (targetOut.contains(a) && sourceOut.contains(b)) (a, b)
          else if (targetOut.contains(b) && sourceOut.contains(a)) (b, a)
          else fail(s"MERGE ON must compare a target column with a source column: $a = $b")
        if (tAttr.name != sAttr.name)
          fail(s"MERGE ON must equate same-named columns (graft merges by " +
            s"primary key): ${tAttr.name} = ${sAttr.name}")
        tAttr.name
      case other =>
        fail(s"MERGE ON supports only equality conjuncts on the primary keys, got: $other")
    }.toSet
    if (equated != pks)
      fail(s"MERGE ON must equate exactly the primary keys " +
        s"(${pks.mkString(", ")}), got: ${equated.mkString(", ")}")

    var deleteCond: Option[Column] = None
    var doUpdate = false
    m.matchedActions.foreach {
      case DeleteAction(cond) =>
        if (deleteCond.isDefined || doUpdate)
          fail("graft MERGE supports one DELETE clause, evaluated before UPDATE")
        cond.foreach { c =>
          if (!c.references.subsetOf(sourceOut))
            fail(s"the MATCHED … DELETE condition must reference only source columns: $c")
        }
        deleteCond = Some(cond.map(asColumn).getOrElse(lit(true)))
      case UpdateAction(cond, assignments, _) =>
        if (doUpdate) fail("graft MERGE supports a single UPDATE clause")
        cond.foreach(c => fail(s"WHEN MATCHED AND <cond> THEN UPDATE is not " +
          s"supported (only a conditional DELETE before it): $c"))
        assignments.foreach(requireStarAssignment(_, sourceOut, "UPDATE SET"))
        requireFullCoverage(assignments, m.targetTable, "UPDATE SET")
        doUpdate = true
      case other => fail(s"unsupported MATCHED action for graft MERGE: $other")
    }
    var doInsert = false
    m.notMatchedActions.foreach {
      case InsertAction(cond, assignments) =>
        cond.foreach(c => fail(s"conditional NOT MATCHED INSERT is not supported: $c"))
        assignments.foreach(requireStarAssignment(_, sourceOut, "INSERT"))
        requireFullCoverage(assignments, m.targetTable, "INSERT")
        doInsert = true
      case other => fail(s"unsupported NOT MATCHED action for graft MERGE: $other")
    }

    // NOT MATCHED BY SOURCE: target rows with no matching source row —
    // one optional DELETE (evaluated first) and one optional UPDATE,
    // both over TARGET columns only (there is no source row to read)
    var nmbsDelete: Option[Column] = None
    var nmbsUpdate: Option[(Column, Seq[(String, Column)])] = None
    m.notMatchedBySourceActions.foreach {
      case DeleteAction(cond) =>
        if (nmbsDelete.isDefined || nmbsUpdate.isDefined)
          fail("graft MERGE supports one NOT MATCHED BY SOURCE DELETE clause, " +
            "evaluated before the UPDATE clause")
        cond.foreach { c =>
          if (!c.references.subsetOf(targetOut))
            fail(s"the NOT MATCHED BY SOURCE condition must reference only " +
              s"target columns: $c")
        }
        nmbsDelete = Some(cond.map(asColumn).getOrElse(lit(true)))
      case UpdateAction(cond, assignments, _) =>
        if (nmbsUpdate.isDefined)
          fail("graft MERGE supports a single NOT MATCHED BY SOURCE UPDATE clause")
        cond.foreach { c =>
          if (!c.references.subsetOf(targetOut))
            fail(s"the NOT MATCHED BY SOURCE condition must reference only " +
              s"target columns: $c")
        }
        val pks = ds.primaryKeys.toSet
        val assigns = assignments.flatMap { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => fail(s"NOT MATCHED BY SOURCE UPDATE of a nested field " +
              s"is not supported: $other")
          }
          if (!a.value.references.subsetOf(targetOut))
            fail(s"NOT MATCHED BY SOURCE UPDATE values must reference only " +
              s"target columns (there is no source row): ${a.value}")
          // alignment pads unmentioned columns with identity (col = col)
          // — including primary keys, which may not be assigned
          a.value match {
            case v: AttributeReference if v.name == name => None
            case v =>
              if (pks.contains(name)) fail(s"cannot update primary key $name")
              Some(name -> asColumn(v))
          }
        }
        if (assigns.isEmpty)
          fail("NOT MATCHED BY SOURCE UPDATE with no effective assignment")
        nmbsUpdate = Some((cond.map(asColumn).getOrElse(lit(true)), assigns))
      case other => fail(s"unsupported NOT MATCHED BY SOURCE action: $other")
    }

    if (deleteCond.isEmpty && !doUpdate && !doInsert &&
        nmbsDelete.isEmpty && nmbsUpdate.isEmpty)
      fail("graft MERGE requires at least one WHEN clause")

    GraftMergeCommand(new GraftMergeSpec(ds, m.sourceTable, deleteCond, doUpdate,
      doInsert, nmbsDelete, nmbsUpdate))
  }

  /** Every aligned assignment must be `target.col = source.col` of the
    * same name — the SET * / INSERT * shape the merge machinery executes
    * (it replaces matched rows with the SOURCE row wholesale). */
  private def requireStarAssignment(
      a: Assignment,
      sourceOut: org.apache.spark.sql.catalyst.expressions.AttributeSet,
      what: String): Unit = {
    val name = a.key match {
      case ar: AttributeReference => ar.name
      case other => fail(s"$what of a nested field is not supported: $other")
    }
    a.value match {
      case v: AttributeReference if sourceOut.contains(v) && v.name == name => ()
      case v => fail(s"graft MERGE $what supports only the star form " +
        s"(every column set to the same-named source column); " +
        s"column $name was set to $v — use the SpaceDataset API for general updates")
    }
  }

  /** The assignment set must name EVERY target column: the merge
    * machinery replaces matched rows (and builds inserted rows) from
    * the source row WHOLESALE, so a partial list that passed the
    * per-assignment star check would silently overwrite the
    * unmentioned columns with source values — Spark's coercion-only
    * resolution for non-SupportsRowLevelOperations tables never pads
    * assignments to full coverage, so it reaches us as written. */
  private def requireFullCoverage(
      assigns: Seq[Assignment], target: LogicalPlan, what: String): Unit = {
    val assigned = assigns.flatMap(a => a.key match {
      case ar: AttributeReference => Some(ar.name)
      case _ => None
    }).toSet
    val all = target.output.map(_.name).toSet
    val missing = all -- assigned
    if (missing.nonEmpty)
      fail(s"graft MERGE $what must cover every target column (matched rows " +
        s"are replaced with the source row wholesale — an unmentioned column " +
        s"would NOT keep its value); missing: ${missing.toSeq.sorted.mkString(", ")}. " +
        "Use SET * / INSERT *, or the SpaceDataset API for partial updates")
  }

  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3100", messageParameters = Map("message" -> msg))

  private def requireMutable(t: GraftTable, op: String): Unit = {
    if (t.isPinned) fail(s"$op: cannot mutate a time-travel (pinned) table")
    if (t.dataset.storage.recordFields.nonEmpty)
      fail(s"$op: tables with record fields take mutations through the " +
        "SpaceDataset API (SQL would need payload stitching)")
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Resolved expressions carry attribute ids bound to THIS plan; the
    * command re-reads the table, so rebind by NAME. */
  private def asColumn(e: Expression): Column =
    ColumnExpr.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  private def graftTableOf(plan: LogicalPlan): Option[GraftTable] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => Some(t)
      case _ => None
    }
    case SubqueryAlias(_, child) => graftTableOf(child)
    case _ => None
  }
}

object GraftRowLevelSql {

  /** Plain holders (NOT case classes): their Expression/plan contents
    * must stay invisible to QueryPlan's product scanning, or the command
    * would look unresolved to the analyzer. */
  final class GraftUpdateSpec(
      val ds: SpaceDataset,
      val cond: Option[Column],
      val assigns: Seq[(String, Column)])

  final class GraftMergeSpec(
      val ds: SpaceDataset,
      val sourcePlan: LogicalPlan,
      val deleteCond: Option[Column],
      val doUpdate: Boolean,
      val doInsert: Boolean,
      val nmbsDelete: Option[Column] = None,
      val nmbsUpdate: Option[(Column, Seq[(String, Column)])] = None)

  case class GraftUpdateCommand(spec: GraftUpdateSpec) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      spec.ds.update(spec.cond.getOrElse(lit(true)), spec.assigns.toMap)
      Nil
    }
  }

  case class GraftMergeCommand(spec: GraftMergeSpec) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Nil
    override def run(session: SparkSession): Seq[Row] = {
      val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val source = org.apache.spark.sql.classic.Dataset.ofRows(classic, spec.sourcePlan)
      var b = spec.ds.merge(source)
      spec.deleteCond.foreach(c => b = b.whenMatchedDelete(c))
      if (spec.doUpdate) b = b.whenMatchedUpdate()
      if (spec.doInsert) b = b.whenNotMatchedInsert()
      spec.nmbsDelete.foreach(c => b = b.whenNotMatchedBySourceDelete(c))
      spec.nmbsUpdate.foreach { case (c, as) =>
        b = b.whenNotMatchedBySourceUpdate(as.toMap, c)
      }
      b.execute()
      Nil
    }
  }
}
