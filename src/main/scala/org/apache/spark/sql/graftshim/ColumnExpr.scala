package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column.expr`; the converter lives behind
  * `private[sql]`. Standard extension-shim pattern: a tiny bridge inside
  * the `org.apache.spark.sql` package tree exposing Column ↔ Expression
  * for graft's predicate analysis (manifest pruning). */
object ColumnExpr {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Flatten a RESOLVED attribute / GetStructField chain to its dotted
    * path ("meta.price"). Shared by manifest pruning and the SQL
    * row-level rule so member-access flattening has one definition. */
  def dottedPath(e: Expression): Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
      Some(a.name)
    case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      dottedPath(g.child).map(p => s"$p.${g.childSchema(g.ordinal).name}")
    case _ => None
  }

  /** Rewrite UNRESOLVED attribute/extract-value chains through a PATH
    * map — the logical→physical translation for renamed columns and
    * struct members (column-mapping name mode). Conditions built with
    * `col("name")` / `col("s.x")` / `col("s").getField("x")` are
    * unresolved trees at this point; the mapper sees the full dotted
    * path at once (each step's translation depends on its parent's).
    * Each chain is rewritten exactly ONCE — a `transform` would descend
    * into the rewritten children and re-map the already-physical path,
    * which is NOT identity when a re-added column's logical name
    * shadows a renamed-away member's physical name (the schema
    * evolution `taken` branch creates exactly that state). */
  def mapPaths(c: Column, pathMap: Seq[String] => Seq[String]): Column = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType

    def chain(e: Expression): Option[Seq[String]] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts)
      case UnresolvedExtractValue(child, Literal(key, StringType)) if key != null =>
        chain(child).map(_ :+ key.toString)
      case _ => None
    }
    def extractDepth(e: Expression): Int = e match {
      case UnresolvedExtractValue(child, _) => 1 + extractDepth(child)
      case _ => 0
    }
    def rewrite(e: Expression): Expression = e match {
      case _: UnresolvedAttribute | _: UnresolvedExtractValue
          if chain(e).isDefined =>
        val parts = chain(e).get
        val mapped = pathMap(parts)
        val rootLen = parts.length - extractDepth(e)
        mapped.drop(rootLen).foldLeft[Expression](
          UnresolvedAttribute(mapped.take(rootLen))) { (acc, step) =>
          UnresolvedExtractValue(acc, Literal(step))
        } // no recursion into the rewritten chain
      case other => other.mapChildren(rewrite)
    }
    column(rewrite(catalystExpression(c)))
  }

  /** EAGER Column → catalyst Expression conversion. `expression` wraps
    * the column node lazily (`ColumnNodeExpression`), which only the
    * DataFrame API entry points unwrap — an expression returned from a
    * FunctionRegistry builder (SQL path) would reach codegen still
    * wrapped and fail as Unevaluable. This runs the classic converter
    * up front, yielding a plain analyzable tree. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
