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

  /** Rewrite UNRESOLVED attribute references through a name map — the
    * logical→physical translation for renamed columns (column-mapping
    * name mode). Conditions built with `col("name")` are unresolved
    * attribute trees at this point; anything already resolved against a
    * logical frame never reaches the physical scan directly. */
  def mapAttributes(c: Column, nameMap: Map[String, String]): Column = {
    if (nameMap.isEmpty) return c
    val rewritten = catalystExpression(c).transform {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.length == 1 && nameMap.contains(a.nameParts.head) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          Seq(nameMap(a.nameParts.head)))
    }
    column(rewritten)
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
