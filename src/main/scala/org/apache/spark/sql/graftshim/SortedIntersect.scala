package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Intersection CARDINALITY of two SORTED long arrays by linear merge —
  * no hash set, no result-array allocation (unlike `array_intersect`),
  * codegen-friendly. The workhorse of the exact set-similarity verify
  * stage: Jaccard = |∩| / (|A|+|B|-|∩|) over pre-sorted distinct
  * shingle-hash arrays. Inputs MUST be sorted ascending (callers sort
  * once per document, not per pair). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftshim.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersectCount {

  def count(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    // order violations would silently UNDERCOUNT the intersection (the
    // merge skips out-of-order matches) — a threshold filter would then
    // pass near-duplicates with no error; detecting them costs one
    // compare per consumed element
    var prevA = Long.MinValue
    var prevB = Long.MinValue
    while (i < n && j < m) {
      // null slots would read as 0 through getLong and intersect
      // silently — the shingle pipeline never produces them, so one
      // appearing is a caller bug that must be loud
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "null element in sorted-intersect input array")
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < prevA || y < prevB)
        throw new IllegalArgumentException(
          "sorted-intersect input array is not sorted ascending " +
            "(sort with array_sort, or use graft.functions jaccard for unsorted sets)")
      if (x == y) { c += 1; prevA = x; prevB = y; i += 1; j += 1 }
      else if (x < y) { prevA = x; i += 1 }
      else { prevB = y; j += 1 }
    }
    c
  }

  def apply(a: Column, b: Column): Column =
    ColumnExpr.column(SortedIntersectCount(
      ColumnExpr.expression(a), ColumnExpr.expression(b)))
}
