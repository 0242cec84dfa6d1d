package org.apache.spark.sql.graftshim

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Roaring-bitmap row-mask membership as a NATIVE expression:
  * `(filePath, rowIndex) → bitmap.contains(rowIndex)` against a
  * broadcast `normalizedPath → serializedBitmapB64` map, with per-
  * executor deserialized-bitmap caching. Replaces the Scala UDF in the
  * CDC masked read (change-data bitmaps, reference
  * `core/ops/change_data.py:137-146`) so the filter stays inside
  * whole-stage codegen instead of forcing a UDF boundary per row. */
case class BitmapContains(
    left: Expression, // file path (qualified URI string)
    right: Expression, // row index within the file
    bitmaps: Broadcast[Map[String, String]])
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bitmap_contains"

  override def nullSafeEval(file: Any, row: Any): Any =
    BitmapContains.contains(bitmaps, file.asInstanceOf[UTF8String], row.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bitmaps", bitmaps, classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, (f, r) =>
      s"org.apache.spark.sql.graftshim.BitmapContains.contains($ref, $f, $r)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BitmapContains {

  /** Static entry shared by eval and generated code. */
  def contains(bc: Broadcast[_], file: UTF8String, row: Long): Boolean = {
    val map = bc.value.asInstanceOf[Map[String, String]]
    val k = graft.core.BitmapCache.normKey(file.toString)
    graft.core.BitmapCache.get(k, map(k)).contains(row.toInt)
  }

  def apply(file: Column, row: Column, bitmaps: Broadcast[Map[String, String]]): Column =
    ColumnExpr.column(BitmapContains(
      ColumnExpr.expression(file), ColumnExpr.expression(row), bitmaps))
}
