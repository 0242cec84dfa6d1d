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
  * whole-stage codegen instead of forcing a UDF boundary per row.
  *
  * `missingAbsent = false` (CDC reads): every scanned file is in the
  * map by construction — a miss is a bug and throws. `missingAbsent =
  * true` (merge-on-read delete-vector masks): the scan covers the WHOLE
  * table while only some files carry vectors — a file without an entry
  * has no dead rows, so membership is simply false. */
case class BitmapContains(
    left: Expression, // file path (qualified URI string)
    right: Expression, // row index within the file
    bitmaps: Broadcast[Map[String, String]],
    missingAbsent: Boolean = false)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bitmap_contains"

  override def nullSafeEval(file: Any, row: Any): Any =
    if (missingAbsent)
      BitmapContains.containsLenient(bitmaps, file.asInstanceOf[UTF8String], row.asInstanceOf[Long])
    else
      BitmapContains.contains(bitmaps, file.asInstanceOf[UTF8String], row.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bitmaps", bitmaps, classOf[Broadcast[_]].getName)
    val fn = if (missingAbsent) "containsLenient" else "contains"
    defineCodeGen(ctx, ev, (f, r) =>
      s"org.apache.spark.sql.graftshim.BitmapContains.$fn($ref, $f, $r)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BitmapContains {

  /** Static entry shared by eval and generated code. */
  def contains(bc: Broadcast[_], file: UTF8String, row: Long): Boolean = {
    val map = bc.value.asInstanceOf[Map[String, String]]
    val k = graft.core.BitmapCache.normKey(file.toString)
    graft.core.BitmapCache.get(map(k)).contains(row.toInt)
  }

  /** Like [[contains]], but a file with no map entry is simply "no dead
    * rows here" — the delete-vector mask shape. */
  def containsLenient(bc: Broadcast[_], file: UTF8String, row: Long): Boolean = {
    val map = bc.value.asInstanceOf[Map[String, String]]
    val k = graft.core.BitmapCache.normKey(file.toString)
    map.get(k) match {
      case Some(b64) => graft.core.BitmapCache.get(b64).contains(row.toInt)
      case None => false
    }
  }

  def apply(file: Column, row: Column, bitmaps: Broadcast[Map[String, String]]): Column =
    ColumnExpr.column(BitmapContains(
      ColumnExpr.expression(file), ColumnExpr.expression(row), bitmaps))

  def lenient(file: Column, row: Column, bitmaps: Broadcast[Map[String, String]]): Column =
    ColumnExpr.column(BitmapContains(
      ColumnExpr.expression(file), ColumnExpr.expression(row), bitmaps,
      missingAbsent = true))
}
