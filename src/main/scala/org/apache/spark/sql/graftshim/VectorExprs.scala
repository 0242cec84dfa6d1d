package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Sign-bit hyperplane sketch of an embedding vector in ONE pass: bit i
  * set iff dot(v, planes[i]) ≥ 0. The composable-HOF formulation
  * (`aggregate(zip_with(...))` per plane) builds 64 separate lambda
  * trees with thousands of literal nodes — dominated by analysis +
  * codegen time per query, not by the arithmetic. Here the plane matrix
  * rides along as ONE reference object and the generated code is a
  * single static call. Planes are flattened row-major (`numPlanes × dim`
  * doubles). */
case class HyperplaneSketchExpr(child: Expression, planesFlat: Array[Double], dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(planesFlat.length % dim == 0, "planesFlat must be numPlanes*dim")
  require(planesFlat.length / dim <= 64, "at most 64 planes fit a long sketch")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sketch"

  override def nullSafeEval(v: Any): Any =
    HyperplaneSketchExpr.sketch(v.asInstanceOf[ArrayData], planesFlat, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"org.apache.spark.sql.graftshim.HyperplaneSketchExpr.sketch($v, $planesRef, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSketchExpr {

  def sketch(v: ArrayData, flat: Array[Double], dim: Int): Long = {
    val numPlanes = flat.length / dim
    val n = math.min(dim, v.numElements())
    var bits = 0L
    var p = 0
    while (p < numPlanes) {
      val base = p * dim
      var d = 0.0
      var i = 0
      while (i < n) { d += flat(base + i) * v.getDouble(i); i += 1 }
      if (d >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  def apply(v: Column, planes: Seq[Seq[Double]]): Column = {
    val dim = planes.head.length
    ColumnExpr.column(HyperplaneSketchExpr(
      ColumnExpr.expression(v), planes.flatten.toArray, dim))
  }
}
