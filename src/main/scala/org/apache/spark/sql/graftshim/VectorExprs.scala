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

/** Indices of the `n` nearest centroids (squared-L2, ties by index) for
  * an embedding vector — the IVF assignment/probe kernel. The centroid
  * matrix rides along as one reference object (`numCentroids × dim`
  * row-major doubles); one static call in generated code. */
case class NearestCentroidsExpr(child: Expression, centroidsFlat: Array[Double], dim: Int, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(centroidsFlat.length % dim == 0, "centroidsFlat must be numCentroids*dim")
  require(n >= 1 && n <= centroidsFlat.length / dim)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(v: Any): Any =
    NearestCentroidsExpr.nearest(v.asInstanceOf[ArrayData], centroidsFlat, dim, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidsFlat", centroidsFlat, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"org.apache.spark.sql.graftshim.NearestCentroidsExpr.nearest($v, $ref, $dim, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidsExpr {

  def nearest(v: ArrayData, flat: Array[Double], dim: Int, n: Int): ArrayData = {
    val numC = flat.length / dim
    // a mis-sized vector (schema drift, data bug) must fail LOUDLY: a
    // truncated distance loop silently assigns wrong cells and degrades
    // ANN recall with no error anywhere
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"vector has ${v.numElements()} elements, centroids expect $dim")
    val len = dim
    val bestIdx = new Array[Int](n)
    val bestDist = new Array[Double](n)
    java.util.Arrays.fill(bestDist, Double.MaxValue)
    var c = 0
    while (c < numC) {
      val base = c * dim
      var dist = 0.0
      var i = 0
      while (i < len) {
        val diff = flat(base + i) - v.getDouble(i)
        dist += diff * diff
        i += 1
      }
      // insertion into the running top-n (n is tiny: the probe count)
      if (dist < bestDist(n - 1)) {
        var j = n - 1
        while (j > 0 && bestDist(j - 1) > dist) {
          bestDist(j) = bestDist(j - 1); bestIdx(j) = bestIdx(j - 1); j -= 1
        }
        bestDist(j) = dist; bestIdx(j) = c
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bestIdx.take(
      math.min(n, numC)))
  }

  def apply(v: Column, centroids: Seq[Seq[Double]], n: Int): Column = {
    val dim = centroids.head.length
    ColumnExpr.column(NearestCentroidsExpr(
      ColumnExpr.expression(v), centroids.flatten.toArray, dim, n))
  }
}

object HyperplaneSketchExpr {

  def sketch(v: ArrayData, flat: Array[Double], dim: Int): Long = {
    val numPlanes = flat.length / dim
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"vector has ${v.numElements()} elements, hyperplanes expect $dim")
    val n = dim
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
