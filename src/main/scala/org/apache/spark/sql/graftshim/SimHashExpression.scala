package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the 64-bit SimHash sketch over a token
  * array — the preference-order-(b) extension point (custom `Expression`
  * beats a Scala UDF): no row-to-Scala conversion, participates in
  * whole-stage codegen via a static helper call, null-safe. Lives in the
  * sql package tree because `AbstractDataType` (the `ExpectsInputTypes`
  * contract) is `private[sql]` in Spark 4.
  *
  * (Charikar's SimHash: per-token 64-bit hash votes ±1 on each bit
  * position; the sign vector is the sketch.) */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    graft.functions.SimHash.hashArrayData(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.hashArrayData($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  def apply(c: Column): Column =
    ColumnExpr.column(SimHash64Expr(ColumnExpr.expression(c)))

  /** Register `graft_simhash64` for SQL use on a session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
}
