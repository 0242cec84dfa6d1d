package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Native word-shingle hashing: text → sorted distinct xxhash64 of the
  * word n-gram shingles (kernel: [[graft.functions.ShingleOps]]). One
  * static call in generated code replaces the previous
  * split/filter/transform/slice/concat_ws/xxhash64/array_sort HOF tree —
  * ~100× less generated source for janino and no Catalyst lambda
  * re-evaluation hazards. */
case class WordShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // construction-time (= analysis-time for the SQL surface): n <= 0
  // would otherwise surface as opaque per-row negative-length hash
  // slices deep inside a running job
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    graft.functions.ShingleOps.shingleHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashesExpr =
    copy(child = newChild)
}

object WordShingleHashesExpr {
  def apply(c: Column, n: Int): Column =
    ColumnExpr.column(WordShingleHashesExpr(ColumnExpr.expression(c), n))
}

/** Native MinHash signature over pre-hashed shingles: per seed, min of
  * splitmix64-mixed hashes (kernel: [[graft.functions.ShingleOps]]). */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes >= 1, s"signature length must be >= 1, got $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    graft.functions.ShingleOps.minhashSig(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.minhashSig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  def apply(c: Column, numHashes: Int): Column =
    ColumnExpr.column(MinHashSigExpr(ColumnExpr.expression(c), numHashes))
}
