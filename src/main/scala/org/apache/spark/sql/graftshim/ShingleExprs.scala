package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}

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

/** Native whitespace tokenizer: text → array of non-empty tokens
  * (kernel: [[graft.functions.ShingleOps.tokenize]]). Replaces the
  * `filter(split(c, "\\s+"), _ != "")` HOF tree, whose `ArrayFilter`
  * lambda NEVER whole-stage-codegens — every BM25/posting/quality
  * pipeline was paying interpreted `StringSplit.nullSafeEval` (regex)
  * plus per-row lambda dispatch on its hottest path. Same output for
  * every input (Java `\s` byte class), so oracles are unaffected. */
case class TokenizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  override def nullSafeEval(input: Any): Any =
    graft.functions.ShingleOps.tokenize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

object TokenizeExpr {
  def apply(c: Column): Column =
    ColumnExpr.column(TokenizeExpr(ColumnExpr.expression(c)))
}

/** Native token count: `size(tokens(text))` without materializing the
  * token array (kernel: [[graft.functions.ShingleOps.tokenCount]]) —
  * document length is computed alongside tokenization in every BM25 /
  * posting-list pipeline. NULL text → NULL, matching non-legacy
  * `size(null)`. */
case class TokenCountExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any =
    graft.functions.ShingleOps.tokenCount(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

object TokenCountExpr {
  def apply(c: Column): Column =
    ColumnExpr.column(TokenCountExpr(ColumnExpr.expression(c)))
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
