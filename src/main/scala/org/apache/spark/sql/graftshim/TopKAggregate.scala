package org.apache.spark.sql.graftshim

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score DESC, id ASC) pairs
  * seen, with the cap enforced on UPDATE and MERGE — so the partial
  * aggregate each task ships into the shuffle is at most k entries, not
  * that task's whole input. This is the missing piece that makes exact
  * per-key top-k (ANN brute force scoring, per-query candidate ranking)
  * scale: the `row_number().over(Window.partitionBy(key))` formulation
  * funnels every row of a key into ONE task, while this aggregate's
  * shuffle carries ≤ partitions × k rows per key and the final merge is
  * a k-way selection. Result: `array<struct<id, score>>` sorted best
  * first — `posexplode` recovers (rank-1, row).
  *
  * Selection (unlike a float SUM) is merge-order-insensitive under a
  * total order — ties break by id — so results are bit-deterministic
  * and oracle-safe at any parallelism. NaN sorts first, matching
  * Spark's `desc` null/NaN ordering on doubles.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id
  // analysis-time contract: float scores / int ids get implicit casts;
  // anything uncastable fails analysis instead of ClassCastException
  // inside update() at execution
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def prettyName: String = "graft_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  // score desc (NaN greatest, like Spark's desc double sort), id asc
  private def cmp(a: (Double, Long), b: (Double, Long)): Int = {
    val c = java.lang.Double.compare(b._1, a._1)
    if (c != 0) c else java.lang.Long.compare(a._2, b._2)
  }
  private val ord: Ordering[(Double, Long)] = (a, b) => cmp(a, b)

  private def compact(b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (b.length > k) {
      val kept = b.sorted(ord).take(k)
      b.clear()
      b ++= kept
    }
    b
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(
      b: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      b += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      // amortized: defer the sort until the buffer is 4× over cap
      if (b.length >= 4 * k) compact(b)
    }
    b
  }

  override def merge(
      b: ArrayBuffer[(Double, Long)],
      o: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b ++= o
    compact(b)
  }

  override def eval(b: ArrayBuffer[(Double, Long)]): Any = {
    val top = b.sorted(ord).take(k)
    new GenericArrayData(top.map { case (s, i) => InternalRow(i, s) }.toArray)
  }

  override def serialize(b: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val kept = compact(b) // ship at most k entries into the shuffle
    val bb = ByteBuffer.allocate(4 + kept.length * 16)
    bb.putInt(kept.length)
    kept.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { val s = bb.getDouble(); val i = bb.getLong(); b += ((s, i)); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)
}

object TopKByScore {
  /** `topK(score, id, k)` as an aggregate Column for `.agg(...)`. */
  def apply(score: Column, id: Column, k: Int): Column =
    ColumnExpr.column(
      new TopKByScore(
        ColumnExpr.expression(score), ColumnExpr.expression(id), k)
        .toAggregateExpression())
}
