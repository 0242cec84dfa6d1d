package org.apache.spark.sql.graftshim

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded EXTREMUM RESERVOIR for invertible min/max maintenance.
  *
  * A reservoir is the exact multiset inventory of a group's most
  * extreme distinct values, bounded at k distinct entries:
  *
  *   `struct<entries: array<struct<v, n>>, bound: v-type>`
  *
  * sorted most-extreme-first, with the INVARIANT that every group value
  * on the extreme side of `bound` (inclusive) is tracked with its exact
  * count, and `bound IS NULL` means the inventory is COMPLETE (the
  * group has ≤ k distinct values — or had, before deletes shrank it).
  * The group's min/max is `entries[0].v`; a delete decrements counts
  * and the extremum stays exact until the reservoir DRAINS
  * (`entries` empty while `bound` is set — values beyond the bound are
  * untracked), which is the only case that needs a source recompute.
  * `entries` empty with `bound` null just means no non-null values.
  *
  * Merging reservoirs (partial→partial, or state⊕add⊖delete) is closed:
  * the merged tracked region is the INTERSECTION of the inputs' tracked
  * regions (`bound` = least extreme of the bounds), counts add/subtract
  * within it, and an overflow past k trims the least extreme entries,
  * tightening `bound` to the least extreme survivor. Subtraction going
  * negative means the change feed deleted rows the state never saw —
  * an invariant violation that throws rather than corrupts.
  *
  * Value ordering is Spark's own interpreted ordering for the input
  * type, so NaN sorts largest and -0.0 equals +0.0 exactly as Spark's
  * native min/max treat them (±0.0 merge into one entry).
  */
object Reservoir {

  /** (value, signed count) entries; values distinct under `ord`. */
  type Entries = ArrayBuffer[(Any, Long)]

  /** Most-extreme-first comparator: ascending for min, descending for
    * max. "More extreme" sorts FIRST. */
  def extremeOrdering(dt: DataType, isMin: Boolean): Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(dt)
    if (isMin) base else base.reverse
  }

  /** Signed merge of two reservoirs under the invariant above.
    * `signB` is +1 (add) or -1 (delete). Entries must be sorted
    * most-extreme-first and value-distinct; the result is too. */
  def merge(
      aEntries: Seq[(Any, Long)], aBound: Any,
      bEntries: Seq[(Any, Long)], bBound: Any,
      signB: Long,
      k: Int,
      ord: Ordering[Any],
      context: => String): (Seq[(Any, Long)], Any) = {
    // tracked region = INTERSECTION of the inputs' tracked regions:
    // the MORE extreme bound wins (null = complete = everything tracked)
    val bound: Any = (aBound, bBound) match {
      case (null, b) => b
      case (a, null) => a
      case (a, b) => if (ord.compare(a, b) <= 0) a else b
    }
    def tracked(v: Any): Boolean = bound == null || ord.compare(v, bound) <= 0
    // merge-join the two sorted runs
    val out = new ArrayBuffer[(Any, Long)](math.min(k, aEntries.size + bEntries.size))
    var i = 0
    var j = 0
    def push(v: Any, n: Long): Unit = {
      if (n < 0L) throw new IllegalStateException(
        s"extremum reservoir underflow at value $v ($context): the change " +
          "feed deleted rows the view state never counted")
      if (n > 0L) out += ((v, n))
    }
    while (i < aEntries.size || j < bEntries.size) {
      if (i < aEntries.size && (j >= bEntries.size ||
          ord.compare(aEntries(i)._1, bEntries(j)._1) < 0)) {
        val (v, n) = aEntries(i); i += 1
        if (tracked(v)) push(v, n)
      } else if (j < bEntries.size && (i >= aEntries.size ||
          ord.compare(bEntries(j)._1, aEntries(i)._1) < 0)) {
        val (v, n) = bEntries(j); j += 1
        if (tracked(v)) push(v, signB * n)
      } else {
        val (v, n1) = aEntries(i); i += 1
        val n2 = bEntries(j)._2; j += 1
        if (tracked(v)) push(v, n1 + signB * n2)
      }
    }
    if (out.size > k) {
      val kept = out.take(k)
      (kept.toSeq, kept.last._1) // trim tightens the bound
    } else (out.toSeq, bound)
  }

  /** Decode a reservoir struct (catalyst InternalRow) into sorted
    * entries + bound. Null struct = empty complete reservoir. */
  def decode(row: Any, dt: DataType): (Seq[(Any, Long)], Any) = row match {
    case null => (Nil, null)
    case r: InternalRow =>
      val arr = r.getArray(0)
      val entries = (0 until arr.numElements()).map { idx =>
        val e = arr.getStruct(idx, 2)
        (e.get(0, dt), e.getLong(1))
      }
      (entries, if (r.isNullAt(1)) null else r.get(1, dt))
    case other => throw new IllegalStateException(s"not a reservoir struct: $other")
  }

  def encode(entries: Seq[(Any, Long)], bound: Any): InternalRow =
    InternalRow(
      new GenericArrayData(entries.map { case (v, n) => InternalRow(v, n) }.toArray),
      bound)

  /** Reservoir-eligible input types (AtomicType is protected outside
    * the sql package, so callers ask here). */
  def supportsType(dt: DataType): Boolean = dt.isInstanceOf[AtomicType]

  /** Canonical compacted buffer state: distinct (value, count) entries
    * most-extreme-first plus the tracked-region bound. TOP-LEVEL (not
    * nested in the aggregate) on purpose: Spark copies aggregate
    * instances for buffer offsets, and an instance-nested case class
    * would fail its outer-instance check in type patterns across
    * copies, silently misrouting the marker as a raw value. */
  final case class Compacted(entries: Seq[(Any, Long)], bound: Any)

  def structType(dt: DataType): StructType = StructType(Seq(
    StructField("entries", ArrayType(StructType(Seq(
      StructField("v", dt, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("bound", dt, nullable = true)))
}

/** Aggregate producing a group's reservoir from raw values: exact
  * per-distinct-value counts of the k most extreme values of the batch
  * (bound set iff the batch overflowed k distinct values). Null inputs
  * are ignored, like native min/max. Shuffle-bounded: each partial
  * ships ≤ k entries. */
case class ExtremeReservoir(
    child: Expression,
    k: Int,
    isMin: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(k > 0, s"reservoir needs k > 0, got $k")

  override def prettyName: String = "graft_extreme_reservoir"
  override def nullable: Boolean = false
  override def dataType: DataType = Reservoir.structType(child.dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: AtomicType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"extremum reservoir needs an orderable atomic input, got $other")
    }

  @transient private lazy val ord = Reservoir.extremeOrdering(child.dataType, isMin)

  // buffer layout: one ArrayBuffer[Any] holding raw values appended by
  // update() plus any number of Reservoir.Compacted states (from
  // deserialize or earlier recompactions); compact() folds everything
  // into one canonical Compacted.
  import Reservoir.Compacted

  private def compact(b: ArrayBuffer[Any]): Compacted = {
    var entries: Seq[(Any, Long)] = Nil
    var bound: Any = null
    val raw = new ArrayBuffer[(Any, Long)]()
    b.foreach {
      case c: Compacted =>
        val m = Reservoir.merge(entries, bound, c.entries, c.bound, 1L, k, ord, "partial merge")
        entries = m._1; bound = m._2
      case v => raw += ((v, 1L))
    }
    if (raw.nonEmpty) {
      // sort + run-length the raw values, then merge as a reservoir of
      // its own (complete: bound null before trimming)
      val sorted = raw.sortBy(_._1)(ord)
      val runs = new ArrayBuffer[(Any, Long)]()
      sorted.foreach { case (v, n) =>
        if (runs.nonEmpty && ord.compare(runs.last._1, v) == 0)
          runs(runs.size - 1) = (runs.last._1, runs.last._2 + n)
        else runs += ((v, n))
      }
      val m = Reservoir.merge(entries, bound, runs.toSeq, null, 1L, k, ord, "raw fold")
      entries = m._1; bound = m._2
    }
    Compacted(entries, bound)
  }

  private def recompacted(b: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    val c = compact(b)
    b.clear()
    b += c
    b
  }

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

  override def update(b: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) {
      // eval may return a reused mutable object (UTF8String over a row
      // buffer); the buffer outlives the row, so copy
      b += InternalRow.copyValue(v)
      if (b.length >= 4 * (k + 1)) recompacted(b)
    }
    b
  }

  override def merge(b: ArrayBuffer[Any], o: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    b ++= o
    recompacted(b)
  }

  override def eval(b: ArrayBuffer[Any]): Any = {
    val c = compact(b)
    Reservoir.encode(c.entries, c.bound)
  }

  @transient private lazy val ser =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(b: ArrayBuffer[Any]): Array[Byte] = {
    val c = compact(b)
    ser(InternalRow(Reservoir.encode(c.entries, c.bound))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val (entries, bound) = Reservoir.decode(row.getStruct(0, 2), child.dataType)
    ArrayBuffer[Any](Compacted(entries, bound))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExtremeReservoir =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExtremeReservoir =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExtremeReservoir =
    copy(child = newChild)
}

object ExtremeReservoir {
  def apply(c: Column, k: Int, isMin: Boolean): Column =
    ColumnExpr.column(
      new ExtremeReservoir(ColumnExpr.expression(c), k, isMin).toAggregateExpression())
}

/** Three-way state merge: `state ⊕ add ⊖ delete`, all reservoir structs
  * of the same value type (any input nullable = empty complete).
  * Used per affected group during aggregate-view refresh — delta-sized,
  * not a scan path, so interpreted eval (CodegenFallback) is fine. */
case class MergeReservoirs(
    state: Expression,
    add: Expression,
    del: Expression,
    k: Int,
    isMin: Boolean) extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(state, add, del)
  override def nullable: Boolean = false
  override def dataType: DataType = state.dataType
  override def prettyName: String = "graft_merge_reservoirs"

  @transient private lazy val valueType: DataType =
    state.dataType.asInstanceOf[StructType]("bound").dataType
  @transient private lazy val ord = Reservoir.extremeOrdering(valueType, isMin)

  override def eval(input: InternalRow): Any = {
    val (se, sb) = Reservoir.decode(state.eval(input), valueType)
    val (ae, ab) = Reservoir.decode(add.eval(input), valueType)
    val (de, db) = Reservoir.decode(del.eval(input), valueType)
    val (e1, b1) = Reservoir.merge(se, sb, ae, ab, 1L, k, ord, "state+add")
    val (e2, b2) = Reservoir.merge(e1, b1, de, db, -1L, k, ord, "state-delete")
    Reservoir.encode(e2, b2)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MergeReservoirs =
    copy(state = newChildren(0), add = newChildren(1), del = newChildren(2))
}

object MergeReservoirs {
  def apply(state: Column, add: Column, del: Column, k: Int, isMin: Boolean): Column =
    ColumnExpr.column(MergeReservoirs(
      ColumnExpr.expression(state), ColumnExpr.expression(add),
      ColumnExpr.expression(del), k, isMin))
}
