package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftshim.Reservoir
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Property fuzz for the extremum reservoir's merge algebra, checked
  * against a brute-force multiset model: after ANY sequence of bounded
  * add/delete merges, (a) every tracked entry's count is exactly the
  * model's count, (b) the reservoir head equals the model's true
  * extremum whenever entries are non-empty, and (c) an empty reservoir
  * with a null bound means the model truly has no values (the
  * drain-vs-genuinely-empty distinction the recompute trigger relies
  * on). */
class ReservoirSpec extends AnyFunSuite {

  private val K = 8

  /** Build a reservoir of a batch the way the aggregate does: exact
    * counts of the k most extreme distinct values, bound set iff the
    * batch overflowed k distinct values. */
  private def ofBatch(
      values: Seq[Long], ord: Ordering[Any]): (Seq[(Any, Long)], Any) = {
    val runs = values.groupBy(identity).toSeq
      .map { case (v, vs) => (v: Any, vs.size.toLong) }
      .sortBy(_._1)(ord)
    if (runs.size <= K) (runs, null)
    else (runs.take(K), runs(K - 1)._1)
  }

  test("random add/delete merge lifecycle matches the brute-force model") {
    val rnd = new Random(20260815L)
    val ord = Reservoir.extremeOrdering(LongType, isMin = true)

    for (trial <- 1 to 40) {
      val model = scala.collection.mutable.Map.empty[Long, Long]
      // state starts as a full build of an initial batch
      val init = Seq.fill(200 + rnd.nextInt(300))(rnd.nextLong(30).abs)
      init.foreach(v => model(v) = model.getOrElse(v, 0L) + 1)
      var (entries, bound) = ofBatch(init, ord)

      for (step <- 1 to 12) {
        val isDelete = rnd.nextBoolean() && model.nonEmpty
        if (!isDelete) {
          val add = Seq.fill(1 + rnd.nextInt(120))(rnd.nextLong(30).abs)
          add.foreach(v => model(v) = model.getOrElse(v, 0L) + 1)
          val (ae, ab) = ofBatch(add, ord)
          val m = Reservoir.merge(entries, bound, ae, ab, 1L, K, ord, s"t$trial s$step add")
          entries = m._1; bound = m._2
        } else {
          // delete an arbitrary sub-multiset of EXISTING rows
          val pool = model.toSeq.flatMap { case (v, n) => Seq.fill(n.toInt)(v) }
          val del = rnd.shuffle(pool).take(1 + rnd.nextInt(math.max(1, pool.size / 2)))
          del.foreach { v =>
            if (model(v) == 1L) model.remove(v) else model(v) -= 1
          }
          val (de, db) = ofBatch(del, ord)
          val m = Reservoir.merge(entries, bound, de, db, -1L, K, ord, s"t$trial s$step del")
          entries = m._1; bound = m._2
        }

        // (a) tracked counts exact
        entries.foreach { case (v, n) =>
          assert(model.getOrElse(v.asInstanceOf[Long], 0L) == n,
            s"trial $trial step $step: tracked count drift at $v")
        }
        // (b) non-empty head == true minimum
        if (entries.nonEmpty) {
          val trueMin = model.keys.min
          assert(entries.head._1 == trueMin,
            s"trial $trial step $step: head ${entries.head._1} != true min $trueMin")
        }
        // (c) empty + null bound <=> model empty
        if (entries.isEmpty && bound == null)
          assert(model.isEmpty, s"trial $trial step $step: claimed-complete empty " +
            s"reservoir but model has ${model.size} values")
        if (model.isEmpty)
          assert(entries.isEmpty, s"trial $trial step $step: model empty, entries remain")
      }
    }
  }

  test("deleting rows the state never counted throws instead of corrupting") {
    val ord = Reservoir.extremeOrdering(LongType, isMin = true)
    val (e, b) = ofBatch(Seq(1L, 1L, 2L), ord)
    val (de, db) = ofBatch(Seq(1L, 1L, 1L), ord) // one more than exists
    val ex = intercept[IllegalStateException](
      Reservoir.merge(e, b, de, db, -1L, K, ord, "underflow probe"))
    assert(ex.getMessage.contains("underflow"), ex.getMessage)
  }

  test("±0.0 and NaN follow Spark ordering semantics in double reservoirs") {
    val ord = Reservoir.extremeOrdering(DoubleType, isMin = false) // MAX reservoir
    // Spark orders NaN above everything and treats ±0.0 as equal
    assert(ord.compare(Double.NaN, 1e308) < 0) // NaN more extreme for max
    assert(ord.compare(-0.0d, 0.0d) == 0)
    val batch = Seq[(Any, Long)]((Double.NaN, 1L), (5.0d, 2L), (0.0d, 1L))
    val m = Reservoir.merge(batch, null, Seq((-0.0d, 1L)), null, 1L, K, ord, "fp")
    // -0.0 merges into the existing 0.0 entry under ordering equality
    assert(m._1.collectFirst { case (v: Double, n) if v == 0.0d => n }.contains(2L), m._1)
    assert(m._1.head._1.asInstanceOf[Double].isNaN, "NaN stays the max head")
  }
}
