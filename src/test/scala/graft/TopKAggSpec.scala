package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.TopKByScore
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the bounded top-k aggregate: it must reproduce
  * the `row_number().over(Window.partitionBy(key))` formulation
  * bit-for-bit — same membership, same ranks, any partitioning — since
  * every ANN oracle's correctness now rides on that equivalence. */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("q_id"))
      .agg(TopKByScore(col("__s"), col("vec_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("i", "x")))
      .select(col("q_id"), col("x.vec_id").as("vec_id"),
        (col("i") + 1).cast("int").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("__s").desc, col("vec_id").asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("TopKByScore equals the window formulation on tie-heavy random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // coarse scores (21 distinct values over 5000 rows) force long tie
    // runs straddling the k boundary — the case where a sloppy
    // comparator or merge would diverge from the window's total order
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(7).toLong, i.toLong, rnd.nextInt(21) / 10.0)
    }
    for (parts <- Seq(1, 13, 64)) {
      val df = rows.toDF("q_id", "vec_id", "__s").repartition(parts)
      assert(viaAgg(df, 25) == viaWindow(df, 25),
        s"agg != window at $parts partitions")
    }
  }

  test("k larger than the group returns the whole group, ranked") {
    import spark.implicits._
    val df = Seq((0L, 1L, 0.5), (0L, 2L, 0.9), (1L, 3L, 0.1))
      .toDF("q_id", "vec_id", "__s")
    assert(viaAgg(df, 100) ==
      Set((0L, 2L, 1), (0L, 1L, 2), (1L, 3L, 1)))
  }

  test("NaN scores rank first, matching Spark's desc double ordering") {
    import spark.implicits._
    val df = Seq((0L, 1L, 0.5), (0L, 2L, Double.NaN), (0L, 3L, 0.9))
      .toDF("q_id", "vec_id", "__s")
    assert(viaAgg(df, 3) == viaWindow(df, 3))
    assert(viaAgg(df, 3).contains((0L, 2L, 1)), "NaN must rank first")
  }

  test("implicit casts admit float scores and int ids") {
    import spark.implicits._
    val df = Seq((0L, 1, 0.5f), (0L, 2, 0.9f))
      .toDF("q_id", "vec_id", "__s")
    val out = df.groupBy(col("q_id"))
      .agg(TopKByScore(col("__s"), col("vec_id"), 1).as("tk"))
      .select(posexplode(col("tk")).as(Seq("i", "x")))
      .select(col("x.vec_id")).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L))
  }
}
