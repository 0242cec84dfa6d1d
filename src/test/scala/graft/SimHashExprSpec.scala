package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.SimHash64Expr
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SimHash, TextFunctions => TF}

class SimHashExprSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("native expression matches the reference Scala implementation") {
    val df = Seq("spark table scan join", "spark table scan join", "other words entirely")
      .toDF("text")
    val got = df.select(TF.simhash64(TF.tokens(col("text")))).collect().map(_.getLong(0))
    assert(got(0) == got(1))
    assert(got(0) != got(2))

    // cross-check against a driver-side recomputation
    def reference(ts: Seq[String]): Long = {
      val counters = new Array[Int](64)
      ts.foreach { t =>
        val h = SimHash.hash64(t)
        for (i <- 0 until 64)
          if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
      }
      (0 until 64).foldLeft(0L)((s, i) => if (counters(i) > 0) s | (1L << i) else s)
    }
    assert(got(0) == reference(Seq("spark", "table", "scan", "join")))
  }

  test("bitmap-contains expression stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    import graft.core.DmlOps
    val bm = DmlOps.serializeBitmap(Seq(1L, 3L, 5L))
    val bc = spark.sparkContext.broadcast(Map("file:///t/a.parquet" -> bm))
    val df = spark.range(0, 8)
      .select(lit("/t/a.parquet").as("f"), col("id").as("r"))
      .filter(org.apache.spark.sql.graftshim.BitmapContains(col("f"), col("r"), bc))
    assert(df.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 3L, 5L))
    // the filter participates in codegen: `*(n) Filter` prefix, no UDF
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Filter .*graft_bitmap_contains.*"), plan)
  }

  test("registered SQL function and codegen path work") {
    SimHash64Expr.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_simhash64(array('a','b','c')) AS h").collect()(0).getLong(0)
    val viaColumn = Seq(Seq("a", "b", "c")).toDF("ts")
      .select(TF.simhash64(col("ts"))).collect()(0).getLong(0)
    assert(viaSql == viaColumn)

    // null array → null result (null-intolerant unary expression)
    val n = spark.sql("SELECT graft_simhash64(CAST(NULL AS ARRAY<STRING>)) AS h").collect()(0)
    assert(n.isNullAt(0))
  }
}
