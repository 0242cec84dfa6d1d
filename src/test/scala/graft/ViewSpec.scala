package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.views._

class ViewSpec extends AnyFunSuite {
  import TestSpark._

  private def freshLoc(p: String): String =
    Files.createTempDirectory(s"graft_$p").toString + "/tbl"

  private def orders = Tables.read(spark, sfDir, "orders")

  private def sourceTable(): SpaceDataset = {
    val ds = SpaceDataset.create(spark, freshLoc("src"), orders.schema, Seq("o_orderkey"))
    ds.append(orders.filter(col("o_orderkey") <= 1000L))
    ds
  }

  test("view plan JSON roundtrips") {
    val v = View.ofTable("/tmp/x")
      .filterExpr("o_totalprice > 100")
      .selectExprs("o_orderkey", "o_totalprice * 2 AS doubled")
    val back = ViewPlan.fromJson(v.plan.json)
    assert(back == v.plan)
    intercept[IllegalArgumentException](ViewPlan.fromJson("""{"type":"nope"}"""))
  }

  test("view compiles to DataFrame lineage") {
    val ds = sourceTable()
    val v = View.ofDataset(ds)
      .filterExpr("o_totalprice > 100000")
      .selectExprs("o_orderkey", "o_custkey", "o_totalprice * 0.5 AS half_price")
    val got = v.toDF(spark)
    val exp = orders.filter(col("o_orderkey") <= 1000L && col("o_totalprice") > 100000)
      .select(col("o_orderkey"), col("o_custkey"), (col("o_totalprice") * 0.5).as("half_price"))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("one-key join view") {
    val ds = sourceTable()
    val custLoc = freshLoc("cust")
    val cust = Tables.read(spark, sfDir, "customer")
    val cds = SpaceDataset.create(spark, custLoc, cust.schema, Seq("c_custkey"))
    cds.append(cust)
    val v = View.ofDataset(ds).selectExprs("o_orderkey", "o_custkey AS c_custkey", "o_totalprice")
      .join(View.ofDataset(cds), "c_custkey")
    val got = v.toDF(spark)
    assert(got.columns.contains("c_name"))
    assert(got.count() > 0)
    intercept[UnsupportedOperationException](v.plan.sourceLocation)
  }

  test("MV incremental refresh == full recompute across append/delete/upsert") {
    val src = sourceTable() // s1: keys <= 1000
    val v = View.ofDataset(src)
      .filterExpr("o_totalprice > 50000")
      .selectExprs("o_orderkey", "o_custkey", "o_totalprice", "o_totalprice * 0.1 AS fee")
    val mv = v.materialize(spark, freshLoc("mv"), Seq("o_orderkey"))

    def check(): Unit = {
      val got = mv.dataset.readAll()
      val exp = v.toDF(spark)
      assert(got.count() == exp.count())
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
    }
    check() // initial materialization

    src.append(orders.filter(col("o_orderkey") > 1000L && col("o_orderkey") <= 1200L))
    src.delete(col("o_orderkey") <= 100L)
    src.upsert(orders.filter(col("o_orderkey") > 200L && col("o_orderkey") <= 300L)
      .withColumn("o_totalprice", col("o_totalprice") + 500000.0))
    assert(mv.refresh() == 3) // one MV commit per source snapshot
    check()

    // idempotent: nothing new → no commits
    assert(mv.refresh() == 0)

    // reload from disk: plan + refreshed-to survive
    val mv2 = MaterializedView.load(spark, mv.dataset.location)
    assert(mv2.refreshedTo == mv.refreshedTo)
    assert(mv2.refresh() == 0)
  }

  test("MV refresh handles rows leaving and entering the filter") {
    val src = sourceTable()
    val v = View.ofDataset(src).filterExpr("o_totalprice > 200000")
    val mv = v.materialize(spark, freshLoc("mv2"), Seq("o_orderkey"))
    val before = mv.dataset.readAll().count()
    assert(before > 0)

    // upsert drops some rows below the filter threshold: the UPDATE's
    // DELETE removes them from the MV; its ADD is filtered out
    src.upsert(orders.filter(col("o_orderkey") <= 1000L && col("o_totalprice") > 200000)
      .limit(10).withColumn("o_totalprice", lit(1.0)))
    mv.refresh()
    val exp = v.toDF(spark)
    val got = mv.dataset.readAll()
    assert(got.count() == exp.count())
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }
}
