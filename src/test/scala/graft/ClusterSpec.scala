package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** CLUSTER BY rewrite: pruning improvement, content preservation,
  * CDC silence, and time travel to the pre-cluster layout. */
class ClusterSpec extends AnyFunSuite {
  import TestSpark._

  test("clusterBy turns a scattered layout into a pruning one") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_clus_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"),
      statsFields = Seq("o_totalprice"))
    ds.append(orders.repartition(8))
    val before = ds.readAll().collect().toSet
    val preSnapshot = ds.storage.metadata.currentSnapshotId
    val prePruned = ds.plan(Some(col("o_totalprice") > 400000.0)).prunedFiles

    val res = ds.clusterBy(Seq("o_totalprice"), targetFileRows = orders.count() / 8).get
    assert(res.rewrittenFiles == 8)
    assert(res.rows == before.size)

    // pruning improves on the clustered column
    val postPlan = ds.plan(Some(col("o_totalprice") > 400000.0))
    assert(postPlan.prunedFiles > prePruned,
      s"pruned $prePruned -> ${postPlan.prunedFiles} of ${postPlan.totalFiles}")
    // content identical
    assert(ds.readAll().collect().toSet == before)
    // CDC-silent: diff across the clustering snapshot is empty
    ds.storage.reload()
    val cur = ds.storage.metadata.currentSnapshotId
    assert(cur == preSnapshot + 1)
    assert(ds.diff(preSnapshot.toString, cur.toString).isEmpty)
    // time travel to the pre-cluster snapshot still reads everything
    assert(ds.read(version = Some(preSnapshot.toString)).collect().toSet == before)
  }

  test("clusterBy validates columns and no-ops on an empty table") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_clus2_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    assert(ds.clusterBy(Seq("o_totalprice"), 100L).isEmpty)
    intercept[IllegalArgumentException] {
      ds.clusterBy(Seq("nope"), 100L)
    }
  }
}
