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

  test("incremental clusterBy rewrites only the unclustered delta tier") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_clusi_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"),
      statsFields = Seq("o_totalprice"))
    val bulk = orders.filter(col("o_orderkey") % 5 =!= 0)
    val delta = orders.filter(col("o_orderkey") % 5 === 0)
    ds.append(bulk.repartition(6))
    ds.clusterBy(Seq("o_totalprice"), targetFileRows = orders.count() / 8)
    val clusteredFiles = ds.plan().files.toSet

    // new arrivals land scattered (each file spans the price range)
    ds.append(delta.repartition(2))
    val before = ds.readAll().collect().toSet
    val filesBefore = ds.plan().files.size

    val res = ds.clusterBy(Seq("o_totalprice"), targetFileRows = orders.count() / 8,
      incremental = true).get
    // only the 2 delta files are rewritten; the clustered bulk is kept
    assert(res.rewrittenFiles == 2, s"rewrote ${res.rewrittenFiles} of $filesBefore")
    val after = ds.plan().files.toSet
    assert(clusteredFiles.subsetOf(after), "backbone files must survive untouched")
    assert(ds.readAll().collect().toSet == before)

    // the delta tier's stats are now tight: a price point-range scans
    // at most one backbone file + one delta file
    val p = ds.plan(Some(col("o_totalprice") > 500000.0))
    assert(p.files.size <= 2, s"kept ${p.files.size} files for a top-range read")

    // a second incremental pass finds nothing to do — no new snapshot
    val snap = ds.storage.metadata.currentSnapshotId
    assert(ds.clusterBy(Seq("o_totalprice"), targetFileRows = orders.count() / 8,
      incremental = true).isEmpty)
    ds.storage.reload()
    assert(ds.storage.metadata.currentSnapshotId == snap)
  }

  test("zorderBy prunes on BOTH clustered columns; plain clusterBy only on the first") {
    val orders = Tables.read(spark, sfDir, "orders")
    val n = orders.count()
    def freshTable(tag: String) = {
      val loc = Files.createTempDirectory(s"graft_z${tag}_").toString + "/tbl"
      val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"),
        statsFields = Seq("o_custkey", "o_totalprice"))
      ds.append(orders.repartition(8)) // scattered: nothing prunes
      ds
    }
    // scale-relative: bottom eighth of the custkey range / top tenth of
    // the price range (z-tiles split each axis in halves/quarters — a
    // filter spanning most of an axis is never falsifiable)
    val maxCust = orders.agg(max(col("o_custkey"))).collect()(0).getLong(0)
    val fCust = col("o_custkey") < lit(maxCust / 8)
    val fPrice = col("o_totalprice") > 450000.0

    val lex = freshTable("lex")
    lex.clusterBy(Seq("o_custkey", "o_totalprice"), targetFileRows = n / 8)
    val lexCust = lex.plan(Some(fCust)).prunedFiles
    val lexPrice = lex.plan(Some(fPrice)).prunedFiles

    val zed = freshTable("zed")
    val before = zed.readAll().collect().toSet
    val res = zed.zorderBy(Seq("o_custkey", "o_totalprice"), targetFileRows = n / 8).get
    assert(res.rows == n)
    val zCust = zed.plan(Some(fCust)).prunedFiles
    val zPrice = zed.plan(Some(fPrice)).prunedFiles

    // lexicographic: first column prunes, second doesn't
    assert(lexCust > 0)
    // z-order: BOTH dimensions prune
    assert(zCust > 0, s"zorder must prune on o_custkey")
    assert(zPrice > 0, s"zorder must prune on o_totalprice (lex pruned $lexPrice)")
    // content identical, CDC silent
    assert(zed.readAll().collect().toSet == before)
    zed.storage.reload()
    val cur = zed.storage.metadata.currentSnapshotId
    assert(zed.diff((cur - 1).toString, cur.toString).isEmpty)

    intercept[IllegalArgumentException] {
      zed.zorderBy(Seq("o_custkey"), 100L) // needs >= 2 columns
    }
    intercept[IllegalArgumentException] {
      zed.zorderBy(Seq("o_custkey", "o_orderstatus"), 100L) // non-numeric
    }
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

  test("malformed mergeFraction conf fails loudly with the key name") {
    val loc = java.nio.file.Files.createTempDirectory("graft_cluster_conf_").toString + "/t"
    val rows = spark.range(0, 200).selectExpr("id as k", "id * 2 as v")
    val ds = SpaceDataset.create(spark, loc, rows.schema, Seq("k"))
    // overlapping ranges so the incremental pass has a dirty set and
    // actually consults the merge-fraction conf
    ds.append(rows.filter(col("k") < 120))
    ds.append(rows.filter(col("k") >= 80))
    val key = "spark.graft.cluster.mergeFraction"
    for (bad <- Seq("potato", "NaN", "-0.5")) {
      spark.conf.set(key, bad)
      try {
        val e = intercept[IllegalArgumentException](
          ds.clusterBy(Seq("k"), 50L, incremental = true))
        assert(e.getMessage.contains(key), s"error for '$bad' must name the conf key")
      } finally spark.conf.unset(key)
    }
    // a valid value still works
    spark.conf.set(key, "0.5")
    try ds.clusterBy(Seq("k"), 50L, incremental = true)
    finally spark.conf.unset(key)
  }
}
