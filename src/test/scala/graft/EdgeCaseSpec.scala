package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

class EdgeCaseSpec extends AnyFunSuite {
  import TestSpark._

  private def orders = Tables.read(spark, sfDir, "orders")

  private def fresh(): String =
    Files.createTempDirectory("graft_edge_").toString + "/tbl"

  test("empty table reads as empty DataFrame with full schema") {
    val ds = SpaceDataset.create(spark, fresh(), orders.schema, Seq("o_orderkey"))
    val df = ds.readAll()
    assert(df.count() == 0)
    assert(df.schema.fieldNames.toSeq == orders.schema.fieldNames.toSeq)
    assert(ds.plan().files.isEmpty)
    assert(ds.versions().count() == 1) // snapshot 0
  }

  test("delete-all leaves a readable empty table; time travel still works") {
    val ds = SpaceDataset.create(spark, fresh(), orders.schema, Seq("o_orderkey"))
    ds.append(orders.limit(500))
    ds.delete(lit(true))
    assert(ds.readAll().count() == 0)
    assert(ds.read(version = Some("1")).count() == 500)
    // changelog recorded all rows as deleted
    val cl = ds.storage.changeLog(ds.storage.metadata.currentSnapshotId).get
    assert(cl.deletedRows.map(_.numRows).sum == 500)
    assert(cl.deletedRows.forall(_.allRows))
    // stats back to zero
    assert(ds.storage.metadata.currentSnapshot.storageStatistics.numRows == 0)
  }

  test("upsert into empty table behaves as append") {
    val ds = SpaceDataset.create(spark, fresh(), orders.schema, Seq("o_orderkey"))
    ds.upsert(orders.limit(100))
    assert(ds.readAll().count() == 100)
  }

  test("append of an empty DataFrame commits no files") {
    val ds = SpaceDataset.create(spark, fresh(), orders.schema, Seq("o_orderkey"))
    ds.append(orders.filter(lit(false)))
    assert(ds.readAll().count() == 0)
    assert(ds.storage.metadata.currentSnapshot.manifestFiles.indexManifestFiles.isEmpty)
  }

  test("diff over a no-change range is empty") {
    val ds = SpaceDataset.create(spark, fresh(), orders.schema, Seq("o_orderkey"))
    ds.append(orders.limit(10))
    assert(ds.diff("1", "1").isEmpty)
  }
}
