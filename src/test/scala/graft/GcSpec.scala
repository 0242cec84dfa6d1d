package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

class GcSpec extends AnyFunSuite {
  import TestSpark._

  private def freshLoc(): String =
    Files.createTempDirectory("graft_gc_").toString + "/tbl"

  private def orders = Tables.read(spark, sfDir, "orders")

  private def filesUnder(loc: String): Set[String] = {
    val root = java.nio.file.Paths.get(loc)
    val out = Set.newBuilder[String]
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) out += root.relativize(p).toString
    }
    out.result()
  }

  test("expireSnapshots keeps refs, branch heads, and keepLast; drops the rest") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.limit(100)) // snap 1
    ds.addTag("keepme")          // tag on snap 1
    ds.append(orders.limit(50).withColumn("o_orderkey", col("o_orderkey") + 1000000L)) // 2
    ds.append(orders.limit(50).withColumn("o_orderkey", col("o_orderkey") + 2000000L)) // 3
    ds.append(orders.limit(50).withColumn("o_orderkey", col("o_orderkey") + 3000000L)) // 4 (head)

    val expired = ds.expireSnapshots(olderThanMs = -1000L, keepLast = 1)
    // 0 (empty create snapshot) and 2, 3 go; 1 is tagged, 4 is the head
    assert(expired == Seq(0L, 2L, 3L))

    val st = Storage.load(loc)
    assert(st.metadata.snapshots.keySet == Set("1", "4"))
    // time travel to live snapshots still works; expired ones fail
    assert(ds.read(version = Some("keepme")).count() == 100)
    assert(ds.readAll().count() == 250)
    intercept[IllegalArgumentException](ds.read(version = Some("2")))
    // parent chain re-parented over the expired middle: diff(1 -> head) works
    assert(st.orderedSnapshotIds(1L, 4L) == Seq(4L))
  }

  test("garbageCollect deletes CoW-orphaned files but keeps CDC-referenced ones") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.repartitionByRange(4, col("o_orderkey")))
    val expectedAfter = ds.readAll().filter(col("o_orderkey") >= 500L).count()
    assert(expectedAfter > 0)
    ds.delete(col("o_orderkey") < 500L) // CoW: rewrites touched files

    // while the pre-delete snapshot is live only stale metadata jsons
    // are collectible — data and manifests all stay
    val gc0 = ds.garbageCollect(minAgeMs = 0L)
    assert(gc0.deleted.forall(_.startsWith("metadata/metadata_")),
      s"unexpected gc0 deletions: ${gc0.deleted.filterNot(_.startsWith("metadata/metadata_")).take(10)}")
    val survivors0 = filesUnder(loc)
    assert(ds.readAll().count() == expectedAfter)
    // CDC still readable after the GC
    assert(ds.diff("1", "2").nonEmpty)

    // expire everything but the head — pre-delete index files stay
    // reachable ONLY via the delete snapshot's change log
    ds.expireSnapshots(olderThanMs = -1000L, keepLast = 1)
    val gc1 = ds.garbageCollect(minAgeMs = 0L)
    val survivors1 = filesUnder(loc)
    // no data file may appear out of nowhere (metadata jsons are
    // legitimately rewritten by expireSnapshots itself)
    assert(survivors1.filter(_.startsWith("data/"))
      .subsetOf(survivors0.filter(_.startsWith("data/"))))
    // the expired snapshot's manifest and change log became collectible
    assert(gc1.deleted.exists(_.startsWith("metadata/index_manifest_")))
    assert(gc1.deleted.exists(_.startsWith("metadata/changes/")))
    // but every data file is still pinned: head manifests or the delete
    // snapshot's change log reference them all
    assert(survivors1.filter(_.startsWith("data/")) == survivors0.filter(_.startsWith("data/")))
    // something beyond metadata jsons became collectible this time
    assert(gc1.deleted.nonEmpty)
    // the table still reads correctly
    assert(ds.readAll().count() == expectedAfter)

    // re-running is a no-op
    val gc2 = ds.garbageCollect(minAgeMs = 0L)
    assert(gc2.deleted.isEmpty)
  }

  test("garbageCollect age guard protects young files") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.limit(100))
    ds.delete(col("o_orderkey") < 500L)
    ds.expireSnapshots(olderThanMs = -1000L, keepLast = 1)
    // everything on disk is seconds old: a 1h age guard deletes nothing
    val gc = ds.garbageCollect() // default minAgeMs = 1h
    assert(gc.deleted.isEmpty)
  }

  test("garbageCollect never touches external zero-copy files") {
    val loc = freshLoc()
    val extDir = Files.createTempDirectory("graft_gc_ext_").toString
    val ext = orders.limit(80)
    ext.write.mode("overwrite").parquet(extDir + "/src")
    val ds = SpaceDataset.create(spark, loc, ext.schema, Seq("o_orderkey"))
    val extFiles = new java.io.File(extDir + "/src").listFiles()
      .map(_.getPath).filter(_.endsWith(".parquet")).toSeq
    ParquetLoader.loadParquet(spark, ds, extFiles)
    ds.append(orders.limit(20).withColumn("o_orderkey", col("o_orderkey") + 900000L))
    ds.expireSnapshots(olderThanMs = -1000L, keepLast = 1)
    ds.garbageCollect(minAgeMs = 0L)
    // external files untouched, table intact
    assert(spark.read.parquet(extDir + "/src").count() == 80)
    assert(ds.readAll().count() == 100)
  }
}
