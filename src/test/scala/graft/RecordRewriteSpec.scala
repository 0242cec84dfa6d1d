package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Record-payload reclamation: after CoW deletes leave a record file
  * mostly dead, rewriteRecords re-co-locates the live payloads, the
  * record manifests drop the old file, and expiry + GC reclaim the
  * bytes — with reads, random access, and CDC silence intact. */
class RecordRewriteSpec extends AnyFunSuite {
  import TestSpark._

  private def recordFilesOnDisk(loc: String): Set[String] = {
    val dir = java.nio.file.Paths.get(loc, "data", "records")
    if (!java.nio.file.Files.exists(dir)) Set.empty
    else {
      val s = java.nio.file.Files.walk(dir)
      try s.filter(p => p.toString.endsWith(".parquet"))
        .map[String](_.getFileName.toString).toArray.map(_.toString).toSet
      finally s.close()
    }
  }

  test("all-dead record files are dropped with no index rewrite at all") {
    val loc = Files.createTempDirectory("graft_rrwd_").toString + "/tbl"
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", BinaryType)))
    val ds = SpaceDataset.create(spark, loc, schema, Seq("doc_id"),
      recordFields = Seq("text"))
    import spark.implicits._
    ds.append((0L until 100L).map(i => (i, s"x-$i".getBytes("UTF-8")))
      .toDF("doc_id", "text").coalesce(1))
    ds.delete(lit(true)) // every payload row goes dead; CoW empties the index
    val before = recordFilesOnDisk(loc)
    assert(before.nonEmpty)

    val res = ds.rewriteRecords(maxLiveFraction = 0.5)
    assert(res.isDefined && res.get.pickedRecordFiles >= 1 &&
      res.get.rewrittenIndexFiles == 0 && res.get.rewrittenRows == 0L, s"got $res")
    assert(ds.storage.metadata.currentSnapshot.manifestFiles.recordManifestFiles.isEmpty,
      "record manifests must be empty once every payload file is dropped")
    assert(ds.readAll().count() == 0L)

    ds.expireSnapshots(olderThanMs = -1000L, keepLast = 0)
    ds.garbageCollect(minAgeMs = 0L)
    assert(recordFilesOnDisk(loc).isEmpty, "dead payload files must be reclaimed")
  }

  test("rewriteRecords preserves the bucket layout of a bucketed record table") {
    val loc = Files.createTempDirectory("graft_rrwb_").toString + "/tbl"
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", BinaryType)))
    val ds = SpaceDataset.create(spark, loc, schema, Seq("doc_id"),
      recordFields = Seq("text"), bucketColumns = Seq("doc_id"), numBuckets = 4)
    import spark.implicits._
    ds.append((0L until 400L).map(i => (i, s"p-$i".getBytes("UTF-8")))
      .toDF("doc_id", "text"))
    ds.delete(col("doc_id") % 8 =!= 0) // 87.5% of payloads dead
    val res = ds.rewriteRecords(maxLiveFraction = 0.5)
    assert(res.isDefined && res.get.rewrittenRows == 50L, s"got $res")
    // every rewritten index file still carries its bucket id in the name
    val files = ds.indexFiles()
    assert(files.nonEmpty && files.forall(_.matches(".*index_b\\d+_.*\\.parquet")),
      s"bucket naming lost: $files")
    // point lookup still prunes to one bucket
    val p = ds.plan(Some(col("doc_id") === 8L))
    assert(p.prunedFiles > 0, s"bucket pruning broken after rewrite: $p")
    assert(ds.readAll().count() == 50L)
  }

  test("rewriteRecords reclaims mostly-dead record files end-to-end") {
    val loc = Files.createTempDirectory("graft_rrw_").toString + "/tbl"
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", BinaryType)))
    val ds = SpaceDataset.create(spark, loc, schema, Seq("doc_id"),
      recordFields = Seq("text"))
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, s"payload-$i".getBytes("UTF-8")))
      .toDF("doc_id", "text")
    ds.append(docs.coalesce(2))                       // snap 1
    val before = recordFilesOnDisk(loc)
    assert(before.nonEmpty)

    ds.delete(col("doc_id") % 10 =!= 0)               // snap 2: 90% dead payloads
    assert(recordFilesOnDisk(loc) == before, "delete must not touch payload files")

    val res = ds.rewriteRecords(maxLiveFraction = 0.5) // snap 3
    assert(res.isDefined && res.get.pickedRecordFiles >= 1 &&
      res.get.rewrittenRows == 100L, s"unexpected $res")

    // logical content identical, payloads stitch correctly
    val back = ds.readAll().withColumn("text", decode(col("text"), "UTF-8"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back.size == 100 && back.keys.forall(_ % 10 == 0))
    assert(back(40L) == "payload-40")

    // CDC-silent: the rewrite snapshot contributes no changes
    val sid = ds.storage.metadata.currentSnapshotId
    assert(ds.diff((sid - 1).toString, sid.toString).isEmpty,
      "record rewrite must not produce CDC batches")

    // random access resolves through the NEW addresses
    val ra = new RandomAccessReader(ds, "text")
    assert(new String(ra.get(3L), "UTF-8").startsWith("payload-"))

    // a second pass finds nothing to do (everything is live now)
    assert(ds.rewriteRecords(maxLiveFraction = 0.5).isEmpty)

    // expiry + GC physically reclaim the old payload files
    ds.expireSnapshots(olderThanMs = -1000L, keepLast = 0)
    ds.garbageCollect(minAgeMs = 0L)
    val after = recordFilesOnDisk(loc)
    assert(after.intersect(before).isEmpty,
      s"old record files must be reclaimed, still present: ${after.intersect(before)}")
    // and the table still reads
    assert(ds.readAll().count() == 100L)
  }
}
