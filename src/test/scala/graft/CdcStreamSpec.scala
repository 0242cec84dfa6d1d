package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** The graft-cdc Structured Streaming source: snapshot-id offsets,
  * DELETE-carries-PKs-only, upsert = DELETE+ADD in one snapshot, and
  * exactly-once delivery across a checkpointed restart. */
class CdcStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val kvSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))

  private def kv(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  /** Drain the CDC stream into a buffer via foreachBatch; returns the
    * collected rows as (id, v, changeType, snapshotId). */
  private def drain(loc: String, ckpt: String): Seq[(Long, Option[String], String, Long)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[String], String, Long)]
    val q = spark.readStream.format("graft-cdc").option("location", loc).load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        buf.synchronized {
          buf ++= batch.collect().map(r => (
            r.getLong(r.fieldIndex("id")),
            Option(r.getAs[String]("v")),
            r.getAs[String]("_change_type"),
            r.getLong(r.fieldIndex("_commit_snapshot_id"))))
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    buf.toSeq
  }

  test("appends, delete, and upsert stream as snapshot-stamped changes") {
    val root = Files.createTempDirectory("graft_cdcspec_").toString
    val ds = SpaceDataset.create(spark, s"$root/tbl", kvSchema, Seq("id"))
    ds.append(kv(1L -> "a", 2L -> "b"))          // snap 1: ADD x2
    ds.delete(col("id") === 1L)                  // snap 2: DELETE 1
    ds.upsert(kv(2L -> "b2", 3L -> "c"))         // snap 3: DELETE 2 + ADD (2,b2),(3,c)

    val got = drain(s"$root/tbl", s"$root/ckpt")
    assert(got.toSet == Set(
      (1L, Some("a"), "ADD", 1L),
      (2L, Some("b"), "ADD", 1L),
      (1L, None, "DELETE", 2L),        // DELETE carries PKs only
      (2L, None, "DELETE", 3L),
      (2L, Some("b2"), "ADD", 3L),
      (3L, Some("c"), "ADD", 3L)))
  }

  test("checkpointed restart delivers only snapshots committed since") {
    val root = Files.createTempDirectory("graft_cdcspec2_").toString
    val ds = SpaceDataset.create(spark, s"$root/tbl", kvSchema, Seq("id"))
    ds.append(kv(1L -> "a"))
    val first = drain(s"$root/tbl", s"$root/ckpt")
    assert(first.map(t => (t._1, t._3)) == Seq((1L, "ADD")))

    ds.append(kv(2L -> "b"))
    ds.delete(col("id") === 1L)
    val second = drain(s"$root/tbl", s"$root/ckpt") // SAME checkpoint
    assert(second.toSet == Set(
      (2L, Some("b"), "ADD", 2L),
      (1L, None, "DELETE", 3L)),
      s"restart must deliver exactly the new snapshots, got $second")
  }

  test("startingSnapshotId skips history before it") {
    val root = Files.createTempDirectory("graft_cdcspec3_").toString
    val ds = SpaceDataset.create(spark, s"$root/tbl", kvSchema, Seq("id"))
    ds.append(kv(1L -> "a"))
    ds.append(kv(2L -> "b"))
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-cdc")
      .option("location", s"$root/tbl")
      .option("startingSnapshotId", "2")
      .load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        buf.synchronized { buf ++= batch.collect().map(_.getLong(0)) }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(buf.toSeq == Seq(2L))
  }

  test("maxSnapshotsPerBatch drains a commit backlog in bounded batches") {
    val root = Files.createTempDirectory("graft_cdcspec4_").toString
    val ds = SpaceDataset.create(spark, s"$root/tbl", kvSchema, Seq("id"))
    ds.append(kv(1L -> "a")) // snap 1
    ds.append(kv(2L -> "b")) // snap 2
    ds.append(kv(3L -> "c")) // snap 3
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = spark.readStream.format("graft-cdc")
      .option("location", s"$root/tbl")
      .option("maxSnapshotsPerBatch", "1")
      .load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect().map(_.getLong(0)).toSeq
        batches.synchronized { if (rows.nonEmpty) batches += rows }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // one snapshot per micro-batch, order preserved, nothing lost
    assert(batches.toSeq == Seq(Seq(1L), Seq(2L), Seq(3L)))
  }

  test("maxFilesPerBatch splits one fat snapshot across triggers, DELETE still before ADD") {
    val root = Files.createTempDirectory("graft_cdcspec6_").toString
    val ds = SpaceDataset.create(spark, s"$root/tbl", kvSchema, Seq("id"))
    // snapshot 1: one append landing as 4 files
    ds.append(kv((1L to 40L).map(i => i -> s"v$i"): _*).repartition(4))
    // snapshot 2: upsert = DELETE rowsets + ADD rowsets in ONE snapshot
    ds.upsert(kv((1L to 8L).map(i => i -> s"u$i"): _*))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Long)]]
    val q = spark.readStream.format("graft-cdc")
      .option("location", s"$root/tbl")
      .option("maxFilesPerBatch", "1")
      .load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect().map(r => (r.getLong(0),
          r.getAs[String]("_change_type"),
          r.getLong(r.fieldIndex("_commit_snapshot_id")))).toSeq
        batches.synchronized { if (rows.nonEmpty) batches += rows }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // snapshot 1 drained in >= 2 batches (4 files, 1 per trigger)
    val snap1Batches = batches.count(_.exists(_._3 == 1L))
    assert(snap1Batches >= 4, s"fat snapshot must split, got $snap1Batches batches")
    // each batch carries at most one rowset's change type
    assert(batches.forall(b => b.map(r => (r._2, r._3)).distinct.size == 1))
    // within snapshot 2, every DELETE batch precedes every ADD batch
    val s2 = batches.zipWithIndex.filter(_._1.exists(_._3 == 2L))
    val delIdx = s2.filter(_._1.head._2 == "DELETE").map(_._2)
    val addIdx = s2.filter(_._1.head._2 == "ADD").map(_._2)
    assert(delIdx.nonEmpty && addIdx.nonEmpty && delIdx.max < addIdx.min,
      s"DELETE must drain before ADD within the split snapshot: $batches")
    // exactly-once: every change delivered exactly one time
    val all = batches.flatten
    assert(all.size == all.distinct.size, "duplicate deliveries")
    assert(all.count(r => r._3 == 1L && r._2 == "ADD") == 40)
    assert(all.count(r => r._3 == 2L && r._2 == "DELETE") == 8)
    assert(all.count(r => r._3 == 2L && r._2 == "ADD") == 8)

    // byte budget splits too (tiny budget -> one file per batch), and a
    // restart from the checkpoint delivers only what's new
    ds.append(kv(100L -> "x", 101L -> "y")
      .repartitionByRange(2, org.apache.spark.sql.functions.col("id")))
    val batches2 = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q2 = spark.readStream.format("graft-cdc")
      .option("location", s"$root/tbl")
      .option("maxBytesPerBatch", "1")
      .load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect().map(_.getLong(0)).toSeq
        batches2.synchronized { if (rows.nonEmpty) batches2 += rows }
        ()
      }
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(batches2.size == 2, s"byte budget must split the 2-file snapshot: $batches2")
    assert(batches2.flatten.sorted == Seq(100L, 101L))
  }

  test("byte budget closes the batch at a snapshot boundary, never admitting an unfitting snapshot") {
    // Regression: with the budget exhausted by snapshot 1, ZERO rowsets of
    // snapshot 2 fit. The admission loop must close the batch at the last
    // COMPLETED snapshot — returning (snap2, 0) would read as "snapshot 2
    // fully emitted" and dump the whole oversized snapshot into the batch.
    val root = Files.createTempDirectory("graft_cdcspec7_").toString
    val ds = SpaceDataset.create(spark, s"$root/tbl", kvSchema, Seq("id"))
    ds.append(kv(1L -> "a")) // snap 1: one small file
    val dataDir = java.nio.file.Paths.get(root, "tbl", "data")
    val snap1Bytes = {
      val s = java.nio.file.Files.walk(dataDir)
      try s.filter(p => p.toString.endsWith(".parquet"))
        .mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally s.close()
    }
    // snap 2: 3 files, none of which fits on top of snapshot 1's bytes
    ds.append(kv((10L to 39L).map(i => i -> s"v$i"): _*).repartition(3))

    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
    val q = spark.readStream.format("graft-cdc")
      .option("location", s"$root/tbl")
      .option("maxBytesPerBatch", snap1Bytes.toString)
      .load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect()
          .map(r => (r.getLong(0), r.getLong(r.fieldIndex("_commit_snapshot_id")))).toSeq
        batches.synchronized { if (rows.nonEmpty) batches += rows }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // batch 1 = snapshot 1 ALONE; snapshot 2 drains one file per batch
    assert(batches.head.map(_._1) == Seq(1L),
      s"first batch must stop at the snapshot boundary: ${batches.head}")
    assert(batches.count(_.exists(_._2 == 2L)) == 3,
      s"snapshot 2's three files must arrive one per batch: $batches")
    val all = batches.flatten
    assert(all.size == all.distinct.size && all.size == 31, "exactly-once violated")
  }

  test("a stream checkpointed past a rollback fails with a rollback-naming error") {
    val root = Files.createTempDirectory("graft_cdcspec8_").toString
    val ds = SpaceDataset.create(spark, s"$root/tbl", kvSchema, Seq("id"))
    ds.append(kv(1L -> "a")) // snap 1
    ds.append(kv(2L -> "b")) // snap 2
    drain(s"$root/tbl", s"$root/ckpt") // checkpoint now at snapshot 2

    ds.rollback("1")
    ds.append(kv(3L -> "c")) // snap 3 ← parent 1; snapshot 2 abandoned

    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(s"$root/tbl", s"$root/ckpt")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("rolled back")),
      s"expected a rollback-naming IllegalStateException, got: $ex")
  }

  test("a stream whose checkpoint predates expired history surfaces the expiry by name") {
    val root = Files.createTempDirectory("graft_cdcspec9_").toString
    val ds = SpaceDataset.create(spark, s"$root/tbl", kvSchema, Seq("id"))
    ds.append(kv(1L -> "a")) // snap 1
    drain(s"$root/tbl", s"$root/ckpt") // checkpoint now at snapshot 1
    ds.append(kv(2L -> "b")) // snap 2
    ds.append(kv(3L -> "c")) // snap 3
    ds.expireSnapshots(olderThanMs = -1L, keepLast = 1) // 1 and 2 expire

    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(s"$root/tbl", s"$root/ckpt")
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    // the typed ExpiredHistoryException is translated into guidance that
    // names the remedy (fresh checkpoint + startingSnapshotId), not the
    // generic rolled-back message
    assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("EXPIRED") &&
      c.getMessage.contains("startingSnapshotId")),
      s"expected an expiry-naming IllegalStateException, got: $ex")
  }

  test("the e_cdc_stream lifecycle under merge-on-read equals the copy-on-write run") {
    // the gate runs this at full scale (e_cdc_stream_mor shares
    // e_cdc_stream's oracle); this pins the equality in-process on a
    // small frame so a regression localizes here first
    val cow = graft.streaming.EventsStream.cdcStream(spark, sfDir)
    val mor = graft.streaming.EventsStream.cdcStream(spark, sfDir, morDelete = true)
    assert(cow.exceptAll(mor).isEmpty && mor.exceptAll(cow).isEmpty &&
      cow.count() == mor.count(),
      "the CDC feed a consumer streams must be identical across DML modes")
  }

  test("rate limit follows the branch chain across interleaved branch commits") {
    // snapshot ids are GLOBAL: main's chain here is 1 → 3 → 5, with exp's
    // snapshots 2 and 4 interleaved. `start + m` offset arithmetic would
    // cap the first catch-up batch at snapshot 2 — a snapshot on exp —
    // and either kill the stream or leak exp's changes into main's feed.
    val root = Files.createTempDirectory("graft_cdcspec5_").toString
    val ds = SpaceDataset.create(spark, s"$root/tbl", kvSchema, Seq("id"))
    ds.append(kv(1L -> "a"))                    // snap 1 (main)
    ds.addBranch("exp")
    ds.append(kv(10L -> "x"), branch = "exp")   // snap 2 (exp)
    ds.append(kv(2L -> "b"))                    // snap 3 (main)
    ds.append(kv(11L -> "y"), branch = "exp")   // snap 4 (exp)
    ds.append(kv(3L -> "c"))                    // snap 5 (main)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
    val q = spark.readStream.format("graft-cdc")
      .option("location", s"$root/tbl")
      .option("maxSnapshotsPerBatch", "1")
      .load()
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val rows = batch.collect().map(r =>
          (r.getLong(0), r.getLong(r.fieldIndex("_commit_snapshot_id")))).toSeq
        batches.synchronized { if (rows.nonEmpty) batches += rows }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.toSeq == Seq(
      Seq((1L, 1L)), Seq((2L, 3L)), Seq((3L, 5L))),
      s"main's feed must be exactly its own chain, got $batches")
  }

  test("streaming MV refresh follows source commits and survives restart without re-applying") {
    import graft.views._
    val root = Files.createTempDirectory("graft_mvstream_spec_").toString
    val src = SpaceDataset.create(spark, s"$root/src", kvSchema, Seq("id"))
    src.append(kv(1L -> "a", 2L -> "b", 3L -> "c"))
    val v = View.ofDataset(src).filterExpr("id != 2")
      .selectExprs("id", "upper(v) AS v")
    val mv = v.materialize(spark, s"$root/mv", Seq("id"))

    val q1 = mv.refreshStream(s"$root/ckpt")
    try {
      q1.processAllAvailable()
      src.append(kv(4L -> "d"))
      src.delete(col("id") === 1L)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(mv.dataset.readAll().orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq(3L -> "C", 4L -> "D"))
    val refreshedAfterFirst = mv.refreshedTo
    val mvSnapshotsAfterFirst = mv.dataset.storage.versions.length

    // restart from the same checkpoint with NO new source commits:
    // replayed/empty batches must not create new MV commits
    val q2 = mv.refreshStream(s"$root/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    assert(mv.refreshedTo == refreshedAfterFirst)
    assert(mv.dataset.storage.versions.length == mvSnapshotsAfterFirst,
      "a restarted stream with no new source commits must not commit to the MV")

    // new commit after restart is picked up
    val q3 = mv.refreshStream(s"$root/ckpt")
    try {
      src.append(kv(5L -> "e"))
      q3.processAllAvailable()
    } finally q3.stop()
    assert(mv.dataset.readAll().orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ==
      Seq(3L -> "C", 4L -> "D", 5L -> "E"))
  }
}
