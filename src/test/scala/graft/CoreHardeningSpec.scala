package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Regression specs for the round-6 core review findings: stale-handle
  * ref updates, duplicate-transaction typing, UTF-8 stats merging,
  * overwrite of record-manifest-only snapshots, external-ingest
  * validation, null record payloads, and exclusive table creation. */
class CoreHardeningSpec extends AnyFunSuite {
  import TestSpark._

  private def freshTable(prefix: String): (String, SpaceDataset) = {
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    val loc = Files.createTempDirectory(prefix).toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, docs.schema, Seq("doc_id"))
    ds.append(docs)
    (loc, ds)
  }

  test("addTag from a STALE handle must not orphan concurrently committed snapshots") {
    val (loc, dsA) = freshTable("graft_hard_ref_")
    val dsB = SpaceDataset.load(spark, loc) // second process's handle
    // B commits AFTER A loaded its metadata
    dsB.append(Tables.read(spark, sfDir, "documents")
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang")))
    val rowsAfterB = dsB.readAll().count()
    // A's ref edit reloads under the lock — B's snapshot must survive
    dsA.addTag("v1")
    val fresh = SpaceDataset.load(spark, loc)
    assert(fresh.readAll().count() == rowsAfterB,
      "a stale-handle addTag overwrote a concurrent commit")
    assert(fresh.storage.metadata.refs.contains("v1"))
  }

  test("duplicate transaction tags throw typed; appendOnce resolves them to None") {
    val (_, ds) = freshTable("graft_hard_txn_")
    val more = Tables.read(spark, sfDir, "documents")
      .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"))
    assert(ds.appendOnce(more, "eo", 1L).isDefined)
    // redelivery through the public API: documented None
    assert(ds.appendOnce(more, "eo", 1L).isEmpty)
    // redelivery racing past the up-front check: the commit-path guard
    // must throw the TYPED exception appendOnce knows how to absorb
    val e = intercept[DuplicateTransactionException] {
      ds.storage.commitTransaction() { _ =>
        Some(graft.format.Patch(txn = Some(graft.format.TxnTag("eo", 1L))))
      }
    }
    assert(e.appId == "eo" && e.version == 1L)
  }

  test("string stats merge in UTF-8 binary order, not UTF-16 code-unit order") {
    val bmpMax = "￿"            // U+FFFF: UTF-8 EF BF BF
    val supp = "𐀀"        // U+10000: UTF-8 F0 90 80 80
    // UTF-16 code units say bmpMax > supp (surrogates sort low); UTF-8
    // bytes say supp > bmpMax — the order Spark compares min/max with
    assert(ManifestIO.maxAny(bmpMax, supp) == supp)
    assert(ManifestIO.maxAny(supp, bmpMax) == supp)
    assert(ManifestIO.minAny(bmpMax, supp) == bmpMax)
    assert(ManifestIO.minAny(supp, bmpMax) == bmpMax)
  }

  test("overwrite after a full delete drops dangling record manifests and stats") {
    val docs = Tables.read(spark, sfDir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val loc = Files.createTempDirectory("graft_hard_ow_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, docs.schema, Seq("doc_id"), Seq("payload"))
    ds.append(docs)
    // CoW delete of EVERY row rewrites the index side only: record
    // manifests (and their byte statistics) survive the delete
    ds.delete(lit(true))
    assert(ds.readAll().count() == 0)
    assert(ds.recordManifest().count() > 0, "precondition: record manifests dangle")
    val statsBefore = ds.storage.metadata
      .snapshots(ds.storage.metadata.currentSnapshotId.toString)
      .storageStatistics
    assert(statsBefore.recordUncompressedBytes > 0)

    val replacement = docs.limit(10)
    ds.overwrite(replacement)
    val stats = ds.storage.metadata
      .snapshots(ds.storage.metadata.currentSnapshotId.toString)
      .storageStatistics
    assert(ds.readAll().count() == 10)
    // ONLY the new payload bytes may remain: the dangling pre-delete
    // record manifests and their byte counts must be gone
    val freshBytes = {
      val loc2 = Files.createTempDirectory("graft_hard_ow2_").toString + "/tbl"
      val ds2 = SpaceDataset.create(spark, loc2, docs.schema, Seq("doc_id"), Seq("payload"))
      ds2.append(replacement)
      ds2.storage.metadata.snapshots(ds2.storage.metadata.currentSnapshotId.toString)
        .storageStatistics.recordUncompressedBytes
    }
    assert(stats.recordUncompressedBytes == freshBytes,
      s"record bytes ${stats.recordUncompressedBytes} != fresh-table $freshBytes — " +
        "overwrite left dangling record manifests double-counted")
  }

  test("loadParquet rejects duplicate paths and schema-incompatible files") {
    val loc = Files.createTempDirectory("graft_hard_load_").toString + "/tbl"
    val schema = Tables.read(spark, sfDir, "orders").schema
    val ds = SpaceDataset.create(spark, loc, schema, Seq("o_orderkey"))
    val src = s"$sfDir/orders.parquet"
    val dup = intercept[IllegalArgumentException] {
      ParquetLoader.loadParquet(spark, ds, Seq(src, src))
    }
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)
    // a file missing the table's PK column must be rejected up front
    val bad = intercept[IllegalArgumentException] {
      ParquetLoader.loadParquet(spark, ds, Seq(s"$sfDir/documents.parquet"))
    }
    assert(bad.getMessage.contains("o_orderkey"), bad.getMessage)
    // the valid file still loads
    ParquetLoader.loadParquet(spark, ds, Seq(src))
    assert(ds.readAll().count() == Tables.read(spark, sfDir, "orders").count())
  }

  test("random access returns null for rows with a null record payload") {
    import spark.implicits._
    val rows = Seq((1L, "one".getBytes("UTF-8")), (2L, null), (3L, "three".getBytes("UTF-8")))
      .toDF("id", "payload")
    val loc = Files.createTempDirectory("graft_hard_null_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, rows.schema, Seq("id"), Seq("payload"))
    ds.append(rows.coalesce(1).sortWithinPartitions("id"))
    val ra = new RandomAccessReader(ds, "payload")
    val got = ra.getBatch(Seq(0L, 1L, 2L))
    assert(new String(got(0), "UTF-8") == "one")
    assert(got(1) == null, "null payload must read back as null, not crash")
    assert(new String(got(2), "UTF-8") == "three")
  }

  test("creating a table twice fails instead of clobbering the first") {
    val loc = Files.createTempDirectory("graft_hard_create_").toString + "/tbl"
    val schema = Tables.read(spark, sfDir, "region").schema
    SpaceDataset.create(spark, loc, schema, Seq("r_regionkey"))
    intercept[Exception] {
      SpaceDataset.create(spark, loc, schema, Seq("r_regionkey"))
    }
  }
}
