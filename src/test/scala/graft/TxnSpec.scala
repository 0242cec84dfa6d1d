package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.format.TxnTag

/** Exactly-once writer transactions: appId/version watermarks skip
  * redelivered batches and the commit-lock guard makes double-commit
  * impossible even past the cheap pre-check. */
class TxnSpec extends AnyFunSuite {
  import TestSpark._

  private val kvSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))

  private def kv(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def freshDs(): SpaceDataset = {
    val loc = Files.createTempDirectory("graft_txn_").toString + "/tbl"
    SpaceDataset.create(spark, loc, kvSchema, Seq("id"))
  }

  test("appendOnce skips redelivered and older versions, per appId") {
    val ds = freshDs()
    assert(ds.appendOnce(kv(1L -> "a"), "sink-A", 0L).isDefined)
    // same version redelivered → skipped, no rows, no snapshot
    val snapBefore = { ds.storage.reload(); ds.storage.metadata.currentSnapshotId }
    assert(ds.appendOnce(kv(1L -> "dup"), "sink-A", 0L).isEmpty)
    assert(ds.appendOnce(kv(1L -> "old"), "sink-A", -1L).isEmpty)
    ds.storage.reload()
    assert(ds.storage.metadata.currentSnapshotId == snapBefore)
    assert(ds.readAll().count() == 1)
    // next version commits; an unrelated appId is independent
    assert(ds.appendOnce(kv(2L -> "b"), "sink-A", 1L).isDefined)
    assert(ds.appendOnce(kv(3L -> "c"), "sink-B", 0L).isDefined)
    assert(ds.readAll().count() == 3)
  }

  test("commit-lock guard rejects a duplicate that slips past the pre-check") {
    val ds = freshDs()
    ds.appendOnce(kv(1L -> "a"), "sink", 7L)
    // drive the raw transaction path with an already-committed tag —
    // the reload-under-lock check must refuse it with the TYPED
    // exception (appendOnce absorbs it into its documented None)
    intercept[graft.core.DuplicateTransactionException] {
      ds.storage.transaction() { _ =>
        val patch = graft.core.RecordIO.writeWithRecords(spark, ds.storage, kv(9L -> "x"))
        (Some(patch.copy(txn = Some(TxnTag("sink", 7L)))), ())
      }
    }
    assert(ds.readAll().count() == 1)
  }
}
