package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** MERGE semantics: clause combinations, one-snapshot atomicity, CDC
  * encoding, and pre-pruned match scans. */
class MergeSpec extends AnyFunSuite {
  import TestSpark._

  private val kvSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType),
    StructField("op", StringType)))

  private def kv(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v", "op")
  }

  private def freshDs(): SpaceDataset = {
    val loc = Files.createTempDirectory("graft_mrg_").toString + "/tbl"
    SpaceDataset.create(spark, loc, kvSchema, Seq("id"))
  }

  private def content(ds: SpaceDataset): Set[(Long, String, String)] =
    ds.readAll().collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("update + delete + insert clauses in one snapshot") {
    val ds = freshDs()
    ds.append(kv((1L, "a", "keep"), (2L, "b", "keep"), (3L, "c", "keep")))
    val before = ds.storage.metadata.currentSnapshotId

    // source: 2 → update, 3 → delete, 4 → insert
    ds.merge(kv((2L, "b2", "u"), (3L, "c", "D"), (4L, "d", "i")))
      .whenMatchedDelete(col("op") === "D")
      .whenMatchedUpdate()
      .whenNotMatchedInsert()
      .execute()

    assert(content(ds) == Set((1L, "a", "keep"), (2L, "b2", "u"), (4L, "d", "i")))
    ds.storage.reload()
    val after = ds.storage.metadata.currentSnapshotId
    assert(after == before + 1, "merge must commit exactly one snapshot")
    // CDC: DELETE of updated (2) and deleted (3) keys, ADD of 2 and 4
    val log = ds.storage.changeLog(after).get
    assert(log.deletedRows.nonEmpty && log.addedRows.nonEmpty)
  }

  test("delete-only merge leaves unmatched-condition rows untouched") {
    val ds = freshDs()
    ds.append(kv((1L, "a", "x"), (2L, "b", "y")))
    ds.merge(kv((1L, "ignored", "D"), (2L, "ignored", "keep")))
      .whenMatchedDelete(col("op") === "D")
      .execute()
    // 2 matched but failed the delete condition and there is no update
    // clause: it must keep its ORIGINAL value
    assert(content(ds) == Set((2L, "b", "y")))
  }

  test("insert-only merge ignores matched rows") {
    val ds = freshDs()
    ds.append(kv((1L, "a", "x")))
    ds.merge(kv((1L, "CHANGED", "x"), (2L, "b", "y")))
      .whenNotMatchedInsert()
      .execute()
    assert(content(ds) == Set((1L, "a", "x"), (2L, "b", "y")))
  }

  test("merge into an empty table inserts everything") {
    val ds = freshDs()
    ds.merge(kv((1L, "a", "x"))).whenMatchedUpdate().whenNotMatchedInsert().execute()
    assert(content(ds) == Set((1L, "a", "x")))
  }

  test("duplicate source keys and missing clauses are rejected") {
    val ds = freshDs()
    ds.append(kv((1L, "a", "x")))
    intercept[IllegalArgumentException] {
      ds.merge(kv((1L, "a", "x"))).execute() // no clause
    }
    intercept[IllegalArgumentException] {
      ds.merge(kv((1L, "a", "x"), (1L, "dup", "x"))).whenMatchedUpdate().execute()
    }
  }
}
