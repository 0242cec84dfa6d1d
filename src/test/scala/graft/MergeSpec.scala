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

  test("NOT MATCHED BY SOURCE: delete + conditional update sync the target") {
    val ds = freshDs()
    ds.append(kv((1L, "one", "keep"), (2L, "two", "stale"),
      (3L, "three", "keep"), (4L, "four", "stale"), (5L, "five", "keep")))
    // source matches 1 and 3; 2/4/5 are NOT matched by source
    val snap = ds.merge(kv((1L, "ONE", "u"), (3L, "THREE", "u"), (9L, "NINE", "i")))
      .whenMatchedUpdate()
      .whenNotMatchedInsert()
      .whenNotMatchedBySourceDelete(col("op") === "stale") // kills 2 and 4
      .whenNotMatchedBySourceUpdate(
        Map("v" -> concat(col("v"), lit("_old"))))          // rewrites 5
      .execute()
    val got = ds.readAll().collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "ONE", "u"), (3L, "THREE", "u"),
      (5L, "five_old", "keep"), (9L, "NINE", "i")))

    // ONE snapshot; CDC encodes updates (matched AND by-source) as
    // DELETE+ADD of the same keys, deletes as plain DELETE
    val batches = ChangeData.diff(spark, ds.storage, snap - 1, snap)
    assert(batches.map(_.changeType) == Seq(ChangeType.Delete, ChangeType.Add))
    val delKeys = batches.head.data.collect().map(_.getLong(0)).sorted
    assert(delKeys.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val addKeys = batches(1).data.collect().map(_.getLong(0)).sorted
    assert(addKeys.toSeq == Seq(1L, 3L, 5L, 9L))
  }

  test("NOT MATCHED BY SOURCE: delete-only sync makes target = source keys") {
    val ds = freshDs()
    ds.append(kv((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "x")))
    ds.merge(kv((2L, "B", "u"), (4L, "D", "i")))
      .whenMatchedUpdate()
      .whenNotMatchedInsert()
      .whenNotMatchedBySourceDelete()
      .execute()
    val got = ds.readAll().collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((2L, "B"), (4L, "D")))
    assert(ds.countRows() == 2)
  }

  test("NOT MATCHED BY SOURCE update: RHS sees the PRE-update row; PKs rejected") {
    val ds = freshDs()
    ds.append(kv((1L, "a", "p"), (2L, "b", "q")))
    // swap v and op on unmatched rows: staging must read pre-update values
    ds.merge(kv((1L, "A", "u")))
      .whenMatchedUpdate()
      .whenNotMatchedBySourceUpdate(Map("v" -> col("op"), "op" -> col("v")))
      .execute()
    val got = ds.readAll().collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "A", "u"), (2L, "q", "b")))

    intercept[IllegalArgumentException] {
      ds.merge(kv((1L, "x", "y")))
        .whenNotMatchedBySourceUpdate(Map("id" -> lit(99L))).execute()
    }
  }

  test("nondeterministic merge conditions/assignments are rejected") {
    // every merge cond/assignment is evaluated MORE THAN ONCE (delete-key
    // union vs re-append) — a rand() would lose or duplicate rows
    // silently, so the builder refuses it up front (ADVICE r11)
    val ds = freshDs()
    ds.append(kv((1L, "a", "p"), (2L, "b", "q")))
    val src = kv((1L, "A", "u"))
    def rej(b: => MergeBuilder): Unit = {
      val e = intercept[IllegalArgumentException](b.execute())
      assert(e.getMessage.contains("deterministic"))
    }
    rej(ds.merge(src).whenMatchedUpdate().whenMatchedDelete(rand() < 0.5))
    rej(ds.merge(src).whenNotMatchedBySourceDelete(rand() < 0.5))
    rej(ds.merge(src).whenNotMatchedBySourceUpdate(Map("v" -> lit("x")), rand() < 0.5))
    rej(ds.merge(src).whenNotMatchedBySourceUpdate(
      Map("v" -> concat(col("v"), rand().cast("string")))))
    // the table is untouched: no clause ever ran
    assert(content(ds) == Set((1L, "a", "p"), (2L, "b", "q")))
    // deterministic equivalents still work
    ds.merge(src).whenMatchedUpdate()
      .whenNotMatchedBySourceUpdate(Map("v" -> lit("x")), col("op") === "q")
      .execute()
    assert(content(ds) == Set((1L, "A", "u"), (2L, "x", "q")))
  }
}
