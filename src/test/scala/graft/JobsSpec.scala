package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** JobResult state surface (reference core/jobs.py:26-44,
  * runners.py:100-122): SUCCEEDED carries the stats update and the
  * snapshot id, FAILED carries the error message without raising,
  * SKIPPED marks no-op jobs — idempotent replays and empty deletes. */
class JobsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshTable(): JobRunner = {
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "g", "v")
    val ds = SpaceDataset.create(spark,
      Files.createTempDirectory("graft_jobs_").toString + "/tbl", df.schema, Seq("id"))
    new JobRunner(ds)
  }

  test("append succeeds with the committed stats delta and snapshot id") {
    val r = freshTable()
    val res = r.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "g", "v"))
    assert(res.state == JobState.Succeeded)
    assert(res.errorMessage.isEmpty)
    assert(res.snapshotId.contains(1L))
    assert(res.storageStatisticsUpdate.exists(_.numRows == 2L))

    val res2 = r.delete(col("g") === "a")
    assert(res2.state == JobState.Succeeded)
    assert(res2.storageStatisticsUpdate.exists(_.numRows == -1L))
  }

  test("duplicate-PK insert FAILS with a message instead of raising") {
    val r = freshTable()
    assert(r.append(Seq((1L, "a", 1.0)).toDF("id", "g", "v")).state == JobState.Succeeded)
    val res = r.insert(Seq((1L, "x", 9.0)).toDF("id", "g", "v"))
    assert(res.state == JobState.Failed)
    assert(res.errorMessage.exists(_.nonEmpty))
    assert(res.storageStatisticsUpdate.isEmpty)
    // the table is untouched by the failed job
    assert(r.ds.readAll().count() == 1L)
  }

  test("replayed appendOnce and an empty delete are SKIPPED") {
    val r = freshTable()
    assert(r.appendOnce(Seq((1L, "a", 1.0)).toDF("id", "g", "v"), "app", 7L).state
      == JobState.Succeeded)
    val replay = r.appendOnce(Seq((1L, "a", 1.0)).toDF("id", "g", "v"), "app", 7L)
    assert(replay.state == JobState.Skipped)
    assert(replay.storageStatisticsUpdate.isEmpty)

    val empty = r.delete(col("g") === "no-such-group")
    assert(empty.state == JobState.Skipped)
    assert(r.ds.readAll().count() == 1L)
  }

  test("upsert and overwrite report their stats updates") {
    val r = freshTable()
    r.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "g", "v"))
    val up = r.upsert(Seq((2L, "b", 20.0), (3L, "c", 3.0)).toDF("id", "g", "v"))
    assert(up.state == JobState.Succeeded)
    assert(up.storageStatisticsUpdate.exists(_.numRows == 1L)) // 2 rewritten, 1 new
    val ow = r.overwrite(Seq((9L, "z", 0.0)).toDF("id", "g", "v"))
    assert(ow.state == JobState.Succeeded)
    assert(ow.storageStatisticsUpdate.exists(_.numRows == -2L))
    assert(r.ds.readAll().count() == 1L)
  }
}
