package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Optimistic-concurrency stress: real racing writers. The protocol is
  * single-winner-per-head (storage.py:545-596 semantics): losers abort
  * with ConcurrentCommitException and may retry on the new head. After
  * all writers finish, the table must contain exactly the union of the
  * committed writers' rows — no lost updates, no duplicates. */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  test("racing appends: every committed writer's rows survive, losers abort cleanly") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_conc_").toString + "/tbl"
    SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))

    val writers = 4
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val committed = new AtomicInteger(0)
    val aborted = new AtomicInteger(0)

    val futures = (0 until writers).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          val ds = SpaceDataset.load(spark, loc)
          val slice = orders.filter(col("o_orderkey") % writers === w).limit(50)
            .withColumn("o_orderkey", col("o_orderkey") + lit(w * 1000000L))
          var attempts = 0
          var done = false
          while (!done && attempts < 10) {
            attempts += 1
            try {
              ds.append(slice)
              committed.incrementAndGet()
              done = true
            } catch {
              case _: ConcurrentCommitException => aborted.incrementAndGet()
            }
          }
          assert(done, s"writer $w failed to commit in 10 attempts")
        }
      })
    }
    start.countDown()
    futures.foreach(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()

    assert(committed.get() == writers)
    val ds = SpaceDataset.load(spark, loc)
    val expected = (0 until writers).map(w =>
      orders.filter(col("o_orderkey") % writers === w).limit(50).count()).sum
    assert(ds.readAll().count() == expected)
    // snapshot chain is linear: every commit has a distinct parent
    val parents = ds.storage.metadata.snapshots.values.flatMap(_.parentSnapshotId).toSeq
    assert(parents.distinct.size == parents.size, s"non-linear history: $parents")
  }
}
