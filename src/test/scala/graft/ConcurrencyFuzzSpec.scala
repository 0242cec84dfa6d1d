package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Multi-writer SERIALIZABILITY fuzz (VERDICT r12/r13 queue): seeded
  * racing writers interleave appends, inserts, upserts, CoW deletes and
  * merge-on-read deletes on one table while a maintenance thread races
  * compact / rewrite_manifests / a rebucket attempt against them.
  *
  * The oracle is a per-thread sequential MODEL: each writer touches a
  * PRIVATE key range, so any serialization of the committed ops yields
  * exactly the union of the per-thread models (ops on one key are
  * totally ordered by their thread; cross-thread conflicts only force
  * retries, never change effects). After the run the table must equal
  * that union — no lost rows (a compact racing a delete must not
  * resurrect its victims' files), no duplicates (a retried op must
  * land exactly once), no torn maintenance (compacts are
  * content-neutral) — and the snapshot history must be LINEAR. */
class ConcurrencyFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private val Keys = 4000L // per-writer private keyspace

  test("seeded writer+maintenance race converges to the sequential model") {
    import spark.implicits._
    val loc = Files.createTempDirectory("graft_cfuzz_").toString + "/tbl"
    val schema = Seq((0L, 0.0, "x")).toDF("id", "v", "pad").schema
    SpaceDataset.create(spark, loc, schema, Seq("id"))

    val writers = 2
    val opsPerWriter = 8
    val pool = Executors.newFixedThreadPool(writers + 1)
    val start = new CountDownLatch(1)
    // thread-local models, merged after the pool drains
    val models = Array.fill(writers)(mutable.Map.empty[Long, Double])
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    def rowsDF(rows: Seq[(Long, Double)]) =
      rows.map { case (k, v) => (k, v, s"pad_$k") }.toDF("id", "v", "pad")

    def withRetry(what: String)(op: => Unit): Unit = {
      var attempts = 0
      while (attempts < 30) {
        attempts += 1
        try { op; return }
        catch { case _: ConcurrentCommitException => Thread.sleep(20L * attempts) }
      }
      throw new IllegalStateException(s"$what failed to commit in 30 attempts")
    }

    val writerFutures = (0 until writers).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = try {
          start.await()
          val rnd = new Random(1234 + w)
          val ds = SpaceDataset.load(spark, loc)
          val base = (w + 1) * 1000000L
          val model = models(w)
          var nextFresh = 0L
          for (i <- 0 until opsPerWriter) {
            rnd.nextInt(4) match {
              case 0 => // insert a fresh batch
                val fresh = (nextFresh until nextFresh + 300L).map(k =>
                  (base + k, rnd.nextInt(1000).toDouble))
                nextFresh += 300L
                withRetry(s"w$w insert $i")(ds.insert(rowsDF(fresh)))
                fresh.foreach { case (k, v) => model(k) = v }
              case 1 => // upsert: rewrite a live sample + some fresh keys
                val live = rnd.shuffle(model.keys.toSeq).take(150)
                val fresh = (nextFresh until nextFresh + 100L).map(base + _)
                nextFresh += 100L
                val rows = (live ++ fresh).map(k => (k, rnd.nextInt(1000).toDouble))
                withRetry(s"w$w upsert $i")(ds.upsert(rowsDF(rows)))
                rows.foreach { case (k, v) => model(k) = v }
              case 2 => // CoW delete by predicate over the private range
                val m = 2 + rnd.nextInt(4)
                val r = rnd.nextInt(m)
                val cond = col("id") >= base && col("id") < base + Keys &&
                  col("id") % m === r
                withRetry(s"w$w cowdel $i")(ds.delete(cond))
                model.keys.filter(k => (k - base) < Keys && k % m == r)
                  .toSeq.foreach(model.remove)
              case 3 => // merge-on-read delete (vectors, zero rewrites)
                val m = 3 + rnd.nextInt(4)
                val r = rnd.nextInt(m)
                val cond = col("id") >= base && col("id") < base + Keys &&
                  col("id") % m === r
                withRetry(s"w$w mordel $i")(
                  ds.delete(cond, dvMaxFraction = Some(1.0)))
                model.keys.filter(k => (k - base) < Keys && k % m == r)
                  .toSeq.foreach(model.remove)
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }

    val maintFuture = pool.submit(new Runnable {
      def run(): Unit = try {
        start.await()
        val ds = SpaceDataset.load(spark, loc)
        for (i <- 0 until 6) {
          try {
            i % 3 match {
              case 0 => ds.compact(targetFileRows = 100000L)
              case 1 => ds.rewriteManifests(targetFilesPerManifest = 8L)
              case 2 =>
                // layout evolution demands a quiet table (Strict): under
                // racing writers it may lose — losing is the CORRECT
                // outcome, succeeding must stay content-neutral
                ds.rebucket(Seq(if (i < 3) 4 else 8), columns = Some(Seq("id")))
            }
          } catch { case _: ConcurrentCommitException => }
          Thread.sleep(150)
        }
      } catch { case t: Throwable => errors.add(t) }
    })

    start.countDown()
    (writerFutures :+ maintFuture).foreach(_.get(600, TimeUnit.SECONDS))
    pool.shutdown()
    assert(errors.isEmpty, s"racing thread failed: ${errors.peek()}")

    val ds = SpaceDataset.load(spark, loc)
    val expected = models.flatMap(_.toSeq).toSeq
    val got = ds.readAll().select("id", "v").as[(Long, Double)].collect().toSeq
    // exactly-once per PK: no duplicates from retried ops
    assert(got.map(_._1).distinct.size == got.size,
      "duplicate primary keys after the race")
    val gotMap = got.toMap
    val lost = expected.filterNot { case (k, v) => gotMap.get(k).contains(v) }
    val resurrected = gotMap.keySet -- expected.map(_._1).toSet
    assert(lost.isEmpty,
      s"${lost.size} rows lost or stale after the race (first: ${lost.take(3)})")
    assert(resurrected.isEmpty,
      s"${resurrected.size} deleted rows resurrected (first: ${resurrected.take(3)})")
    // single-winner protocol leaves a LINEAR committed history
    val parents = ds.storage.metadata.snapshots.values.flatMap(_.parentSnapshotId).toSeq
    assert(parents.distinct.size == parents.size, s"non-linear history: $parents")
  }
}
