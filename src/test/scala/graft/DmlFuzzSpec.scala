package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Model-based DML lifecycle fuzz: a seeded random sequence of
  * append / delete / upsert / compact steps runs against both a graft
  * table and an in-memory Map model; after every step the table's
  * rows, the metadata-only [[SpaceDataset.countRows]], and (at the
  * end) a full CDC replay from v0 must all agree with the model.
  * Deterministic seed — a failure reproduces exactly. */
class DmlFuzzSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tableRows(ds: SpaceDataset): Map[Long, Long] =
    ds.readAll().select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("randomized DML lifecycle matches the model; CDC replay rebuilds it") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val loc = java.nio.file.Files.createTempDirectory(s"graft_fuzz${trial}_")
        .toString + "/tbl"
      val schema = Seq.empty[(Long, Long)].toDF("id", "v").schema
      val ds = SpaceDataset.create(spark, loc, schema, Seq("id"))
      var model = Map.empty[Long, Long]
      var nextId = 0L
      // tag name -> the model at tag time (for rollback restoration)
      var tagged = Map.empty[String, Map[Long, Long]]

      for (step <- 1 to 12) {
        rnd.nextInt(8) match {
          case 0 | 1 => // append a batch of FRESH ids
            val n = 20 + rnd.nextInt(80)
            val rows = (0 until n).map { i =>
              (nextId + i, rnd.nextLong(1000000L))
            }
            nextId += n
            ds.append(rows.toDF("id", "v"))
            model ++= rows
          case 2 => // predicate delete on an id congruence class
            val m = 2 + rnd.nextInt(5)
            val r = rnd.nextInt(m)
            ds.delete(pmod(col("id"), lit(m.toLong)) === r.toLong)
            model = model.filter { case (id, _) => id % m != r }
          case 3 => // upsert: overwrite some existing ids + some fresh
            val existing = rnd.shuffle(model.keys.toList)
              .take(rnd.nextInt(model.size.min(30) + 1))
              .map(id => (id, rnd.nextLong(1000000L)))
            val fresh = (0 until rnd.nextInt(20)).map { i =>
              (nextId + i, rnd.nextLong(1000000L))
            }
            nextId += fresh.length
            val batch = existing ++ fresh
            if (batch.nonEmpty) {
              ds.upsert(batch.toDF("id", "v"))
              model ++= batch
            }
          case 4 => // compact: must be a semantic no-op
            ds.compact(targetFileRows = 1000000L, smallFraction = 1.0)
          case 5 => // delete a contiguous id range
            val lo = rnd.nextLong(nextId.max(1L))
            val hi = lo + rnd.nextInt(200)
            ds.delete(col("id") >= lo && col("id") <= hi)
            model = model.filter { case (id, _) => id < lo || id > hi }
          case 6 => // tag the current state for a later rollback
            val name = s"t$step"
            ds.addTag(name)
            tagged += name -> model
          case 7 => // rollback to a random tag still on the chain;
            // off-chain tags (behind an earlier rollback) reject loudly
            if (tagged.nonEmpty) {
              val (name, snap) =
                tagged.toSeq(rnd.nextInt(tagged.size))
              try { ds.rollback(name); model = snap }
              catch { case _: IllegalArgumentException => () }
            }
        }
        assert(tableRows(ds) == model,
          s"trial $trial step $step: table diverged from model")
        assert(ds.countRows() == model.size.toLong,
          s"trial $trial step $step: countRows ${ds.countRows()} != ${model.size}")
      }

      // every tag still answers its metadata-only count — even tags
      // left behind an abandoned (rolled-back) chain stay readable
      tagged.foreach { case (name, snap) =>
        assert(ds.countRows(Some(name)) == snap.size.toLong,
          s"trial $trial: countRows($name) != tagged model size")
      }

      // CDC replay: fold every change batch from v0 to head back into a
      // map — DELETE batches carry PKs only and precede ADDs per snapshot
      val head = ds.storage.branchHead("main")
      var replay = Map.empty[Long, Long]
      ds.diff("0", head.toString).foreach { b =>
        b.changeType match {
          case ChangeType.Delete =>
            val keys = b.data.select("id").collect().map(_.getLong(0)).toSet
            replay = replay.view.filterKeys(k => !keys.contains(k)).toMap
          case ChangeType.Add =>
            replay ++= b.data.select("id", "v").collect()
              .map(r => r.getLong(0) -> r.getLong(1))
        }
      }
      assert(replay == model,
        s"trial $trial: CDC replay (${replay.size} rows) diverged from model (${model.size})")
    }
  }

  test("randomized DML mixing merge-on-read and copy-on-write matches the model") {
    val rnd = new scala.util.Random(20260815L)
    val fracKey = DeleteVectorOps.DvMaxFractionKey
    try {
      for (trial <- 1 to 3) {
        val loc = java.nio.file.Files.createTempDirectory(s"graft_morfuzz${trial}_")
          .toString + "/tbl"
        val schema = Seq.empty[(Long, Long)].toDF("id", "v").schema
        val ds = SpaceDataset.create(spark, loc, schema, Seq("id"))
        var model = Map.empty[Long, Long]
        var nextId = 0L

        for (step <- 1 to 12) {
          // every mutation runs under a random delete mode: pure CoW,
          // MoR-for-small, or always-MoR — the surfaces must be
          // indistinguishable to readers, stats, and CDC
          spark.conf.set(fracKey, Seq("0", "0.3", "1.0")(rnd.nextInt(3)))
          rnd.nextInt(7) match {
            case 0 | 1 => // append fresh ids
              val n = 20 + rnd.nextInt(80)
              val rows = (0 until n).map(i => (nextId + i, rnd.nextLong(1000000L)))
              nextId += n
              ds.append(rows.toDF("id", "v"))
              model ++= rows
            case 2 => // congruence-class delete
              val m = 2 + rnd.nextInt(5)
              val r = rnd.nextInt(m)
              ds.delete(pmod(col("id"), lit(m.toLong)) === r.toLong)
              model = model.filter { case (id, _) => id % m != r }
            case 3 => // upsert existing + fresh
              val existing = rnd.shuffle(model.keys.toList)
                .take(rnd.nextInt(model.size.min(30) + 1))
                .map(id => (id, rnd.nextLong(1000000L)))
              val fresh = (0 until rnd.nextInt(20)).map { i =>
                (nextId + i, rnd.nextLong(1000000L))
              }
              nextId += fresh.length
              val batch = existing ++ fresh
              if (batch.nonEmpty) { ds.upsert(batch.toDF("id", "v")); model ++= batch }
            case 4 => // compact folds any accumulated vectors; no-op logically
              ds.compact(targetFileRows = 1000000L, smallFraction = 1.0)
              assert(ds.storage.deleteVectors(
                ds.storage.metadata.currentSnapshotId).isEmpty,
                s"trial $trial step $step: compact left vectors behind")
            case 5 => // narrow range delete (the MoR sweet spot)
              val lo = rnd.nextLong(nextId.max(1L))
              val hi = lo + rnd.nextInt(30)
              ds.delete(col("id") >= lo && col("id") <= hi)
              model = model.filter { case (id, _) => id < lo || id > hi }
            case 6 => // single-key delete
              if (model.nonEmpty) {
                val id = model.keys.toSeq(rnd.nextInt(model.size))
                ds.delete(col("id") === id)
                model -= id
              }
          }
          assert(tableRows(ds) == model,
            s"trial $trial step $step: table diverged from model")
          assert(ds.countRows() == model.size.toLong,
            s"trial $trial step $step: countRows ${ds.countRows()} != ${model.size}")
        }

        // CDC replay across the mixed history must rebuild the model —
        // MoR DELETE batches carry the same keys CoW batches would
        val head = ds.storage.branchHead("main")
        var replay = Map.empty[Long, Long]
        ds.diff("0", head.toString).foreach { b =>
          b.changeType match {
            case ChangeType.Delete =>
              val keys = b.data.select("id").collect().map(_.getLong(0)).toSet
              replay = replay.view.filterKeys(k => !keys.contains(k)).toMap
            case ChangeType.Add =>
              replay ++= b.data.select("id", "v").collect()
                .map(r => r.getLong(0) -> r.getLong(1))
          }
        }
        assert(replay == model,
          s"trial $trial: CDC replay (${replay.size}) diverged from model (${model.size})")
      }
    } finally spark.conf.unset(fracKey)
  }
}
