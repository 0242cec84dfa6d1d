package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Model-based fuzz for INCREMENTAL clustering: a seeded random
  * sequence of appends and incremental passes — with NO manual full
  * pass, ever — must (a) preserve table content exactly, (b) rewrite a
  * strict subset per pass EXCEPT when the delta tier outgrows the merge
  * fraction, where the pass must SELF-TRIGGER a full tier merge,
  * (c) converge — an immediate second pass is always a no-op — and
  * (d) keep point-read amplification at ≤2 files after every pass. */
class ClusterFuzzSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("long append/cluster lifecycle: content exact, merges self-trigger, reads stay ≤2 files") {
    val rnd = new scala.util.Random(20260815L)
    val loc = Files.createTempDirectory("graft_clusfuzz_").toString + "/tbl"
    val schema = Seq.empty[(Long, Long, Double)].toDF("id", "k", "v").schema
    val ds = SpaceDataset.create(spark, loc, schema, Seq("id"),
      statsFields = Seq("k"))
    var nextId = 0L
    val model = scala.collection.mutable.Set.empty[(Long, Long, Double)]

    def appendRandom(n: Int, parts: Int): Unit = {
      val rows = (0 until n).map { i =>
        (nextId + i, rnd.nextLong(10000L), rnd.nextDouble())
      }
      nextId += n
      model ++= rows
      ds.append(rows.toDF("id", "k", "v").repartition(parts))
    }

    appendRandom(3000, 4)
    ds.clusterBy(Seq("k"), targetFileRows = 600) // initial full pass
    var fullMerges = 0

    for (step <- 1 to 14) {
      appendRandom(200 + rnd.nextInt(400), 1 + rnd.nextInt(3))
      val before = ds.plan().files.size
      val res = ds.clusterBy(Seq("k"), targetFileRows = 600, incremental = true)
      res.foreach { r =>
        // either a strict-subset pass, or the SELF-TRIGGERED tier merge
        // (delta tier > mergeFraction × backbone → rewrite everything)
        if (r.rewrittenFiles == before) fullMerges += 1
        else assert(r.rewrittenFiles < before,
          s"step $step: rewrote ${r.rewrittenFiles} of $before")
      }
      // immediate second pass: converged, no snapshot
      val snap = ds.storage.metadata.currentSnapshotId
      assert(ds.clusterBy(Seq("k"), targetFileRows = 600, incremental = true).isEmpty,
        s"step $step: second pass must no-op")
      ds.storage.reload()
      assert(ds.storage.metadata.currentSnapshotId == snap)

      // content is exactly the model
      assert(ds.readAll().select("id", "k", "v").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == model.toSet,
        s"step $step: content drift")

      // two-tier read amplification: a point key never scans >2 files
      val probes = Seq.fill(5)(rnd.nextLong(10000L))
      probes.foreach { k =>
        val kept = ds.plan(Some(col("k") === k)).files.size
        assert(kept <= 2, s"step $step: point read of k=$k kept $kept files")
      }
    }
    // the policy actually engaged over the lifecycle: the delta tier
    // crossed the threshold at least once (no operator intervention),
    // and merges stay geometric rather than thrashing every pass
    assert(fullMerges >= 1, "the tier merge never self-triggered over 14 passes")
    assert(fullMerges <= 5, s"merge thrashing: $fullMerges full rewrites in 14 passes")
  }
}
