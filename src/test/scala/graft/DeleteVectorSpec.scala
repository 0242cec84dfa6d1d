package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Merge-on-read deletion vectors: DML writes a vector instead of
  * rewriting when the dead fraction is small; reads mask; CDC stays
  * DELETE+ADD-exact; maintenance rewrites fold vectors in; GC covers
  * vector files. */
class DeleteVectorSpec extends AnyFunSuite {
  import TestSpark._

  private def freshLoc(p: String): String =
    Files.createTempDirectory(s"graft_dv_${p}_").toString + "/tbl"

  private val FracKey = DeleteVectorOps.DvMaxFractionKey

  private def withMor[A](frac: String = "1.0")(body: => A): A = {
    spark.conf.set(FracKey, frac)
    try body finally spark.conf.unset(FracKey)
  }

  private def assertSame(got: DataFrame, exp: DataFrame): Unit = {
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty &&
      got.count() == exp.count())
  }

  /** Dense-keyed frame: k in [1, n], v = 2k, g = k mod 97. */
  private def dense(n: Int): DataFrame =
    spark.range(1, n + 1).select(col("id").as("k"),
      (col("id") * 2).as("v"), pmod(col("id"), lit(97)).as("g"))

  /** Multi-file table over dense keys (two appends, 4 files each). */
  private def mkTable(name: String, n: Int = 1000): SpaceDataset = {
    val df = dense(n)
    val ds = SpaceDataset.create(spark, freshLoc(name), df.schema, Seq("k"))
    ds.append(df.filter(col("k") <= n / 2).repartition(4))
    ds.append(df.filter(col("k") > n / 2).repartition(4))
    ds
  }

  test("a small delete writes a vector, rewrites NOTHING, and reads mask exactly") {
    val ds = mkTable("basic")
    val before = ds.storage.metadata.currentSnapshot
    val beforeManifests = before.manifestFiles.indexManifestFiles.toSet

    withMor() { ds.delete(col("k") % 100 === 0) }

    val after = ds.storage.metadata.currentSnapshot
    // merge-on-read: ZERO rewritten bytes — the manifest set is untouched
    assert(after.manifestFiles.indexManifestFiles.toSet == beforeManifests,
      "MoR delete must not add or remove a single index manifest")
    assert(after.deleteVectorFile.isDefined, "a delete vector file must exist")
    val dvs = ds.storage.deleteVectors(after.snapshotId)
    assert(dvs.nonEmpty && dvs.values.forall(v => !v.allRows && v.bitmapB64.isDefined))
    assert(dvs.values.map(_.numRows).sum == 10L) // k in {100,...,1000}

    // reads mask; O(1) countRows stays exact
    assert(ds.readAll().filter(col("k") % 100 === 0).count() == 0)
    assert(ds.readAll().count() == 990)
    assert(ds.countRows() == 990)

    // filtered reads still work through the mask
    assert(ds.read(filter = Some(col("k") === 100L)).count() == 0)
    assert(ds.read(filter = Some(col("k") === 101L)).count() == 1)
  }

  test("MoR and CoW deletes produce IDENTICAL CDC and final content") {
    val mor = mkTable("cdc_mor")
    val cow = mkTable("cdc_cow")
    val cond = col("k") % 7 === 0

    val morSnap = withMor() { mor.delete(cond) }
    val cowSnap = cow.delete(cond)

    assertSame(mor.readAll(), cow.readAll())

    val morDiff = ChangeData.diff(spark, mor.storage, morSnap - 1, morSnap)
    val cowDiff = ChangeData.diff(spark, cow.storage, cowSnap - 1, cowSnap)
    assert(morDiff.map(_.changeType) == cowDiff.map(_.changeType))
    val morKeys = morDiff.head.data.collect().map(_.getLong(0)).sorted
    val cowKeys = cowDiff.head.data.collect().map(_.getLong(0)).sorted
    assert(morKeys.sameElements(cowKeys), "DELETE batches must carry the same keys")

    // full-row delete reads (aggregate-view maintenance path) work too:
    // MoR-deleted rows are still physically present in live files
    val fullRows = ChangeData.diff(spark, mor.storage, morSnap - 1, morSnap,
      deletesPksOnly = false).head.data
    assert(fullRows.columns.toSeq == Seq("k", "v", "g"))
    assert(fullRows.count() == morKeys.length)
  }

  test("an aggregate view refreshes exactly over MoR deletes") {
    val src = mkTable("aggsrc")
    val av = graft.views.AggregateView.create(spark, freshLoc("aggmv"), src, Seq("g"),
      Seq(graft.views.AggSpec.sum("v", "sum_v"), graft.views.AggSpec.countAll("n")))
    assert(av.refresh() == 1)
    withMor() { src.delete(col("k") % 3 === 0) }
    assert(av.refresh() == 1)
    val exp = src.readAll().groupBy("g").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
    assertSame(av.read(), exp)
  }

  test("successive MoR deletes merge vectors; re-delete cannot double-log") {
    val ds = mkTable("merge")
    val s1 = withMor() { ds.delete(col("k") <= 20) }
    val dv1 = ds.storage.deleteVectors(s1).values.map(_.numRows).sum
    assert(dv1 == 20L)
    // overlapping second delete: 1..20 already dead and masked, so only
    // 21..30 may match and be logged
    val s2 = withMor() { ds.delete(col("k") <= 30) }
    val cl = ds.storage.changeLog(s2).get
    assert(cl.deletedRows.map(_.numRows).sum == 10L,
      "second delete must log only the newly-dead rows")
    val dv2 = ds.storage.deleteVectors(s2).values.map(_.numRows).sum
    assert(dv2 == 30L, "vectors must merge, not replace")
    assert(ds.readAll().filter(col("k") <= 30).count() == 0)
    assert(ds.countRows() == 970)
  }

  test("a heavy delete takes the CoW leg and FOLDS the files' existing vectors") {
    val ds = mkTable("fold")
    withMor() { ds.delete(col("k") % 10 === 0) } // 10% per file -> vectors
    assert(ds.storage.deleteVectors(ds.storage.metadata.currentSnapshotId).nonEmpty)

    // ~50% dead per file > threshold 0.2 -> CoW rewrite of EVERY file
    withMor("0.2") { ds.delete(col("k") % 2 === 1) }
    val head = ds.storage.metadata.currentSnapshotId
    assert(ds.storage.deleteVectors(head).isEmpty,
      "CoW rewrite of every vector-carrying file must retire all vectors")
    // live = even k not divisible by 10: 400 rows
    assert(ds.readAll().count() == 400)
    assert(ds.countRows() == 400, "folded stats must stay exact")
    assert(ds.readAll().filter(col("k") % 10 === 0 || col("k") % 2 === 1).count() == 0)
  }

  test("time travel: the pre-delete snapshot reads unmasked, the MoR snapshot masked") {
    val ds = mkTable("tt")
    val pre = ds.storage.metadata.currentSnapshotId
    val s = withMor() { ds.delete(col("k") <= 100) }
    assert(ds.read(version = Some(pre.toString)).count() == 1000)
    assert(ds.read(version = Some(s.toString)).count() == 900)
    assert(ds.countRows(Some(pre.toString)) == 1000)
  }

  test("compact folds every vector: reads equal, stats exact, export restored") {
    val ds = mkTable("compact")
    withMor() { ds.delete(col("k") % 5 === 0) }
    intercept[IllegalArgumentException](ds.indexFiles()) // export blocked under vectors

    val res = ds.compact(targetFileRows = 100000L)
    assert(res.isDefined, "vector-carrying files must be compaction input")
    val head = ds.storage.metadata.currentSnapshotId
    assert(ds.storage.deleteVectors(head).isEmpty, "compact must fold all vectors")
    assert(ds.countRows() == 800)
    assert(ds.readAll().count() == 800)
    assert(ds.readAll().filter(col("k") % 5 === 0).count() == 0)
    // raw export is sound again: the files themselves hold live rows only
    val raw = spark.read.parquet(ds.indexFiles(): _*)
    assert(raw.count() == 800)
  }

  test("upsert under MoR: delete leg writes vectors, content stays exact") {
    val ds = mkTable("upsert")
    val bump = dense(1000).filter(col("k") <= 50).withColumn("v", col("v") + 100000L)
    withMor() { ds.upsert(bump) }
    val head = ds.storage.metadata.currentSnapshotId
    assert(ds.storage.deleteVectors(head).nonEmpty, "upsert's delete leg must take MoR")
    val got = ds.readAll()
    assert(got.count() == 1000 && ds.countRows() == 1000)
    assert(got.filter(col("k") <= 50 && col("v") < 100000L).count() == 0)
    assert(got.groupBy("k").count().filter(col("count") > 1).count() == 0)
  }

  test("whole-table overwrite logs LIVE complements for vector files and retires them") {
    val ds = mkTable("ow")
    withMor() { ds.delete(col("k") <= 100) }
    val s = ds.overwrite(dense(10))
    assert(ds.storage.deleteVectors(s).isEmpty)
    val cl = ds.storage.changeLog(s).get
    // the DELETE rowsets must cover exactly the LIVE rows (not physical):
    // re-deleting MoR-dead rows would double-subtract in an agg view
    assert(cl.deletedRows.map(_.numRows).sum == 900L)
    assert(ds.countRows() == 10)
  }

  test("GC keeps live DV files, reaps superseded ones") {
    val ds = mkTable("gc")
    val s1 = withMor() { ds.delete(col("k") <= 10) }
    val dv1 = ds.storage.snapshotOrFail(s1).deleteVectorFile.get
    val s2 = withMor() { ds.delete(col("k") <= 20) }
    val dv2 = ds.storage.snapshotOrFail(s2).deleteVectorFile.get
    assert(dv1 != dv2)

    // both snapshots live: both DV files survive GC
    ds.garbageCollect(minAgeMs = 0L)
    val root = java.nio.file.Paths.get(ds.location)
    assert(java.nio.file.Files.exists(root.resolve(dv1)))
    assert(java.nio.file.Files.exists(root.resolve(dv2)))

    // expire s1: its DV file becomes an orphan, the head's survives
    ds.expireSnapshots(olderThanMs = -1000L, keepLast = 1)
    ds.garbageCollect(minAgeMs = 0L)
    assert(!java.nio.file.Files.exists(root.resolve(dv1)), "superseded DV must be reaped")
    assert(java.nio.file.Files.exists(root.resolve(dv2)), "live DV must survive")
    // reads still mask correctly after GC
    assert(ds.readAll().filter(col("k") <= 20).count() == 0)
    assert(ds.countRows() == 980)
  }

  test("SQL reads through the catalog mask vector-carrying snapshots") {
    val root = Files.createTempDirectory("graft_dv_sql_").toString
    spark.conf.set("spark.sql.catalog.graft_dv",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_dv.location", root)
    try {
      spark.sql("CREATE TABLE graft_dv.t (id BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('primary_keys'='id')")
      import spark.implicits._
      val ds = SpaceDataset.load(spark, s"$root/t")
      ds.append((1L to 500L).map(i => (i, i * 2)).toDF("id", "v").repartition(3))
      withMor() { ds.delete(col("id") % 10 === 0) }
      assert(ds.storage.deleteVectors(ds.storage.metadata.currentSnapshotId).nonEmpty)

      // vector observability: the delete_vectors metadata table reports
      // the per-file soft-delete debt AND its fraction of physical rows
      // (the input of compact's dvDebtFraction policy)
      assert(spark.sql("SELECT sum(_NUM_DELETED) FROM graft_dv.t.delete_vectors")
        .collect()(0).getLong(0) == 50L)
      val frac = spark.sql(
        "SELECT sum(_NUM_DELETED), sum(_NUM_ROWS), max(_DEAD_FRACTION) " +
          "FROM graft_dv.t.delete_vectors").collect()(0)
      assert(frac.getLong(1) == 500L, "physical rows must sum to the table size")
      assert(frac.getDouble(2) > 0.0 && frac.getDouble(2) < 1.0)

      // plain SELECT masks
      assert(spark.sql("SELECT count(*) FROM graft_dv.t").collect()(0).getLong(0) == 450L)
      assert(spark.sql("SELECT count(*) FROM graft_dv.t WHERE id % 10 = 0")
        .collect()(0).getLong(0) == 0L)
      // aggregation over the masked relation
      assert(spark.sql("SELECT sum(v) FROM graft_dv.t").collect()(0).getLong(0) ==
        2L * (1L to 500L).filterNot(_ % 10 == 0).sum)
      // time travel to the pre-delete snapshot stays unmasked
      assert(spark.sql("SELECT count(*) FROM graft_dv.t VERSION AS OF 1")
        .collect()(0).getLong(0) == 500L)
      // SUBQUERY expressions over the vector-carrying table mask too
      // (their plans analyze through the same rule executor)
      assert(spark.sql(
        "SELECT count(*) FROM range(1, 501) WHERE id IN (SELECT id FROM graft_dv.t)")
        .collect()(0).getLong(0) == 450L)
      assert(spark.sql(
        "SELECT (SELECT count(*) FROM graft_dv.t WHERE id % 10 = 0) AS n")
        .collect()(0).getLong(0) == 0L)

      // MERGE with the vector-carrying table as TARGET (structurally
      // unmasked; the command machinery masks internally)
      (600L to 605L).map(i => (i, i)).toDF("id", "v").createOrReplaceTempView("dv_src")
      spark.sql("MERGE INTO graft_dv.t USING dv_src ON graft_dv.t.id = dv_src.id " +
        "WHEN NOT MATCHED THEN INSERT *")
      assert(spark.sql("SELECT count(*) FROM graft_dv.t").collect()(0).getLong(0) == 456L)
      // SQL DELETE on the vector-carrying table (CoW leg folds vectors)
      spark.sql("DELETE FROM graft_dv.t WHERE id <= 5")
      assert(spark.sql("SELECT count(*) FROM graft_dv.t").collect()(0).getLong(0) == 451L)
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_dv")
      spark.conf.unset("spark.sql.catalog.graft_dv.location")
    }
  }

  test("concurrent MoR deletes of the same file: stale vector merge aborts and retries") {
    val ds = mkTable("conc")
    val other = SpaceDataset.load(spark, ds.location)
    var calls = 0
    withMor() {
      ds.storage.commitTransaction(policy = ConflictPolicy.Rewrite) { pinned =>
        calls += 1
        if (calls == 1) {
          // build a vector patch against `pinned`, then interleave a
          // competing MoR delete that moves the head AND the vectors
          val patch = DmlOps.delete(spark, ds.storage, pinned, col("k") <= 10)
          other.delete(col("k") >= 6 && col("k") <= 15) // overlapping vectors
          patch
        } else {
          // retry runs from the fresh head: recompute (now masks 6..15)
          DmlOps.delete(spark, ds.storage, pinned, col("k") <= 10)
        }
      }
    }
    assert(calls >= 2, "the stale vector patch must abort, not silently drop rows")
    // both deletes fully applied: 1..15 gone, nothing double-counted
    assert(ds.readAll().filter(col("k") <= 15).count() == 0)
    assert(ds.countRows() == 985)
    assert(ds.readAll().count() == 985)
  }

  test("clusterBy folds vectors: rewritten files shed dead rows, stats exact") {
    val ds = mkTable("cluster")
    withMor() { ds.delete(col("k") % 4 === 0) } // 250 dead, vectors on all files
    assert(ds.countRows() == 750)
    val res = ds.clusterBy(Seq("k"), targetFileRows = 300)
    assert(res.isDefined)
    val head = ds.storage.metadata.currentSnapshotId
    assert(ds.storage.deleteVectors(head).isEmpty,
      "a full clusterBy must fold every vector")
    assert(ds.countRows() == 750 && ds.readAll().count() == 750)
    assert(ds.readAll().filter(col("k") % 4 === 0).count() == 0)
    // the clustered layout now prunes point reads AND the files are
    // clean at rest (export works again)
    val p = ds.plan(Some(col("k") === 501L))
    assert(p.files.size < p.totalFiles)
    assert(spark.read.parquet(ds.indexFiles(): _*).count() == 750)
  }

  test("record-rewrite reclaims payloads whose only references are MoR-dead rows") {
    val loc = freshLoc("recrw")
    val df = dense(400).withColumn("payload",
      concat(lit("payload_"), col("k")).cast("binary"))
    val ds = SpaceDataset.create(spark, loc, df.schema, Seq("k"),
      recordFields = Seq("payload"))
    // two appends -> two record files; MoR-delete ALL rows of the first
    // append: its payload file's live references drop to zero without a
    // single index rewrite
    ds.append(df.filter(col("k") <= 200))
    ds.append(df.filter(col("k") > 200))
    withMor() { ds.delete(col("k") <= 200) }
    assert(ds.countRows() == 200)

    val res = ds.rewriteRecords(maxLiveFraction = 0.5)
    assert(res.isDefined, "an all-dead payload file must be picked")
    assert(res.get.pickedRecordFiles >= 1)
    // the rewrite folded the index vectors it touched; reads stay exact
    // with payloads intact
    val got = ds.readAll().selectExpr("k", "decode(payload, 'UTF-8') AS p").collect()
    assert(got.length == 200)
    assert(got.forall(r => r.getString(1) == s"payload_${r.getLong(0)}"))
    // expiry + GC actually delete the dead payload bytes
    ds.expireSnapshots(olderThanMs = -1000L, keepLast = 1)
    val deleted = ds.garbageCollect(minAgeMs = 0L).deleted
    assert(deleted.exists(_.startsWith("data/records/")),
      s"dead payload file must be reclaimed, got: $deleted")
    val got2 = ds.readAll().count()
    assert(got2 == 200)
  }

  test("a CoW rewrite racing a MoR delete aborts instead of resurrecting its rows") {
    val ds = mkTable("resurrect")
    val other = SpaceDataset.load(spark, ds.location)
    var calls = 0
    ds.storage.commitTransaction(policy = ConflictPolicy.Rewrite) { pinned =>
      calls += 1
      if (calls == 1) {
        // a heavy CoW delete computes survivors against `pinned`...
        val patch = DmlOps.delete(spark, ds.storage, pinned, col("k") > 500)
        // ...then a MoR delete lands on the SAME files: its dead rows
        // are invisible to the already-computed survivor set
        spark.conf.set(FracKey, "1.0")
        try other.delete(col("k") % 9 === 1)
        finally spark.conf.unset(FracKey)
        patch
      } else DmlOps.delete(spark, ds.storage, pinned, col("k") > 500)
    }
    assert(calls >= 2,
      "the stale CoW patch must abort — committing it would resurrect the " +
        "MoR delete's rows in the rewritten files")
    // both deletes fully applied after the retry
    assert(ds.readAll().filter(col("k") > 500 || col("k") % 9 === 1).count() == 0)
    assert(ds.countRows() == ds.readAll().count())
  }

  test("random access serves a vector-carrying snapshot MASKED; raw export still refuses") {
    val loc = freshLoc("guard")
    // one file, ordered by k, so ordinal == rank(k) deterministically
    val df = dense(100).withColumn("payload",
      col("k").cast("string").cast("binary"))
      .repartition(1).sortWithinPartitions("k")
    val ds = SpaceDataset.create(spark, loc, df.schema, Seq("k"),
      recordFields = Seq("payload"))
    ds.append(df)
    withMor() { ds.delete(col("k") <= 10 || col("k") % 13 === 0) }
    // dead: k in 1..10 plus multiples of 13 above 10 (13..91 → 7 rows)
    val liveKeys = (1 to 100).filterNot(k => k <= 10 || k % 13 == 0).map(_.toLong)
    val ra = new RandomAccessReader(ds, "payload")
    assert(ra.length == liveKeys.size.toLong,
      "ordinals must address LIVE rows under a delete vector")
    def str(b: Array[Byte]) = new String(b, java.nio.charset.StandardCharsets.UTF_8)
    // ordinal i is the i-th live row in file order
    assert(str(ra.get(0)) == liveKeys.head.toString)
    assert(str(ra.get(ra.length - 1)) == liveKeys.last.toString)
    val ords = Seq(0L, 3L, 17L, ra.length - 1)
    assert(ra.getBatch(ords).map(str) == ords.map(o => liveKeys(o.toInt).toString))
    // raw file export CANNOT mask (external readers see physical bytes):
    // the refusal stands until compaction folds the vectors
    intercept[IllegalArgumentException](ds.indexFiles())
    ds.compact(targetFileRows = 1000L)
    assert(ds.indexFiles().nonEmpty)
  }

  test("per-op dvMaxFraction override routes the split without touching the session conf") {
    val ds = mkTable("perop")
    val beforeManifests = ds.storage.metadata.currentSnapshot
      .manifestFiles.indexManifestFiles.toSet
    assert(spark.conf.getOption(FracKey).isEmpty)
    ds.delete(col("k") % 100 === 0, dvMaxFraction = Some(1.0))
    assert(spark.conf.getOption(FracKey).isEmpty,
      "the override must never land on the shared session conf")
    assert(ds.storage.metadata.currentSnapshot
      .manifestFiles.indexManifestFiles.toSet == beforeManifests)
    assert(ds.storage.deleteVectors(ds.storage.metadata.currentSnapshotId).nonEmpty)
    intercept[IllegalArgumentException](
      ds.delete(col("k") === 1L, dvMaxFraction = Some(1.5)))
  }

  test("dvMaxFraction is CUMULATIVE: repeated small deletes flip the file to CoW") {
    val df = dense(1000).repartition(1)
    val ds = SpaceDataset.create(spark, freshLoc("cumul"), df.schema, Seq("k"))
    ds.append(df)
    val frac = Some(0.08)
    // 5% dead → under the threshold: vector
    ds.delete(col("k") % 20 === 0, dvMaxFraction = frac)
    val afterFirst = ds.storage.metadata.currentSnapshot
    assert(ds.storage.deleteVectors(afterFirst.snapshotId).nonEmpty)
    val manifests1 = afterFirst.manifestFiles.indexManifestFiles.toSet
    // +5% dead → CUMULATIVE 10% > 8%: the delete flips the file to the
    // CoW leg, folding the existing vector (under the old per-delete
    // rule this would stay a vector forever — unbounded read debt)
    ds.delete(col("k") % 20 === 1, dvMaxFraction = frac)
    val afterSecond = ds.storage.metadata.currentSnapshot
    assert(ds.storage.deleteVectors(afterSecond.snapshotId).isEmpty,
      "the threshold-crossing delete must fold the accumulated vector")
    assert(afterSecond.manifestFiles.indexManifestFiles.toSet != manifests1,
      "the flip must rewrite the file")
    assert(ds.readAll().count() == 900)
    assert(ds.countRows() == 900)
    assert(ds.readAll().filter(col("k") % 20 <= 1).count() == 0)
  }

  test("the snapshot vector-mask broadcast is reused across reads of one snapshot") {
    val ds = mkTable("bcreuse")
    withMor() { ds.delete(col("k") % 50 === 0) }
    val missesBefore = DeleteVectorOps.broadcastCacheMisses
    // three reads of the SAME vector-carrying snapshot: one broadcast
    (1 to 3).foreach(_ => assert(ds.readAll().count() == 980))
    val misses = DeleteVectorOps.broadcastCacheMisses - missesBefore
    assert(misses == 1L,
      s"expected one broadcast for three reads of one snapshot, got $misses")
    assert(DeleteVectorOps.broadcastCacheSize <= 16)
    // a NEW snapshot's vector set broadcasts once more
    withMor() { ds.delete(col("k") % 51 === 0) }
    assert(ds.readAll().count() > 0)
    assert(DeleteVectorOps.broadcastCacheMisses - missesBefore == 2L)
  }

  test("compact dvDebtFraction: debt-heavy files rewrite, lightly-dirty files keep vectors") {
    val n = 1000
    val df = dense(n)
    val ds = SpaceDataset.create(spark, freshLoc("debt"), df.schema, Seq("k"))
    ds.append(df.filter(col("k") <= n / 2).repartition(1))
    ds.append(df.filter(col("k") > n / 2).repartition(1))
    // file A: 20% dead; file B: 2% dead — both as vectors
    ds.delete(col("k") <= 100, dvMaxFraction = Some(1.0))
    ds.delete(col("k") > 500 && col("k") % 50 === 3, dvMaxFraction = Some(1.0))
    val dvs0 = ds.storage.deleteVectors(ds.storage.metadata.currentSnapshotId)
    assert(dvs0.size == 2)
    val (heavy, light) = {
      val s = dvs0.toSeq.sortBy(-_._2.numRows)
      (s.head._1, s.last._1)
    }
    spark.conf.set(CompactOp.DvDebtFractionKey, "0.1")
    try {
      // neither file is small (500 phys rows, threshold 250) — only the
      // debt-heavy one self-selects
      ds.compact(targetFileRows = 500L)
    } finally spark.conf.unset(CompactOp.DvDebtFractionKey)
    val dvs1 = ds.storage.deleteVectors(ds.storage.metadata.currentSnapshotId)
    assert(!dvs1.contains(heavy), "the 20%-dead file must fold")
    assert(dvs1.contains(light), "the 2%-dead file must keep its cheap vector")
    // default policy (0) folds the remainder
    ds.compact(targetFileRows = 500L)
    assert(ds.storage.deleteVectors(ds.storage.metadata.currentSnapshotId).isEmpty)
    assert(ds.readAll().count() ==
      (1 to n).count(k => k > 100 && !(k > 500 && k % 50 == 3)).toLong)
    // keyed validation on garbage conf
    spark.conf.set(CompactOp.DvDebtFractionKey, "lots")
    try {
      val e = intercept[IllegalArgumentException](ds.compact(targetFileRows = 500L))
      assert(e.getMessage.contains(CompactOp.DvDebtFractionKey))
    } finally spark.conf.unset(CompactOp.DvDebtFractionKey)
  }
}
