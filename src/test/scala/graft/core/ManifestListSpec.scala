package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The manifest-list level: per-manifest summaries in snapshot metadata
  * prune WHOLE manifests at plan time; file-level stats prune within the
  * survivors. In graft.core for persistMetadata (legacy-table
  * simulation). */
class ManifestListSpec extends AnyFunSuite {
  import TestSpark._

  /** 4 range-disjoint appends → 4 manifests with disjoint key ranges,
    * each holding several range-partitioned files. */
  private def quartered(prefix: String): (SpaceDataset, org.apache.spark.sql.DataFrame) = {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory(s"graft_$prefix").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    val maxKey = orders.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val q = maxKey / 4 + 1
    (0 until 4).foreach { i =>
      ds.append(orders
        .filter(col("o_orderkey") >= i * q && col("o_orderkey") < (i + 1) * q)
        .repartitionByRange(3, col("o_orderkey")))
    }
    (ds, orders)
  }

  test("summaries prune whole manifests; results match the plain filter") {
    val (ds, orders) = quartered("mlist_")
    val meta = ds.storage.metadata
    assert(meta.currentSnapshot.manifestFiles.indexManifestFiles.size == 4)
    // every manifest carries a summary with PK stats
    meta.currentSnapshot.manifestFiles.indexManifestFiles.foreach { m =>
      val s = meta.manifestSummaries(m)
      assert(s.numFiles > 0 && s.stats.contains("o_orderkey"))
    }

    // a narrow PK filter falsifies 3 of the 4 manifests without opening them
    val lo = orders.agg(min(col("o_orderkey"))).collect()(0).getLong(0)
    val p = ds.plan(Some(col("o_orderkey") === lit(lo)))
    assert(p.totalManifests == 4)
    assert(p.prunedManifests >= 3, s"expected manifest-level pruning, got $p")
    assert(p.prunedFiles > 0)
    assert(ds.read(filter = Some(col("o_orderkey") === lit(lo))).count() ==
      orders.filter(col("o_orderkey") === lit(lo)).count())

    // an unfiltered plan keeps every manifest and file
    val full = ds.plan(None)
    assert(full.prunedManifests == 0 && full.prunedFiles == 0)
    assert(full.totalFiles == 12)
    assert(ds.readAll().count() == orders.count())

    // soundness fuzz: random range predicates agree with the plain filter
    val rnd = new scala.util.Random(7)
    val maxKey = orders.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    (1 to 15).foreach { _ =>
      val a = math.abs(rnd.nextLong()) % maxKey
      val b = math.abs(rnd.nextLong()) % maxKey
      val (x, y) = (math.min(a, b), math.max(a, b))
      val cond = col("o_orderkey") >= x && col("o_orderkey") <= y
      assert(ds.read(filter = Some(cond)).count() == orders.filter(cond).count())
    }

    // the relation-backed (Catalyst) path agrees too
    val sqlCount = ds.readAll().filter(col("o_orderkey") === lit(lo)).count()
    assert(sqlCount == orders.filter(col("o_orderkey") === lit(lo)).count())
  }

  test("CoW delete and compaction keep every live manifest summarized") {
    val (ds, orders) = quartered("mlistc_")
    ds.delete(col("o_totalprice") > 300000.0)
    val afterDelete = ds.storage.metadata
    afterDelete.currentSnapshot.manifestFiles.indexManifestFiles.foreach { m =>
      assert(afterDelete.manifestSummaries.contains(m), s"no summary for $m after delete")
    }
    ds.compact(targetFileRows = 1000000L)
    val afterCompact = ds.storage.metadata
    afterCompact.currentSnapshot.manifestFiles.indexManifestFiles.foreach { m =>
      assert(afterCompact.manifestSummaries.contains(m), s"no summary for $m after compact")
    }
    // pruning still fires on the rewritten layout... on the PK, which
    // survives both the delete and the bin-packing
    val lo = orders.agg(min(col("o_orderkey"))).collect()(0).getLong(0)
    assert(ds.read(filter = Some(col("o_orderkey") === lit(lo))).count() ==
      orders.filter(col("o_orderkey") === lit(lo) && !(col("o_totalprice") > 300000.0)).count())
  }

  test("legacy tables without summaries fall back to reading every manifest") {
    val (ds, orders) = quartered("mlistl_")
    val st = ds.storage
    st.persistMetadata(st.metadata.copy(manifestSummaries = Map.empty)) // simulate pre-summary table
    val lo = orders.agg(min(col("o_orderkey"))).collect()(0).getLong(0)
    val p = ds.plan(Some(col("o_orderkey") === lit(lo)))
    assert(p.prunedManifests == 0, "no summaries -> no manifest-level pruning")
    assert(p.prunedFiles > 0, "file-level stats still prune")
    assert(ds.read(filter = Some(col("o_orderkey") === lit(lo))).count() ==
      orders.filter(col("o_orderkey") === lit(lo)).count())
  }

  test("rewrite_manifests bin-packs the list, preserves stats, stays CDC-silent") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_mlrw_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    val maxKey = orders.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val step = maxKey / 8 + 1
    // INTERLEAVED trickle: appends alternate low/high ranges, so before
    // the rewrite consecutive manifests do NOT sort by key
    val order = Seq(0, 4, 1, 5, 2, 6, 3, 7)
    order.foreach { i =>
      ds.append(orders.filter(
        col("o_orderkey") >= i * step && col("o_orderkey") < (i + 1) * step))
    }
    val beforeSnap = ds.storage.metadata.currentSnapshotId
    val beforeManifests = ds.storage.metadata.currentSnapshot
      .manifestFiles.indexManifestFiles
    assert(beforeManifests.size >= 8)
    val total = orders.count()

    val res = ds.rewriteManifests(targetFilesPerManifest = 3L).get
    val meta = ds.storage.metadata
    val after = meta.currentSnapshot.manifestFiles.indexManifestFiles
    assert(after.size == res.outputManifests && after.size < beforeManifests.size)
    assert(res.rewrittenManifests == beforeManifests.size)
    // every new manifest is summarized; counts conserve
    assert(after.forall(meta.manifestSummaries.contains))
    assert(after.map(meta.manifestSummaries(_).numFiles).sum == res.files)
    // range-sorted packing: a low-range probe prunes whole manifests
    val p = ds.plan(Some(col("o_orderkey") < lit(step)))
    assert(p.prunedManifests > 0, s"expected summary pruning, got $p")
    assert(ds.readAll().count() == total)
    // CDC-silent: the rewrite snapshot carries no changelog and diff
    // across it reports nothing
    assert(ds.storage.metadata.currentSnapshot.changeLogFile.isEmpty)
    assert(ds.diff(beforeSnap.toString,
      ds.storage.metadata.currentSnapshotId.toString).isEmpty)
    // time travel to the pre-rewrite snapshot still reads the old list
    assert(ds.read(version = Some(beforeSnap.toString)).count() == total)
    // idempotent: a second rewrite at the same target is a no-op
    assert(ds.rewriteManifests(targetFilesPerManifest = 3L).isEmpty)

    // INCREMENTAL: new trickle appends pack WITHOUT rereading the
    // already-full manifests — the packed bulk survives by identity
    val packedFull = ds.storage.metadata.currentSnapshot
      .manifestFiles.indexManifestFiles
      .filter(m => ds.storage.metadata.manifestSummaries(m).numFiles >= 3).toSet
    assert(packedFull.nonEmpty)
    order.take(4).foreach { i =>
      ds.append(orders.filter(
        col("o_orderkey") >= i * step && col("o_orderkey") < (i + 1) * step)
        .limit(5))
    }
    val res2 = ds.rewriteManifests(targetFilesPerManifest = 3L).get
    val after2 = ds.storage.metadata.currentSnapshot
      .manifestFiles.indexManifestFiles.toSet
    assert(packedFull.subsetOf(after2),
      "full manifests must survive an incremental pack untouched")
    assert(res2.rewrittenManifests <= 4 + 1,
      s"only the under-filled tail may pack (packed ${res2.rewrittenManifests})")
    assert(ds.readAll().count() == total + 20)
  }

  test("rewrite_manifests takes the distributed path past the driver row bound") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_mlrwd_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    (0 until 3).foreach(i => ds.append(
      orders.filter(col("o_orderkey") % 3 === i).repartitionByRange(4, col("o_orderkey"))))
    val nFiles = ds.storage.metadata.currentSnapshot.manifestFiles.indexManifestFiles
      .map(ds.storage.metadata.manifestSummaries(_).numFiles).sum
    // force the distributed writer by shrinking the driver cutover to 0
    val res = ds.storage.transaction(policy = ConflictPolicy.Rewrite) { pinned =>
      RewriteManifestsOp.rewriteManifests(spark, ds.storage, pinned,
        targetFilesPerManifest = math.max(1L, nFiles / 2),
        driverMaxRows = 0L) match {
        case Some((patch, r)) => (Some(patch), Some(r))
        case None => (None, None)
      }
    }
    assert(res.isDefined && res.get.files == nFiles)
    val meta = ds.storage.metadata
    val after = meta.currentSnapshot.manifestFiles.indexManifestFiles
    assert(after.size == res.get.outputManifests)
    assert(after.forall(meta.manifestSummaries.contains),
      "distributed-path manifests must carry footer-derived summaries")
    assert(ds.readAll().count() == orders.count())
  }

  test("rewrite_manifests packs record manifests too; stitching survives") {
    import org.apache.spark.sql.functions.encode
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val loc = Files.createTempDirectory("graft_mlrwr_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, docs.schema, Seq("doc_id"),
      recordFields = Seq("payload"))
    (0 until 4).foreach(i => ds.append(docs.filter(col("doc_id") % 4 === i)))
    val before = ds.storage.metadata.currentSnapshot
    assert(before.manifestFiles.recordManifestFiles.size == 4)

    val res = ds.rewriteManifests(targetFilesPerManifest = 100L).get
    val after = ds.storage.metadata.currentSnapshot
    assert(after.manifestFiles.indexManifestFiles.size == res.outputManifests)
    assert(after.manifestFiles.recordManifestFiles.size <
      before.manifestFiles.recordManifestFiles.size,
      "record manifests must bin-pack alongside the index manifests")
    // payload stitching and counts survive the metadata reorganization
    assert(ds.readAll().count() == docs.count())
    assert(ds.readAll().filter(col("payload").isNull).count() == 0)
  }

  test("record-manifest pack past the driver bound is SKIPPED and surfaced") {
    import org.apache.spark.sql.functions.encode
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val loc = Files.createTempDirectory("graft_mlrws_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, docs.schema, Seq("doc_id"),
      recordFields = Seq("payload"))
    (0 until 4).foreach(i => ds.append(docs.filter(col("doc_id") % 4 === i)))
    val before = ds.storage.metadata.currentSnapshot
    assert(before.manifestFiles.recordManifestFiles.size == 4)
    // driverMaxRows = 0 forces the INDEX plane distributed and the
    // RECORD plane past its (driver-only) bound: the pack must still
    // land, leave record manifests as-is, and REPORT the skip instead
    // of silently dropping it (VERDICT r12/r13 #5)
    val res = ds.storage.transaction(policy = ConflictPolicy.Rewrite) { pinned =>
      RewriteManifestsOp.rewriteManifests(spark, ds.storage, pinned,
        targetFilesPerManifest = 100L, driverMaxRows = 0L) match {
        case Some((patch, r)) => (Some(patch), Some(r))
        case None => (None, None)
      }
    }.get
    assert(res.recordManifestsSkipped == 4,
      s"skip must be surfaced, got ${res.recordManifestsSkipped}")
    val after = ds.storage.metadata.currentSnapshot
    assert(after.manifestFiles.recordManifestFiles.toSet ==
      before.manifestFiles.recordManifestFiles.toSet,
      "skipped record manifests must be untouched")
    assert(after.manifestFiles.indexManifestFiles.size == res.outputManifests)
    // the driver-path pack reports zero skips on the same table
    val res2 = ds.rewriteManifests(targetFilesPerManifest = 100L)
    assert(res2.forall(_.recordManifestsSkipped == 0))
    assert(ds.readAll().filter(col("payload").isNull).count() == 0)
  }

  test("trickle appends self-pack the manifest tail (no manual CALL)") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_mlap_").toString + "/tbl"
    spark.conf.set(SpaceDataset.AutoPackManifestsKey, "6")
    try {
      val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
      (0 until 20).foreach(i => ds.append(orders.filter(col("o_orderkey") % 20 === i)))
      val meta = ds.storage.metadata
      val n = meta.currentSnapshot.manifestFiles.indexManifestFiles.size
      assert(n <= 7, s"self-pack must bound the manifest tail, got $n")
      // the pack commits are CDC-silent: a view/CDC walk sees ONLY the
      // 20 data snapshots
      val dataSids = ds.storage.orderedSnapshotIds(0L, meta.currentSnapshotId)
        .filter(sid => ds.storage.snapshotOrFail(sid).changeLogFile.isDefined)
      assert(dataSids.size == 20, s"expected 20 data snapshots, got ${dataSids.size}")
      assert(ds.readAll().count() == orders.count())
    } finally spark.conf.unset(SpaceDataset.AutoPackManifestsKey)
  }

  test("repeated plans of an unchanged table serve manifest rows from the process cache") {
    val (ds, orders) = quartered("mlcache_")
    // warm: the first planned read loads each manifest once
    assert(ds.readAll().count() == orders.count())
    val opens0 = ManifestIO.manifestParquetOpens
    // repeated plans — fresh FileIndex per read, filtered and full —
    // must not reopen any manifest parquet (they are immutable)
    assert(ds.read(filter = Some(col("o_orderkey") < 100L)).count() ==
      orders.filter(col("o_orderkey") < 100L).count())
    assert(ds.readAll().count() == orders.count())
    assert(ds.plan(Some(col("o_orderkey") < 100L)).files.nonEmpty)
    assert(ManifestIO.manifestParquetOpens == opens0,
      s"unchanged table must replan with ZERO manifest loads " +
        s"(${ManifestIO.manifestParquetOpens - opens0} loads)")
    // an append mints ONE new manifest: the next plan loads exactly it
    ds.append(orders.limit(5))
    assert(ds.readAll().count() == orders.count() + 5)
    val delta = ManifestIO.manifestParquetOpens - opens0
    assert(delta >= 1 && delta <= 2,
      s"only the new manifest should load after an append, loaded $delta")
  }

  test("snapshot expiry drops summaries of stranded manifests") {
    val (ds, _) = quartered("mliste_")
    ds.delete(col("o_orderkey") % 2 === 0) // rewrites → old manifests stranded on old snapshots
    val before = ds.storage.metadata.manifestSummaries.size
    ds.expireSnapshots(olderThanMs = -1L, keepLast = 1)
    val meta = ds.storage.metadata
    val live = meta.snapshots.values.flatMap(_.manifestFiles.indexManifestFiles).toSet
    assert(meta.manifestSummaries.keySet.subsetOf(live))
    assert(meta.manifestSummaries.size < before, "expiry must shed dead summaries")
    assert(live.forall(meta.manifestSummaries.contains))
  }
}
