package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** The Catalyst-integrated scan: GraftFileIndex must prune manifest
  * files from the query's OWN data filters — SQL WHERE clauses included
  * — and report true file sizes to the planner. */
class FileIndexSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ds: SpaceDataset = {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_fidx_").toString + "/tbl"
    val d = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    // 8 files with disjoint key ranges → pruning has something to skip
    d.append(orders.repartitionByRange(8, col("o_orderkey")))
    d
  }

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute first: AQE finalizes the plan lazily
    // recurse through AQE wrappers: QueryStageExec subtrees are not
    // children of the adaptive plan node
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case f: FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(s.plan)
        case other => other.children.flatMap(scans)
      }
    scans(df.queryExecution.executedPlan).head.metrics("numFiles").value
  }

  test("SQL WHERE over a registered view prunes files via the index") {
    ds.createOrReplaceTempView("fidx_orders")
    val total = ds.plan().files.size
    assert(total == 8, s"expected 8 files, got $total")

    val lo = spark.sql("SELECT count(*) AS n FROM fidx_orders WHERE o_orderkey < 100")
    assert(filesRead(lo) < total)
    // correctness: same count as an unpruned filter
    val expect = Tables.read(spark, sfDir, "orders").filter(col("o_orderkey") < 100).count()
    assert(lo.collect()(0).getLong(0) == expect)
  }

  test("deferred DataFrame filters prune like explicit read(filter)") {
    val lazyFiltered = ds.readAll().filter(col("o_orderkey") between (200L, 300L))
    val n = filesRead(lazyFiltered)
    assert(n < 8, s"read $n files")
    val eager = ds.read(filter = Some(col("o_orderkey") between (200L, 300L)))
    assert(lazyFiltered.count() == eager.count())
  }

  test("non-PK filters scan everything (stats are PK-only)") {
    val df = ds.readAll().filter(col("o_totalprice") > 0.0)
    assert(filesRead(df) == 8)
  }

  test("time-travel view prunes against the pinned snapshot") {
    val v0Files = ds.plan(version = Some("1")).files.size
    val df = ds.read(version = Some("1")).filter(col("o_orderkey") < 100)
    assert(filesRead(df) < v0Files)
  }

  test("the index reports a sound size estimate without touching file statuses") {
    val idx = new GraftFileIndex(spark, ds.storage, ds.storage.metadata.currentSnapshotId)
    // sizeInBytes now comes from snapshot statistics (compressed
    // column-chunk bytes) so relation construction stays metadata-only;
    // it undershoots raw file lengths (headers/footers, and the PK bloom
    // filter — a fixed few KiB per file that dwarfs the DATA of these
    // KiB-sized test files but is <0.1% of a production 128 MB file) —
    // it must stay the same order; it only feeds planner estimates
    val fromFs = idx.inputFiles.map(p =>
      new java.io.File(new java.net.URI(
        if (p.startsWith("file:")) p else "file://" + p).getPath).length).sum
    assert(idx.sizeInBytes > 0 && idx.sizeInBytes <= fromFs)
    assert(idx.sizeInBytes > fromFs / 4, s"estimate ${idx.sizeInBytes} vs fs $fromFs")
    assert(idx.inputFiles.length == 8)
  }

  test("native scans synthesize statuses from manifests: zero dir listings") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_fbytes_").toString + "/tbl"
    val d = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    d.append(orders.repartitionByRange(4, col("o_orderkey")))
    d.delete(col("o_orderkey") % 9 === 5) // CoW rewrite carries rows over
    val before = GraftFileIndex.dirListings.get()
    // full scan, filtered scan, SQL scan — every FileStatus must come
    // off the manifest's _FILE_BYTES, never a data-directory listing
    assert(d.readAll().count() > 0)
    assert(d.read(filter = Some(col("o_orderkey") < 100L)).count() > 0)
    d.createOrReplaceTempView("fbytes_orders")
    assert(spark.sql("SELECT count(*) FROM fbytes_orders WHERE o_orderkey < 500")
      .collect()(0).getLong(0) > 0)
    assert(GraftFileIndex.dirListings.get() == before,
      "scan planning must not list data directories when _FILE_BYTES is recorded")
    // and the synthesized lengths are EXACT: the carryover manifest
    // preserved the column bit-for-bit (a wrong length breaks the
    // parquet footer seek, so the reads above already prove it; pin
    // the equality explicitly for one file anyway)
    val snap = d.storage.snapshotOrFail(d.storage.metadata.currentSnapshotId)
    val rows = ManifestIO.readIndexManifestRowsDriver(d.storage,
      spark.sparkContext.hadoopConfiguration,
      snap.manifestFiles.indexManifestFiles)
    val schema = ManifestIO.manifestSchema(d.storage)
    val fIdx = schema.fieldIndex(ManifestIO.FileCol)
    val bIdx = schema.fieldIndex(ManifestIO.FileBytesCol)
    rows.map(_._2).foreach { r =>
      assert(!r.isNullAt(bIdx), "every natively-written file records _FILE_BYTES")
      val p = new org.apache.hadoop.fs.Path(d.storage.absolute(r.getString(fIdx)))
      val real = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
      assert(r.getLong(bIdx) == real, s"${r.getString(fIdx)}: manifest says " +
        s"${r.getLong(bIdx)} bytes, filesystem says $real")
    }
  }

  test("synthesized statuses carry the real mtime (metadata column stays truthful)") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_fmtime_").toString + "/tbl"
    val d = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    d.append(orders.limit(500))
    val before = GraftFileIndex.dirListings.get()
    // the statuses every scan (and `_metadata.file_modification_time`)
    // consumes must carry the file's real mtime, not epoch-1970
    // (ADVICE r15) — and still without any directory listing
    val idx = new GraftFileIndex(spark, d.storage, d.storage.metadata.currentSnapshotId)
    val mts = idx.listFiles(Nil, Nil).flatMap(_.files).map(_.getModificationTime)
    assert(mts.nonEmpty && mts.forall(_ > 1000000000000L), // > 2001-09-09
      s"synthesized mtime must be the harvest-time stat, got ${mts.toSeq.take(5)}")
    assert(GraftFileIndex.dirListings.get() == before)
  }

  test("rewrite_manifests backfills legacy rows: listStatus fallback ends at the pack") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_fback_").toString + "/tbl"
    val d = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    // several under-filled manifests so the pack has work to do
    (0 until 3).foreach(i =>
      d.append(orders.filter(col("o_orderkey") % 3 === i.toLong)))
    val conf = spark.sparkContext.hadoopConfiguration
    val schema = ManifestIO.manifestSchema(d.storage)
    val bIdx = schema.fieldIndex(ManifestIO.FileBytesCol)
    val mIdx = schema.fieldIndex(ManifestIO.FileMtimeCol)

    // forge the LEGACY shape: rewrite every manifest with bytes/mtime
    // nulled, swapped in via one manifest-only commit
    val snap0 = d.storage.snapshotOrFail(d.storage.metadata.currentSnapshotId)
    val olds = snap0.manifestFiles.indexManifestFiles
    val replaced = olds.map { m =>
      val rows = ManifestIO.readIndexManifestRowsDriver(d.storage, conf, Seq(m))
        .map(_._2).map { r =>
          val vals = r.toSeq.toArray
          vals(bIdx) = null
          vals(mIdx) = null
          org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
        }
      val rel = graft.format.StoragePaths.newIndexManifestFile()
      DriverParquet.write(conf, d.storage.absolute(rel), schema, rows)
      rel -> ManifestIO.summarizeRows(d.storage, schema, rows)
    }
    d.storage.transaction() { _ =>
      (Some(graft.format.Patch(
        addedIndexManifests = replaced.map(_._1),
        removedIndexManifests = olds,
        manifestSummaries = replaced.toMap)), ())
    }
    // legacy shape confirmed: a scan falls back to directory listing
    val preList = GraftFileIndex.dirListings.get()
    assert(d.readAll().count() > 0)
    assert(GraftFileIndex.dirListings.get() > preList,
      "nulled _FILE_BYTES must hit the listStatus fallback")

    // the pack backfills: one getFileStatus per legacy row, then scans
    // synthesize statuses forever
    assert(d.rewriteManifests(targetFilesPerManifest = 100000L).isDefined)
    val snap1 = d.storage.snapshotOrFail(d.storage.metadata.currentSnapshotId)
    val packed = ManifestIO.readIndexManifestRowsDriver(d.storage, conf,
      snap1.manifestFiles.indexManifestFiles).map(_._2)
    packed.foreach { r =>
      assert(!r.isNullAt(bIdx) && !r.isNullAt(mIdx),
        "the pack must backfill _FILE_BYTES and _FILE_MTIME")
      val p = new org.apache.hadoop.fs.Path(
        d.storage.absolute(r.getString(schema.fieldIndex(ManifestIO.FileCol))))
      val st = p.getFileSystem(conf).getFileStatus(p)
      assert(r.getLong(bIdx) == st.getLen && r.getLong(mIdx) == st.getModificationTime)
    }
    val postList = GraftFileIndex.dirListings.get()
    assert(d.readAll().count() > 0)
    assert(d.read(filter = Some(col("o_orderkey") < 100L)).count() > 0)
    assert(GraftFileIndex.dirListings.get() == postList,
      "after the backfilling pack, scans must never list data directories")
  }
}
