package graft.core

import org.apache.spark.sql.SparkSession

import graft.format._

/** Bucket-layout evolution (`rebucket`): rewrite EVERY data file of a
  * bucketed table through the standard bucketed write path under NEW
  * per-column bucket counts, and switch the table's layout metadata in
  * the SAME commit (beyond the reference, which has no bucketing at
  * all; Iceberg evolves bucket specs similarly via partition-spec
  * evolution + rewrite).
  *
  * Why it exists: `bucketCounts` are fixed at create, but a table that
  * grows 100× outgrows its layout — 4×4 buckets over 100 TB means
  * ~780 GB per bucket-pair task in a storage-partitioned join. Without
  * a procedure the only way out is a manual export/recreate that loses
  * history. `rebucket` is one CDC-silent commit:
  *
  *  - The rewrite streams through ONE distributed shuffle to the new
  *    tuple layout (exactly an append's price at the same volume);
  *    record-field addresses ride through opaque, payload bytes never
  *    move; merge-on-read vectors FOLD (the rewrite keeps live rows).
  *  - [[graft.format.StorageMetadata.bucketLayoutSince]] bumps to the
  *    new snapshot id: time travel BELOW it reads files hashed under
  *    the old counts, so bucket pruning and SPJ reporting disengage
  *    there (stats/bloom pruning still apply) instead of claiming a
  *    layout those files don't have.
  *  - Concurrency: Strict-shaped — any head movement between pin and
  *    commit aborts ([[ConcurrentCommitException]]); a layout change
  *    cannot merge with concurrent writes hashed under the old counts.
  *    The caller retries; staged files of a failed attempt are GC'd.
  */
object RebucketOp {

  final case class RebucketResult(
      rewrittenFiles: Int,
      outputFiles: Int,
      rows: Long,
      newCounts: Seq[Int])

  /** `newColumns` re-keys the layout (or ADOPTS bucketing on an
    * unbucketed table — the table that grew into needing
    * storage-partitioned joins); omitted = keep the current bucket
    * columns, which then must exist. Any target layout is valid because
    * the op rewrites every file. */
  def rebucket(
      spark: SparkSession,
      storage: Storage,
      newCounts: Seq[Int],
      branch: String = SnapshotRef.MainBranch,
      newColumns: Option[Seq[String]] = None): RebucketResult = {
    val cols = newColumns.getOrElse(storage.metadata.bucketColumns.toSeq)
    require(cols.nonEmpty,
      "rebucket: the table is not bucketed — pass the bucket columns to " +
        "ADOPT a layout (rebucket(counts, columns = ...))")
    cols.foreach { c =>
      require(storage.schema.fieldNames.contains(c),
        s"rebucket: bucket column $c not in schema (physical top-level names)")
      require(!storage.recordFields.contains(c),
        s"rebucket: record field $c cannot be a bucket column")
    }
    require(storage.metadata.writeClusterBy.isEmpty,
      "rebucket: write_cluster_by and bucketing are exclusive — a bucketed " +
        "write's partitioning IS the bucket layout")
    require(newCounts.length == cols.length,
      s"rebucket: ${newCounts.length} counts for ${cols.length} bucket columns " +
        s"(${cols.mkString(", ")})")
    require(newCounts.forall(_ >= 1), s"rebucket: counts must be >= 1: $newCounts")
    val product = newCounts.map(_.toLong).product
    require(product <= 100000, s"rebucket: counts product $product exceeds 100000")
    require(newCounts != storage.metadata.bucketCounts ||
        cols != storage.metadata.bucketColumns,
      s"rebucket: the table already has this bucket layout " +
        s"(${cols.mkString(",")} @ ${newCounts.mkString(",")})")
    // Layout metadata (columns/counts) is TABLE-WIDE, so the rewrite
    // that redefines it runs on main only. Side branches may exist:
    // layout claims follow the per-snapshot LAYOUT EPOCH
    // ([[graft.format.Snapshot.bucketLayoutId]]) — only descendants of
    // this rebucket commit inherit the new epoch, so a branch forked
    // before it (and anything it commits later, even under ids above
    // the watermark) correctly disengages bucket pruning/SPJ instead
    // of being misread as new-layout.
    require(branch == SnapshotRef.MainBranch,
      s"rebucket: layout evolution runs on '${SnapshotRef.MainBranch}' only " +
        s"(got branch '$branch') — bucket layout metadata is table-wide")
    storage.reload()

    val pinned = storage.branchHead(branch)
    val snap = storage.snapshotOrFail(pinned)
    val manifests = snap.manifestFiles.indexManifestFiles

    // full physical rewrite at the pinned snapshot: opaque record
    // addresses, delete vectors folded (the masked scan keeps live rows
    // only; the fold compensates the stats the carryover double-counts)
    val files = ReadOp.plan(spark, storage, pinned, None).files.toSet
    val (written, co, dvRemoved, foldComp) =
      if (files.isEmpty)
        (AppendOp.AppendResult(Patch(), Nil),
          DmlOps.CarryoverResult(Nil, Nil, StorageStatistics(), Map.empty),
          Nil, StorageStatistics())
      else {
        val physical = ReadOp.physicalSchema(storage.schema, storage.recordFields)
        val rawScan = spark.read.schema(physical)
          .parquet(files.toSeq.map(storage.absolute): _*)
        val (scan, removed, comp) = DeleteVectorOps.foldIntoScan(
          spark, storage, pinned, files, rawScan)
        val w = AppendOp.writeFilesWithMeta(spark, storage, scan,
          bucketLayoutOverride = Some((cols, newCounts)))
        (w, DmlOps.manifestCarryover(spark, storage, pinned, files), removed, comp)
      }
    require(co.carryoverManifests.isEmpty,
      "rebucket rewrote every file; no carryover rows can remain")
    val outRows = written.patch.statsDelta.numRows
    require(outRows == -co.removedStats.numRows - foldComp.numRows,
      s"rebucket row-count drift: wrote $outRows live rows, removed " +
        s"${-co.removedStats.numRows} physical minus ${foldComp.numRows} folded dead")

    val patch = Patch(
      addedIndexManifests = written.patch.addedIndexManifests,
      removedIndexManifests = co.removedManifests,
      statsDelta = written.patch.statsDelta + co.removedStats + foldComp,
      changeLog = None, // physically-reorganizing, logically idempotent
      manifestSummaries = written.patch.manifestSummaries,
      dvRemoved = dvRemoved)
    require(patch.removedIndexManifests.toSet == manifests.toSet,
      "rebucket must replace the snapshot's whole manifest list")

    // Strict under the lock: the rewrite hashed against the pinned
    // snapshot; ANY concurrent commit (even an append — its files carry
    // old-layout bucket ids) invalidates the layout switch
    var newId = pinned
    storage.withCommitLock {
      storage.reload()
      val head = storage.branchHead(branch)
      if (head != pinned)
        throw new ConcurrentCommitException(
          s"rebucket aborted: branch $branch moved from snapshot $pinned to " +
            s"$head during the rewrite; re-run rebucket")
      newId = storage.commit(patch, branch, m => m.copy(
        bucketColumns = cols.toList,
        bucketCounts = newCounts.toList,
        numBuckets = product.toInt,
        bucketLayoutSince = m.maxSnapshotId,
        // the new layout EPOCH: the snapshot itself is stamped with
        // this id (newLayoutEpoch below), and only its descendants
        // inherit it — branch-lineage-safe where the raw watermark
        // alone is not
        currentBucketLayoutId = m.maxSnapshotId,
        // retire the outgoing layout into history (if bucketed): pure
        // old-epoch snapshots keep EXACT pruning/SPJ under their own
        // layout; column types pinned so a later widen of a re-keyed-
        // away column disengages instead of probing wrong hashes
        bucketLayoutHistory =
          if (m.numBuckets == 0) m.bucketLayoutHistory
          else m.bucketLayoutHistory + (m.currentBucketLayoutId.toString ->
            BucketLayoutSpec(m.bucketColumns, m.bucketCounts, m.numBuckets,
              m.bucketColumns.map(c =>
                storage.schema(c).dataType.catalogString)))),
        newLayoutEpoch = true)
    }
    RebucketResult(files.size, written.files.size, outRows, newCounts)
  }
}
