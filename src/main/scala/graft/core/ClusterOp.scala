package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.format._

/** CLUSTER BY maintenance op: rewrite the table's index files
  * range-partitioned and sorted by the given columns, so per-file
  * min/max stats become tight, disjoint ranges and falsifiable-filter
  * pruning ([[Pruning]]) on those columns skips almost everything.
  *
  * Declared stats columns ([[Storage.statsColumns]]) only pay off when
  * files are clustered on them — after ingestion order scatters a
  * column's values across every file, each file spans the full value
  * range and nothing is falsifiable. At 100 TB this op is the
  * difference between "stats exist" and "stats prune": one scheduled
  * rewrite turns every subsequent filtered scan into a partition's
  * worth of IO. The reference has no analog (no compaction either);
  * same family as Delta/Iceberg clustering maintenance.
  *
  * Unlike [[CompactOp]] (shuffle-free by design) this op inherently
  * SHUFFLES the rewritten bytes once — that is the price of global
  * ordering, paid once per rewrite, amortized over every pruned scan.
  *
  *  - Record-field addresses ride through untouched (payload files are
  *    never read or moved), as in compaction and CoW delete.
  *  - NO change log: physically-reorganizing, logically-idempotent —
  *    `diff()` across a clustering snapshot reports nothing and MV
  *    refresh skips it.
  *  - Replaced files stay on disk for time travel until
  *    [[GcOps.garbageCollect]].
  */
object ClusterOp {

  final case class ClusterResult(rewrittenFiles: Int, outputFiles: Int, rows: Long)

  /** Build the clustering patch, or None for an empty table. */
  def cluster(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      sortCols: Seq[String],
      targetFileRows: Long): Option[(Patch, ClusterResult)] = {
    require(sortCols.nonEmpty, "clusterBy requires at least one column")
    require(targetFileRows > 0)
    sortCols.foreach { c =>
      require(storage.schema.fieldNames.contains(c), s"unknown cluster column $c")
      require(!storage.recordFields.contains(c), s"record field $c cannot cluster")
    }
    val snap = storage.snapshotOrFail(snapshotId)
    if (snap.manifestFiles.indexManifestFiles.isEmpty) return None

    val mdf = ManifestIO.readIndexManifests(
      spark, storage, snap.manifestFiles.indexManifestFiles)
    val files = mdf
      .select(col(ManifestIO.FileCol), col(ManifestIO.NumRowsCol))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (files.isEmpty) return None

    val physical = ReadOp.physicalSchema(storage.schema, storage.recordFields)
    val totalRows = files.map(_._2).sum
    val parts = math.max(1, math.ceil(totalRows.toDouble / targetFileRows).toInt)
    val rows = spark.read.schema(physical)
      .parquet(files.map(f => storage.absolute(f._1)): _*)
      .repartitionByRange(parts, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val written = AppendOp.writeFilesWithMeta(spark, storage, rows)
    val appendPatch = written.patch

    val co = DmlOps.manifestCarryover(spark, storage, snapshotId, files.map(_._1).toSet)
    val outRows = appendPatch.statsDelta.numRows
    require(outRows == -co.removedStats.numRows,
      s"clustering row-count drift: wrote $outRows, removed ${-co.removedStats.numRows}")
    val patch = Patch(
      addedIndexManifests = appendPatch.addedIndexManifests ++ co.carryoverManifests,
      removedIndexManifests = co.removedManifests,
      statsDelta = appendPatch.statsDelta + co.removedStats,
      changeLog = None)
    Some((patch, ClusterResult(files.size, written.files.size, outRows)))
  }
}
