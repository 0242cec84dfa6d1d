package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.format.{ChangeLog, Patch, RowBitmap, StorageStatistics}

/** Zero-copy ingest of EXTERNAL parquet files (reference
  * `LocalParquetLoadOp` `/root/reference/python/src/space/core/loaders/
  * parquet.py:30-74`): no data is read or copied — the table's manifest
  * rows are built purely from the external files' footers (row counts +
  * PK min/max stats), and the manifest references the files by absolute
  * path. The files keep living where they are; pruning and scans work
  * exactly as for native files. */
object ParquetLoader {

  /** Append the given external parquet files to `ds` by footer harvest
    * only. Returns the new snapshot id. */
  def loadParquet(spark: SparkSession, ds: SpaceDataset, files: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    ds.storage.transaction() { _ =>
      val metas = files.map { f =>
        val abs = new Path(f)
        ManifestIO.harvestFooter(abs.toString, abs.toString, conf, ds.storage.primaryKeys)
      }.filter(_.numRows > 0)
      if (metas.isEmpty) (None, ds.storage.metadata.currentSnapshotId)
      else {
        val manifest = ManifestIO.writeIndexManifest(spark, ds.storage, metas)
        val patch = Patch(
          addedIndexManifests = List(manifest),
          statsDelta = StorageStatistics(
            numRows = metas.map(_.numRows).sum,
            indexCompressedBytes = metas.map(_.compressedBytes).sum,
            indexUncompressedBytes = metas.map(_.uncompressedBytes).sum),
          changeLog = Some(ChangeLog(addedRows = metas.map(m =>
            RowBitmap(m.file, allRows = true, numRows = m.numRows)).toList)))
        (Some(patch), ds.storage.metadata.maxSnapshotId + 1)
      }
    }
  }
}
