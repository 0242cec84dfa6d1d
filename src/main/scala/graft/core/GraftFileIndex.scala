package graft.core

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, NoopCache, PartitionDirectory, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Catalyst-integrated scan: a [[PartitioningAwareFileIndex]] whose
  * `listFiles` applies the falsifiable-filter manifest pruning
  * ([[Pruning]]) to the DATA FILTERS Catalyst resolved for the query —
  * so `spark.sql("… WHERE pk < 100")` over a registered graft table
  * prunes files exactly like an explicit `read(filter = …)`, with no
  * eager planning step (the "deeper-integration alternative" of
  * SURVEY.md §4.1; same division of labor as the reference's
  * `Storage.data_files`, storage.py:369-403, now driven BY the
  * optimizer instead of before it). Extending the partitioning-aware
  * base lets the SAME index back both the V1 `HadoopFsRelation` path
  * ([[GraftRelation.dataFrame]]) and the DSv2 `ParquetScanBuilder` path
  * (the `graft` TableCatalog).
  *
  * The index is pinned to one snapshot (graft snapshots are immutable):
  * manifest rows and file statuses load once at construction —
  * `listFiles` is pure driver-side evaluation, one filesystem `listStatus`
  * per data directory up front, no Spark job at plan time (the local
  * manifest filter collapses via `ConvertToLocalRelation`).
  */
final class GraftFileIndex(
    spark: SparkSession,
    storage: Storage,
    snapshotId: Long)
  extends PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {

  private val conf = spark.sparkContext.hadoopConfiguration

  private val (manifestRows: Seq[Row], manifestSchema: StructType) = {
    val ms = storage.snapshotOrFail(snapshotId).manifestFiles.indexManifestFiles
    if (ms.isEmpty)
      (Nil, ManifestIO.manifestSchema(storage.schema, storage.statsColumns))
    else {
      val df = ManifestIO.readIndexManifests(spark, storage, ms)
      (df.collect().toSeq, df.schema)
    }
  }
  private val fileIdx = manifestSchema.fieldIndex(ManifestIO.FileCol)

  /** manifest-relative path → status; one listStatus per distinct data
    * directory (native files share `<root>/data/`), per-file lookup only
    * for stragglers (external zero-copy files outside listed dirs). */
  private val statusByRel: Map[String, FileStatus] = {
    val rels = manifestRows.map(_.getString(fileIdx))
    rels.groupBy(r => new Path(storage.absolute(r)).getParent).flatMap {
      case (dir, dirRels) =>
        val fs = dir.getFileSystem(conf)
        val listed: Map[String, FileStatus] =
          try fs.listStatus(dir).map(s => s.getPath.toString -> s).toMap
          catch { case _: java.io.IOException => Map.empty }
        dirRels.map { r =>
          val p = new Path(storage.absolute(r))
          val abs = fs.makeQualified(p).toString
          r -> listed.getOrElse(abs, fs.getFileStatus(p))
        }
    }
  }

  override def rootPaths: Seq[Path] = Seq(new Path(storage.location))

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override protected def leafFiles: mutable.LinkedHashMap[Path, FileStatus] =
    mutable.LinkedHashMap(statusByRel.values.toSeq.map(s => s.getPath -> s): _*)

  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statusByRel.values.toSeq.groupBy(_.getPath.getParent)
      .map { case (dir, ss) => dir -> ss.toArray }

  override def sizeInBytes: Long = statusByRel.values.map(_.getLen).sum

  override def inputFiles: Array[String] =
    manifestRows.map(r => storage.absolute(r.getString(fileIdx))).toArray

  override def refresh(): Unit = () // snapshot-pinned: nothing to refresh

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept: Seq[String] =
      Pruning.keepConditionForFilters(storage.schema, storage.statsColumns, dataFilters) match {
        case None => manifestRows.map(_.getString(fileIdx))
        case Some(keep) =>
          spark.createDataFrame(manifestRows.asJava, manifestSchema)
            .filter(keep)
            .select(ManifestIO.FileCol)
            .collect().map(_.getString(0)).toSeq
      }
    // bucket pruning: a filter pinning the bucket column reaches only
    // the buckets its literals hash to — stats-free O(1/n) point lookups
    val bucketKept = BucketPruning.pruneFiles(storage, dataFilters, kept)
    Seq(PartitionDirectory(InternalRow.empty, bucketKept.map(statusByRel).toArray))
  }
}

/** Builds the relation-backed DataFrame over a [[GraftFileIndex]]:
  * Spark's own vectorized parquet reader + pushdown + split planning,
  * with file listing (and therefore manifest pruning) delegated to the
  * index above. */
object GraftRelation {

  def dataFrame(spark: SparkSession, storage: Storage, snapshotId: Long): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val physical = ReadOp.physicalSchema(storage.schema, storage.recordFields)
    val relation = HadoopFsRelation(
      new GraftFileIndex(spark, storage, snapshotId),
      new StructType(),
      physical,
      None,
      new ParquetFileFormat,
      Map.empty[String, String])(classic)
    classic.baseRelationToDataFrame(relation)
  }
}
