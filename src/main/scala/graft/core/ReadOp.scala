package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Scan planning + execution (reference `Storage.data_files`
  * storage.py:369-403 and `FileSetReadOp` ops/read.py:47-152).
  *
  * Planning is driver-side: read the snapshot's index manifests, apply
  * the falsifiable-filter pruning predicate, get the surviving file list.
  * Execution is one declarative `spark.read.parquet(files).filter(...)`
  * — Catalyst then pushes filters/projections into the parquet scan and
  * Spark's own split planning replaces the reference's per-file/row-range
  * read tasks (SURVEY.md §2.1).
  */
object ReadOp {

  /** Address struct stored in index files for each record field
    * (constants at reference schema/constants.py:17-18, struct type
    * arrow.py:212-215). */
  val AddressType: StructType = StructType(Seq(
    StructField("_FILE", StringType), StructField("_ROW_ID", IntegerType)))

  /** Physical schema = logical schema with record fields replaced by
    * address structs (arrow.py:227-241). Field-id metadata is STRIPPED —
    * this is a read schema (see [[graft.format.FieldIds.strip]]); the
    * write path re-attaches ids. */
  def physicalSchema(schema: StructType, recordFields: Seq[String]): StructType =
    graft.format.FieldIds.strip(StructType(schema.fields.map { f =>
      if (recordFields.contains(f.name)) StructField(f.name, AddressType, f.nullable, f.metadata)
      else f
    }))

  /** Physical schema KEEPING field-id metadata — for the write path,
    * where Spark embeds `parquet.field.id` into the files it writes. */
  def physicalSchemaWithIds(schema: StructType, recordFields: Seq[String]): StructType =
    StructType(schema.fields.map { f =>
      if (recordFields.contains(f.name)) StructField(f.name, AddressType, f.nullable, f.metadata)
      else f
    })

  final case class ScanPlan(files: Seq[String], totalFiles: Int) {
    def prunedFiles: Int = totalFiles - files.size
  }

  /** Snapshot → pruned list of table-root-relative index files. */
  def plan(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      predicate: Option[Column]): ScanPlan = {
    val manifests = storage.snapshotOrFail(snapshotId).manifestFiles.indexManifestFiles
    if (manifests.isEmpty) return ScanPlan(Nil, 0)
    val mdf = ManifestIO.readIndexManifests(spark, storage, manifests)
    val keep = predicate.flatMap(p =>
      Pruning.keepCondition(spark, storage.schema, storage.statsColumns, p))
    val kept = keep.fold(mdf)(mdf.filter)
    val files0 = kept.select(col(ManifestIO.FileCol)).collect().map(_.getString(0)).toSeq
    val files = predicate match {
      case Some(p) => BucketPruning.pruneFiles(storage,
        Seq(org.apache.spark.sql.graftshim.ColumnExpr.catalystExpression(p)), files0)
      case None => files0
    }
    val total = mdf.count().toInt
    ScanPlan(files, total)
  }

  /** Read a snapshot as a DataFrame of the PHYSICAL schema (record fields
    * as address structs; stitching is RecordIO's job).
    *
    * Built over [[GraftRelation]]/[[GraftFileIndex]], so manifest pruning
    * runs INSIDE Catalyst planning from the query's own data filters —
    * the predicate here, a later `.filter`, or a SQL WHERE over a
    * registered view all prune identically and lazily. */
  def scanPhysical(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      predicate: Option[Column] = None): DataFrame = {
    val df = GraftRelation.dataFrame(spark, storage, snapshotId)
    predicate.fold(df)(df.filter)
  }

  def emptyDF(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
}
