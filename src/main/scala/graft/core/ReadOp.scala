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

  final case class ScanPlan(
      files: Seq[String],
      totalFiles: Int,
      totalManifests: Int = 0,
      prunedManifests: Int = 0) {
    def prunedFiles: Int = totalFiles - files.size
  }

  /** Snapshot → pruned list of table-root-relative index files.
    *
    * Two-level (manifest-list design): the per-manifest summaries in
    * snapshot metadata are consulted FIRST — a manifest whose combined
    * min/max range is falsified by the predicate is never opened — then
    * file-level stats prune within the surviving manifests. Driver work
    * for a selective query is O(manifests + surviving files), not
    * O(all files). Tables whose manifests predate summaries fall back to
    * reading everything (conservative). */
  def plan(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      predicate: Option[Column]): ScanPlan = {
    import scala.jdk.CollectionConverters._
    val manifests = storage.snapshotOrFail(snapshotId).manifestFiles.indexManifestFiles
    if (manifests.isEmpty) return ScanPlan(Nil, 0)
    val keep = predicate.flatMap(p =>
      Pruning.keepCondition(spark, storage.schema, storage.statsColumns, p))
    // PREDICATE-LESS small scan: the file list comes off a driver-side
    // manifest read — no Spark job for a plan that cannot prune anyway
    // (stats/bloom layers need a predicate; bucket pruning needs
    // filters). The O(1) summary gate bounds the driver work.
    if (keep.isEmpty && predicate.isEmpty)
      ManifestIO.summarizedFileCount(storage, manifests) match {
        case Some(n) if n <= DmlOps.DriverScanMaxFiles =>
          val fIdx = ManifestIO.manifestSchema(storage).fieldIndex(ManifestIO.FileCol)
          val files = ManifestIO.readIndexManifestRowsDriver(storage,
            spark.sparkContext.hadoopConfiguration, manifests).map(_._2.getString(fIdx))
          return ScanPlan(files, files.size, manifests.size, 0)
        case _ =>
      }
    val summaries = storage.metadata.manifestSummaries
    val allSummarized = manifests.forall(summaries.contains)

    val surviving: Seq[String] =
      ManifestIO.pruneManifestsBySummary(spark, storage, manifests, keep)
    val total: Int =
      if (allSummarized) manifests.map(summaries(_).numFiles).sum.toInt else -1
    val prunedM = manifests.size - surviving.size

    if (surviving.isEmpty)
      return ScanPlan(Nil, math.max(total, 0), manifests.size, prunedM)
    // summarized tables within the driver-plan bound serve manifest
    // rows from the process-wide cache as a LOCAL relation: the filter/
    // collect below folds driver-side (ConvertToLocalRelation), so a
    // REPEATED plan of an unchanged table costs zero Spark jobs and
    // zero manifest IO. Oversized tables keep the distributed read —
    // only the pruned file NAMES ever reach the driver there.
    val survivingFiles: Option[Long] =
      if (allSummarized) Some(surviving.map(summaries(_).numFiles).sum) else None
    val driverBound = Confs.longConf(spark,
      ManifestIO.DriverPlanMaxFilesKey, ManifestIO.DefaultDriverPlanMaxFiles)
    val mdf =
      if (survivingFiles.exists(_ <= driverBound)) {
        val rows = ManifestIO.readIndexManifestRowsCached(spark, storage, surviving)
        spark.createDataFrame(
          surviving.flatMap(m => rows.getOrElse(m, Array.empty[Row]).toSeq).asJava,
          ManifestIO.manifestSchema(storage))
      } else ManifestIO.readIndexManifests(spark, storage, surviving)
    val kept = keep.fold(mdf)(mdf.filter)
    // one collect carries both the surviving file list and the
    // membership-evidence markers (file, column) → usable?, so the
    // bloom layer can skip footer RPCs for evidence-less files
    val evidNames: Seq[(String, String)] = ManifestIO.evidenceColumns(storage).flatMap(c =>
      ManifestIO.fieldAtPath(storage.schema, c).map(f =>
        c -> ManifestIO.evidColName(graft.format.FieldIds.fieldId(f))))
    val collected = kept.select(
      (col(ManifestIO.FileCol) +: evidNames.map { case (_, n) => col(n) }): _*).collect()
    val files0 = collected.map(_.getString(0)).toSeq
    val files = predicate match {
      case Some(p) =>
        val evidence: Map[(String, String), Boolean] = collected.iterator.flatMap { r =>
          evidNames.iterator.zipWithIndex.collect {
            case ((c, _), i) if !r.isNullAt(i + 1) => (r.getString(0), c) -> r.getBoolean(i + 1)
          }
        }.toMap
        val exprs = Seq(org.apache.spark.sql.graftshim.ColumnExpr.catalystExpression(p))
        BloomPruning.pruneFiles(spark, storage, exprs,
          BucketPruning.pruneFiles(storage, snapshotId, exprs, files0), evidence)
      case None => files0
    }
    // legacy (unsummarized) tables read every manifest, so mdf IS the total
    val totalFinal = if (total >= 0) total else mdf.count().toInt
    ScanPlan(files, totalFinal, manifests.size, prunedM)
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
    val df0 = GraftRelation.dataFrame(spark, storage, snapshotId)
    // merge-on-read: mask soft-deleted rows (no-op Column when the
    // snapshot has no delete vectors — the common steady state). The
    // mask is a plain conjunct, so the user's own filters still push
    // down past it into the parquet scan and the file index; the
    // broadcast vector map is REUSED across reads of the same snapshot
    // (DV files are immutable).
    val df = DeleteVectorOps.maskFilterForSnapshot(spark, storage, snapshotId)
      .fold(df0)(df0.filter)
    // ±0.0 pushdown soundness even on sessions without GraftExtensions:
    // rewrite zero-equality forms before Catalyst pushes them to parquet
    // (see FloatingZeroRewrite — vanilla pushdown drops row groups whose
    // zeros carry the other sign bit)
    predicate.map { p =>
      val e = org.apache.spark.sql.graftshim.ColumnExpr.catalystExpression(p)
      if (org.apache.spark.sql.graftshim.FloatingZeroRewrite.mentionsFpZero(e))
        org.apache.spark.sql.graftshim.ColumnExpr.column(
          org.apache.spark.sql.graftshim.FloatingZeroRewrite.rewriteUnresolved(e))
      else p
    }.fold(df)(df.filter)
  }

  def emptyDF(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
}
