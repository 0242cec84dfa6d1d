package graft.core

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.{BinaryStatistics, DoubleStatistics, FloatStatistics, IntStatistics, LongStatistics, Statistics}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.format.{FieldIds, StoragePaths}

/** Column-level min/max of one data file, keyed by field name. */
final case class ColumnStats(min: Any, max: Any)

/** Manifest row for one index data file (reference
  * `/root/reference/python/src/space/core/manifests/index.py:42-65`). */
final case class IndexFileMeta(
    file: String, // table-root-relative
    numRows: Long,
    compressedBytes: Long,
    uncompressedBytes: Long,
    pkStats: Map[String, ColumnStats])

/** Index/record manifest reading & writing. Manifests are Parquet tables,
  * one row per data file, with a `_STATS_f<fieldId> struct<_MIN,_MAX>`
  * column per primary-key field (index.py:42-65; stats naming
  * schema/utils.py:44-52). Stats are merged from Parquet row-group
  * footers at write time (index.py:145-179) — the write itself stays a
  * plain distributed `df.write.parquet`, so executors never funnel data
  * through the driver; only footers are read driver-side.
  */
object ManifestIO {

  val FileCol = "_FILE"
  val NumRowsCol = "_NUM_ROWS"
  val CompressedCol = "_INDEX_COMPRESSED_BYTES"
  val UncompressedCol = "_INDEX_UNCOMPRESSED_BYTES"

  def statsColName(fieldId: Int): String = s"_STATS_f$fieldId"

  /** PK fields eligible for manifest stats (types we can pull out of
    * Parquet footer statistics and compare for pruning). */
  def statsEligible(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | FloatType | DoubleType => true
    case _ => false
  }

  def manifestSchema(tableSchema: StructType, primaryKeys: Seq[String]): StructType = {
    val base = Seq(
      StructField(FileCol, StringType, nullable = false),
      StructField(NumRowsCol, LongType, nullable = false),
      StructField(CompressedCol, LongType, nullable = false),
      StructField(UncompressedCol, LongType, nullable = false))
    val statsCols = primaryKeys.flatMap { pk =>
      val f = tableSchema(pk)
      if (statsEligible(f.dataType))
        Some(StructField(statsColName(FieldIds.fieldId(f)),
          StructType(Seq(
            StructField("_MIN", f.dataType), StructField("_MAX", f.dataType)))))
      else None
    }
    StructType(base ++ statsCols)
  }

  /** Read one data file's footer: row count, sizes, merged PK min/max
    * across row groups. Driver-side, footer-only IO. */
  def harvestFooter(
      absPath: String,
      relPath: String,
      conf: Configuration,
      primaryKeys: Seq[String]): IndexFileMeta = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(absPath), conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val numRows = blocks.map(_.getRowCount).sum
      val uncompressed = blocks.map(_.getTotalByteSize).sum
      val compressed = blocks.flatMap(_.getColumns.asScala).map(_.getTotalSize).sum
      val stats = primaryKeys.flatMap { pk =>
        val perBlock = blocks.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == pk)
            .map(_.getStatistics).filter(s => s != null && s.hasNonNullValue)
        }
        if (perBlock.isEmpty || perBlock.size < blocks.size) None
        else {
          val minMax = perBlock.map(statsValues)
          // merge across row groups (index.py:145-179)
          val merged = minMax.reduce { (a, b) =>
            (minAny(a._1, b._1), maxAny(a._2, b._2))
          }
          Some(pk -> ColumnStats(merged._1, merged._2))
        }
      }.toMap
      IndexFileMeta(relPath, numRows, compressed, uncompressed, stats)
    } finally reader.close()
  }

  private def statsValues(s: Statistics[_]): (Any, Any) = s match {
    case l: LongStatistics => (l.getMin, l.getMax)
    case i: IntStatistics => (i.getMin, i.getMax)
    case d: DoubleStatistics => (d.getMin, d.getMax)
    case f: FloatStatistics => (f.getMin, f.getMax)
    case b: BinaryStatistics => (b.genericGetMin.toStringUsingUTF8, b.genericGetMax.toStringUsingUTF8)
    case other => (other.genericGetMin, other.genericGetMax)
  }

  private[graft] def minAny(a: Any, b: Any): Any = (a, b) match {
    case (x: Long, y: Long) => if (x <= y) x else y
    case (x: Int, y: Int) => if (x <= y) x else y
    case (x: Double, y: Double) => if (x <= y) x else y
    case (x: Float, y: Float) => if (x <= y) x else y
    case (x: String, y: String) => if (x <= y) x else y
    case _ => a
  }
  private[graft] def maxAny(a: Any, b: Any): Any = (a, b) match {
    case (x: Long, y: Long) => if (x >= y) x else y
    case (x: Int, y: Int) => if (x >= y) x else y
    case (x: Double, y: Double) => if (x >= y) x else y
    case (x: Float, y: Float) => if (x >= y) x else y
    case (x: String, y: String) => if (x >= y) x else y
    case _ => a
  }

  /** Global (min, max) of a primary-key field across the current
    * snapshot's manifest stats — the input-range half of the reference's
    * stats-driven join partitioning (ray/ops/join.py:148-176). None when
    * the field has no stats column or any file lacks stats (conservative:
    * an unknown file could extend the range). */
  def keyRange(spark: SparkSession, storage: Storage, field: String): Option[(Any, Any)] = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val f = storage.schema(field)
    if (!statsEligible(f.dataType)) return None
    val ms = storage.metadata.currentSnapshot.manifestFiles.indexManifestFiles
    if (ms.isEmpty) return None
    val cname = statsColName(FieldIds.fieldId(f))
    val mdf = readIndexManifests(spark, storage, ms)
    if (!mdf.columns.contains(cname)) return None
    val r = mdf.agg(
      min(col(s"$cname._MIN")), max(col(s"$cname._MAX")),
      count(lit(1)), count(col(s"$cname._MIN"))).collect()(0)
    if (r.isNullAt(0) || r.getLong(2) != r.getLong(3)) None
    else Some((r.get(0), r.get(1)))
  }

  /** Write an index manifest parquet file at a fresh metadata path;
    * returns the relative path. */
  def writeIndexManifest(
      spark: SparkSession,
      storage: Storage,
      files: Seq[IndexFileMeta]): String = {
    val schema = manifestSchema(storage.schema, storage.statsColumns)
    val statsFields = storage.statsColumns.filter(c => statsEligible(storage.schema(c).dataType))
    val rows = files.map { m =>
      val statsVals = statsFields.map { pk =>
        m.pkStats.get(pk).map(s => Row(s.min, s.max)).orNull
      }
      Row.fromSeq(Seq(m.file, m.numRows, m.compressedBytes, m.uncompressedBytes) ++ statsVals)
    }
    val rel = StoragePaths.newIndexManifestFile()
    DriverParquet.write(spark.sparkContext.hadoopConfiguration,
      storage.absolute(rel), schema, rows)
    rel
  }

  def readIndexManifests(spark: SparkSession, storage: Storage, manifests: Seq[String]): DataFrame = {
    require(manifests.nonEmpty)
    spark.read.parquet(manifests.map(storage.absolute): _*)
  }

  /** Write a small driver-built DataFrame as a SINGLE parquet file at
    * `rel` (Spark writes a directory; we move the lone part file). */
  def writeSingleParquet(spark: SparkSession, storage: Storage, df: DataFrame, rel: String): Unit = {
    val tmpRel = s"${StoragePaths.MetadataDir}/tmp_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val tmpAbs = storage.absolute(tmpRel)
    df.coalesce(1).write.mode("overwrite").parquet(tmpAbs)
    val fs = new Path(tmpAbs).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(tmpAbs))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmpAbs"))
    val dst = new Path(storage.absolute(rel))
    if (!fs.rename(part, dst))
      throw new java.io.IOException(s"rename $part -> $dst failed")
    fs.delete(new Path(tmpAbs), true)
  }
}
