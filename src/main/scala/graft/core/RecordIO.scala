package graft.core

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.format._

/** Hybrid columnar/row storage: record-field payloads in row-oriented
  * record Parquet files (single `value` binary column, one row group per
  * flush), index files holding `{_FILE,_ROW_ID}` addresses — the
  * reference's core idea (SURVEY.md §1.2; reference
  * `/root/reference/python/src/space/core/ops/append.py:197-283`, read
  * stitch `ops/read.py:155-205`).
  *
  * Write: one `mapPartitions` pass — each Spark task streams its rows,
  * appends payload bytes to a per-field record file (rotated at the size
  * cap), and emits the index row with the address struct. The index rows
  * flow straight into the distributed index write: a single job, no row
  * through the driver, no staging copy.
  *
  * Read: addresses are stitched by an equi-join against the record files
  * keyed by `(file, _metadata.row_index)` — only the record files the
  * filtered index rows actually reference are opened.
  */
object RecordIO {

  /** Per-record-file cap, uncompressed payload bytes (reference default
    * 100 MiB, options.py:74-75). */
  val MaxRecordFileBytes: Long = 512L * 1024 * 1024

  private val RecordSchema =
    "message graft_record { required binary value; }"

  /** Append `df` (logical schema) writing record payloads + index files +
    * both manifests; returns the merged Patch. */
  def writeWithRecords(spark: SparkSession, storage: Storage, df: DataFrame): Patch = {
    val recordFields = storage.recordFields
    if (recordFields.isEmpty)
      return AppendOp.writeFiles(spark, storage, df, writeClustered = true)

    val schema = storage.schema
    val physical = ReadOp.physicalSchema(schema, recordFields)
    // align input columns to schema order first
    val aligned = df.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val recordIdx = recordFields.map(rf => schema.fieldIndex(rf)).toArray
    val location = storage.location
    val fieldNames = recordFields.toArray
    // per-field payload codec (serializers/base.py:30-108; FieldSerializer
    // is Serializable, so instances ride the task closure)
    val serializers = recordIdx.map(i => i -> SerializerRegistry.resolve(schema(i))).toMap

    // ship the SESSION's Hadoop conf: the table may live on a filesystem
    // configured via spark.hadoop.* (credentials, custom fs impl) that a
    // default executor-side Configuration would not resolve
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val indexDF = aligned.mapPartitions { it =>
      val conf = serConf.value
      val writers = fieldNames.map(f => new RecordFileWriter(location, f, conf))
      val writerByIdx = recordIdx.zip(writers).toMap
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) writers.foreach(_.close())
          h
        }
        def next(): Row = {
          val row = it.next()
          val vals = row.toSeq.toArray
          recordIdx.foreach { i =>
            val bytes = row.getAs[Array[Byte]](i)
            vals(i) =
              if (bytes == null) null
              else {
                val (file, rowId) = writerByIdx(i).write(serializers(i).serialize(bytes))
                Row(file, rowId)
              }
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(Encoders.row(physical))

    // writeClustered: re-arranging the INDEX rows after the payload
    // write is safe — addresses are data and ride the shuffle
    val result = AppendOp.writeFilesWithMeta(spark, storage, indexDF,
      writeClustered = true)
    if (result.files.isEmpty) return result.patch

    // record manifest: distinct record files referenced by the new index
    // files, footer-harvested (record.py:27-32)
    val newIndexAbs = result.files.map(f => storage.absolute(f.file))
    val idxDF = spark.read.parquet(newIndexAbs: _*)
    val toHarvest = recordFields.flatMap { rf =>
      val fid = FieldIds.fieldId(schema(rf))
      idxDF.select(col(s"$rf._FILE")).na.drop().distinct()
        .collect().map(_.getString(0) -> fid).toSeq
    }
    val recordMetas = harvestRecordFooters(spark, storage, toHarvest)
    recordManifestPatch(spark, storage, recordMetas) match {
      case None => result.patch
      case Some(p) => Patch.merge(Seq(result.patch, p)).get
    }
  }

  /** One (file, fieldId, numRows, uncompressedBytes) row per record file,
    * footer-harvested by a Spark job — one small task per batch of files,
    * not a serial driver loop (the harvest is O(record files)). */
  private[core] def harvestRecordFooters(
      spark: SparkSession,
      storage: Storage,
      files: Seq[(String, Int)]): Seq[(String, Int, Long, Long)] =
    if (files.isEmpty) Nil
    else {
      val withAbs = files.map { case (rel, fid) => (rel, fid, storage.absolute(rel)) }
      // session Hadoop conf, for the same spark.hadoop.* reason as above
      val serConf = new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf())
      spark.sparkContext
        .parallelize(withAbs, math.max(1, math.min(withAbs.size, 32)))
        .map { case (rel, fid, abs) =>
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(abs), serConf.value))
          try {
            val blocks = reader.getFooter.getBlocks.asScala
            (rel, fid, blocks.map(_.getRowCount).sum, blocks.map(_.getTotalByteSize).sum)
          } finally reader.close()
        }
        .collect().toSeq.sortBy(r => (r._2, r._1))
    }

  /** Write a record manifest for `metas`; None when there is nothing to
    * record. The stats delta counts record payload bytes. */
  private[core] def recordManifestPatch(
      spark: SparkSession,
      storage: Storage,
      metas: Seq[(String, Int, Long, Long)]): Option[Patch] = {
    if (metas.isEmpty) return None
    val manifestSchema = StructType(Seq(
      StructField("_FILE", StringType, nullable = false),
      StructField("_FIELD_ID", IntegerType, nullable = false),
      StructField("_NUM_ROWS", LongType, nullable = false),
      StructField("_UNCOMPRESSED_BYTES", LongType, nullable = false)))
    val rows = metas.map(m => Row(m._1, m._2, m._3, m._4))
    val rel = StoragePaths.newRecordManifestFile()
    DriverParquet.write(spark.sparkContext.hadoopConfiguration,
      storage.absolute(rel), manifestSchema, rows)
    Some(Patch(
      addedRecordManifests = List(rel),
      statsDelta = StorageStatistics(
        recordUncompressedBytes = metas.map(_._4).sum)))
  }

  /** Stitch record values back into a physical-schema DataFrame
    * (read.py:155-205: group addresses by file, fetch, restore). The
    * re-order the reference does with `__RECORD_KEY` falls out of the
    * join keeping index rows as the probe side. */
  def stitch(
      spark: SparkSession,
      storage: Storage,
      physicalDF: DataFrame,
      fields: Option[Seq[String]]): DataFrame = {
    val wanted = fields.getOrElse(storage.schema.fieldNames.toSeq)
    val present = storage.recordFields.filter(wanted.contains)
    present.foldLeft(physicalDF) { (df, rf) =>
      stitchOne(spark, storage, df, rf)
    }
  }

  private def stitchOne(spark: SparkSession, storage: Storage, df: DataFrame, rf: String): DataFrame = {
    // only open record files this (possibly filtered) result references
    val files = df.select(col(s"$rf._FILE")).na.drop().distinct()
      .collect().map(_.getString(0)).toSeq
    if (files.isEmpty)
      return df.withColumn(rf, lit(null).cast(BinaryType))

    // map each scanned file back to the exact path spelling the address
    // column uses, via FULL normalized paths (basenames collide for
    // externally-ingested record files)
    val conf = spark.sparkContext.hadoopConfiguration
    val relByKey = DmlOps.relByQualifiedKey(storage, conf, files)
    val bc = spark.sparkContext.broadcast(relByKey)
    val toAddressPath = udf((p: String) => bc.value(BitmapCache.normKey(p)))

    val fileKey = s"__${rf}_file"
    val rowKey = s"__${rf}_row"
    // inverse payload codec (base.py:30-108: serializers apply in the
    // record read path)
    val ser = SerializerRegistry.resolve(storage.schema(rf))
    val valueCol =
      if (SerializerRegistry.isPassthrough(ser)) col("value")
      else udf((b: Array[Byte]) => if (b == null) null else ser.deserialize(b)).apply(col("value"))
    val records = spark.read.parquet(files.map(storage.absolute): _*)
      .select(
        valueCol.as(s"__${rf}_value"),
        toAddressPath(col("_metadata.file_path")).as(fileKey),
        col("_metadata.row_index").cast(IntegerType).as(rowKey))

    df
      .withColumn(fileKey, col(s"$rf._FILE"))
      .withColumn(rowKey, col(s"$rf._ROW_ID"))
      .join(records, Seq(fileKey, rowKey), "left")
      .withColumn(rf, col(s"__${rf}_value"))
      .drop(fileKey, rowKey, s"__${rf}_value")
  }
}

/** Executor-side rotating record-file writer (append.py:269-283 analog):
  * parquet files with a single binary column, rotated when the
  * uncompressed payload size passes the cap. Returns (relativePath,
  * rowIdInFile) addresses. */
final class RecordFileWriter(tableLocation: String, field: String, conf: Configuration) {
  private val schema = MessageTypeParser.parseMessageType(
    "message graft_record { required binary value; }")
  private val factory = new SimpleGroupFactory(schema)

  private var writer: org.apache.parquet.hadoop.ParquetWriter[org.apache.parquet.example.data.Group] = _
  private var currentRel: String = _
  private var rowId: Int = 0
  private var bytesWritten: Long = 0L

  private def open(): Unit = {
    currentRel = StoragePaths.newRecordDataFile(field)
    val abs = new Path(tableLocation, currentRel)
    import org.apache.parquet.hadoop.example.GroupWriteSupport
    val c = new Configuration(conf)
    GroupWriteSupport.setSchema(schema, c)
    writer = ExampleParquetWriter.builder(abs).withConf(c).withType(schema).build()
    rowId = 0
    bytesWritten = 0L
  }

  def write(bytes: Array[Byte]): (String, Int) = {
    if (writer == null) open()
    else if (bytesWritten + bytes.length > RecordIO.MaxRecordFileBytes && rowId > 0) {
      writer.close(); open()
    }
    val g = factory.newGroup()
    g.append("value", Binary.fromConstantByteArray(bytes))
    writer.write(g)
    val addr = (currentRel, rowId)
    rowId += 1
    bytesWritten += bytes.length
    addr
  }

  def close(): Unit = if (writer != null) { writer.close(); writer = null }
}
