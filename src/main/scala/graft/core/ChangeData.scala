package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.format.RowBitmap

object ChangeType {
  val Add = "ADD"
  val Delete = "DELETE"
}

/** One change-data batch: all rows added to / deleted from the table in
  * one snapshot. DELETE batches carry PRIMARY KEYS ONLY
  * (change_data.py:111-112). */
final case class ChangeBatch(snapshotId: Long, changeType: String, data: DataFrame)

/** Change-data feed (reference `read_change_data`
  * `/root/reference/python/src/space/core/ops/change_data.py:87-161`).
  *
  * Per snapshot the DELETE batch is emitted BEFORE the ADD batch — the
  * ordering invariant consumers (MV refresh) rely on to re-apply changes
  * (change_data.py:122-132). UPDATE is not a type: DELETE+ADD of the same
  * PK within one snapshot (change_data.py:42-44).
  *
  * Bitmap row masks are applied via `_metadata.row_index` + a broadcast
  * file→bitmap map, so a 1%-of-file delete never materializes the other
  * 99% (SURVEY.md §7.3 "Row bitmaps ↔ DataFrame").
  */
object ChangeData {

  def diff(spark: SparkSession, storage: Storage, startId: Long, endId: Long): Seq[ChangeBatch] =
    storage.orderedSnapshotIds(startId, endId).flatMap { sid =>
      storage.changeLog(sid).toSeq.flatMap { cl =>
        val del = readRowSet(spark, storage, cl.deletedRows, pksOnly = true)
          .map(ChangeBatch(sid, ChangeType.Delete, _))
        val add = readRowSet(spark, storage, cl.addedRows, pksOnly = false)
          .map(ChangeBatch(sid, ChangeType.Add, _))
        del.toSeq ++ add.toSeq // DELETE first
      }
    }

  private def readRowSet(
      spark: SparkSession,
      storage: Storage,
      rows: Seq[RowBitmap],
      pksOnly: Boolean): Option[DataFrame] = {
    if (rows.isEmpty) return None
    val physical = ReadOp.physicalSchema(storage.schema, storage.recordFields)
    val pkCols = storage.primaryKeys.map(col)

    val fullFiles = rows.filter(_.allRows).map(_.file)
    val maskedFiles = rows.filter(r => !r.allRows && r.bitmapB64.isDefined)

    val fullDF =
      if (fullFiles.isEmpty) None
      else Some(spark.read.schema(physical).parquet(fullFiles.map(storage.absolute): _*))

    val maskedDF =
      if (maskedFiles.isEmpty) None
      else {
        // file NAME (uuid-unique) → serialized bitmap
        val byName = maskedFiles.map(r =>
          new org.apache.hadoop.fs.Path(r.file).getName -> r.bitmapB64.get).toMap
        val bc = spark.sparkContext.broadcast(byName)
        val inBitmap = udf { (file: String, row: Long) =>
          BitmapCache.get(file, bc.value(file)).contains(row.toInt)
        }
        Some(spark.read.schema(physical)
          .parquet(maskedFiles.map(r => storage.absolute(r.file)): _*)
          .withColumn("__file", element_at(split(col("_metadata.file_path"), "/"), -1))
          .withColumn("__row", col("_metadata.row_index"))
          .filter(inBitmap(col("__file"), col("__row")))
          .drop("__file", "__row"))
      }

    val all = (fullDF.toSeq ++ maskedDF.toSeq).reduceOption(_.unionByName(_))
    all.map(df => if (pksOnly) df.select(pkCols: _*) else df)
  }
}

/** Per-executor deserialized-bitmap cache keyed by (uuid-unique) file name
  * — the bitmap-contains filter runs per row; deserialization must not. */
object BitmapCache {
  private val cache = TrieMap.empty[String, org.roaringbitmap.RoaringBitmap]
  def get(file: String, b64: String): org.roaringbitmap.RoaringBitmap =
    cache.getOrElseUpdate(file, DmlOps.deserializeBitmap(b64))
}
