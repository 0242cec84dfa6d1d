package graft.core

import java.util.Base64

import org.apache.hadoop.fs.Path
import org.roaringbitmap.RoaringBitmap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.format._

/** Copy-on-write mutations (reference
  * `/root/reference/python/src/space/core/ops/delete.py:56-228`,
  * `insert.py:60-104`).
  *
  * Delete: prune to candidate files, locate matching rows WITH their
  * per-file row positions (`_metadata.row_index` — no full-file
  * materialization), rewrite only affected files keeping the surviving
  * rows, carry over untouched manifest rows, and record the deleted row
  * positions as RoaringBitmaps in the change log.
  *
  * Insert/upsert replace the reference's OR-of-ANDs `primary_key_filter`
  * (flagged inefficient at ops/utils.py:77-78) with left-semi / left-anti
  * joins — the distributed-native formulation.
  */
object DmlOps {

  private val FileCol = "__graft_file"
  private val RowCol = "__graft_row"

  /** CoW delete of rows matching `cond`. None = no-op (nothing matched). */
  def delete(spark: SparkSession, storage: Storage, snapshotId: Long, cond: Column): Option[Patch] =
    deleteCore(spark, storage, snapshotId,
      candidates = ReadOp.plan(spark, storage, snapshotId, Some(cond)).files,
      markMatched = df => df.filter(cond),
      keepSurvivors = df => df.filter(!coalesce(cond, lit(false))))

  /** CoW delete of rows whose primary key appears in `keys`. */
  def deleteByKeys(spark: SparkSession, storage: Storage, snapshotId: Long, keys: DataFrame): Option[Patch] = {
    val pks = storage.primaryKeys
    val k = keys.select(pks.map(col): _*).distinct()
    deleteCore(spark, storage, snapshotId,
      candidates = ReadOp.plan(spark, storage, snapshotId, keyRangePredicate(spark, k, storage)).files,
      markMatched = df => df.join(k, pks, "left_semi"),
      keepSurvivors = df => df.join(k, pks, "left_anti"))
  }

  /** Stats-driven pre-filter for key deletes: `pk BETWEEN min AND max` of
    * the incoming keys (the useful half of the reference's range
    * partitioning, ray/ops/join.py:148-176) lets manifest pruning skip
    * files entirely outside the key range. */
  private def keyRangePredicate(spark: SparkSession, keys: DataFrame, storage: Storage): Option[Column] = {
    val pk = storage.primaryKeys.head
    if (!ManifestIO.statsEligible(storage.schema(pk).dataType)) return None
    val row = keys.agg(min(col(pk)).as("lo"), max(col(pk)).as("hi")).collect()(0)
    if (row.isNullAt(0)) None
    else Some(col(pk) >= lit(row.get(0)) && col(pk) <= lit(row.get(1)))
  }

  private def deleteCore(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      candidates: Seq[String],
      markMatched: DataFrame => DataFrame,
      keepSurvivors: DataFrame => DataFrame): Option[Patch] = {
    if (candidates.isEmpty) return None
    val physical = ReadOp.physicalSchema(storage.schema, storage.recordFields)
    // data file names are uuid-unique: key executor-side rows by name
    val relByName = candidates.map(c => new Path(c).getName -> c).toMap

    val withPos = spark.read.schema(physical)
      .parquet(candidates.map(storage.absolute): _*)
      .withColumn(FileCol, element_at(split(col("_metadata.file_path"), "/"), -1))
      .withColumn(RowCol, col("_metadata.row_index"))

    // (file, deleted row positions) — bitmap per affected file
    val matchedRows = markMatched(withPos)
      .groupBy(col(FileCol))
      .agg(collect_list(col(RowCol)).as("rows"))
      .collect()
    if (matchedRows.isEmpty) return None

    val deletedByFile: Map[String, Seq[Long]] = matchedRows.map { r =>
      relByName(r.getString(0)) -> r.getSeq[Long](1)
    }.toMap
    val affectedRel = deletedByFile.keySet

    // rewrite ONLY affected files; survivors keep record addresses as-is
    // (record_address_input=True analog, delete.py:103)
    val affectedDF = spark.read.schema(physical)
      .parquet(affectedRel.toSeq.map(storage.absolute): _*)
    val survivors = keepSurvivors(affectedDF)
    val appendPatch = AppendOp.writeFiles(spark, storage, survivors)

    // manifest carryover: drop affected manifests, re-emit their untouched
    // rows as one combined manifest (delete.py:144-150)
    val manifests = storage.snapshotOrFail(snapshotId).manifestFiles.indexManifestFiles
    val mdf = ManifestIO.readIndexManifests(spark, storage, manifests)
      .withColumn("__mfile", element_at(split(col("_metadata.file_path"), "/"), -1))
    val manifestRelByName = manifests.map(m => new Path(m).getName -> m).toMap
    val affectedManifestNames = mdf
      .filter(col(ManifestIO.FileCol).isin(affectedRel.toSeq: _*))
      .select(col("__mfile")).distinct().collect().map(_.getString(0)).toSeq
    val removedManifests = affectedManifestNames.map(manifestRelByName)

    // manifest rows fit on the driver (the planner collects the file
    // list from them anyway) → write the carryover without a Spark job
    val carryover = mdf
      .filter(col("__mfile").isin(affectedManifestNames: _*) &&
        !col(ManifestIO.FileCol).isin(affectedRel.toSeq: _*))
      .drop("__mfile")
    val carryoverRows = carryover.collect().toSeq
    val carryoverManifest =
      if (carryoverRows.isEmpty) Nil
      else {
        val rel = StoragePaths.newIndexManifestFile()
        DriverParquet.write(spark.sparkContext.hadoopConfiguration,
          storage.absolute(rel), carryover.schema, carryoverRows)
        List(rel)
      }

    // negative stats of the removed files (delete.py's stats delta)
    val removedStats = mdf
      .filter(col(ManifestIO.FileCol).isin(affectedRel.toSeq: _*))
      .agg(sum(ManifestIO.NumRowsCol), sum(ManifestIO.CompressedCol), sum(ManifestIO.UncompressedCol))
      .collect()(0)
    val removed = StorageStatistics(
      numRows = -removedStats.getLong(0),
      indexCompressedBytes = -removedStats.getLong(1),
      indexUncompressedBytes = -removedStats.getLong(2))

    // per-file numRows for allRows detection
    val fileRows: Map[String, Long] = mdf
      .filter(col(ManifestIO.FileCol).isin(affectedRel.toSeq: _*))
      .select(col(ManifestIO.FileCol), col(ManifestIO.NumRowsCol))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val deleteLog = ChangeLog(deletedRows = deletedByFile.toList.sortBy(_._1).map {
      case (file, rows) =>
        val all = fileRows.get(file).contains(rows.size.toLong)
        RowBitmap(file, allRows = all, numRows = rows.size.toLong,
          bitmapB64 = if (all) None else Some(serializeBitmap(rows)))
    })

    Some(Patch(
      addedIndexManifests = appendPatch.addedIndexManifests ++ carryoverManifest,
      removedIndexManifests = removedManifests.toList,
      statsDelta = appendPatch.statsDelta + removed,
      changeLog = Some(deleteLog)))
  }

  /** Append with duplicate-primary-key rejection against the current
    * snapshot AND within the input (insert.py:60-104, filter_matched
    * :119-134 — as a distributed semi-join instead of OR-chains). */
  def insert(spark: SparkSession, storage: Storage, snapshotId: Long, df: DataFrame): Patch = {
    val pks = storage.primaryKeys
    failOnInternalDupes(df, pks)
    val existing = ReadOp.scanPhysical(spark, storage, snapshotId)
      .select(pks.map(col): _*)
    val dupes = existing.join(df.select(pks.map(col): _*), pks, "left_semi").limit(1).count()
    require(dupes == 0, s"insert: input contains existing primary keys")
    RecordIO.writeWithRecords(spark, storage, df)
  }

  /** Delete-matching-PKs + append, one snapshot; DELETE+ADD of the same
    * key in one snapshot is the UPDATE encoding (change_data.py:42-44). */
  def upsert(spark: SparkSession, storage: Storage, snapshotId: Long, df: DataFrame): Patch = {
    failOnInternalDupes(df, storage.primaryKeys)
    val deletePatch = deleteByKeys(spark, storage, snapshotId, df)
    val appendPatch = RecordIO.writeWithRecords(spark, storage, df)
    Patch.merge(deletePatch.toSeq :+ appendPatch).get
  }

  private def failOnInternalDupes(df: DataFrame, pks: Seq[String]): Unit = {
    val d = df.groupBy(pks.map(col): _*).count().filter(col("count") > 1).limit(1).count()
    require(d == 0, "input contains duplicate primary keys")
  }

  def serializeBitmap(rows: Seq[Long]): String = {
    val bm = new RoaringBitmap()
    rows.foreach(r => bm.add(r.toInt))
    val buf = java.nio.ByteBuffer.allocate(bm.serializedSizeInBytes())
    bm.serialize(buf)
    Base64.getEncoder.encodeToString(buf.array())
  }

  def deserializeBitmap(b64: String): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(java.nio.ByteBuffer.wrap(Base64.getDecoder.decode(b64)))
    bm
  }
}
