package org.apache.spark.sql.graftshim

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{ChangeType, DmlOps, ReadOp, Storage}

/** Structured Streaming source over a graft table's change-data feed —
  * the streaming face of `read_change_data` (reference
  * `/root/reference/python/src/space/core/ops/change_data.py:87-161`,
  * whose incrementality is committed-snapshot granularity):
  *
  * {{{
  *   spark.readStream.format("graft-cdc")
  *     .option("location", "/data/graft/events")
  *     .load()                  // schema: table columns + _change_type + _commit_snapshot_id
  * }}}
  *
  * Offsets are snapshot ids (an offset means "processed through this
  * snapshot"), so checkpoint recovery replays exactly the uncommitted
  * snapshots — the engine's own exactly-once contract rides the table's
  * immutable snapshot lineage, no extra bookkeeping. Each micro-batch
  * covers the snapshots committed since the last trigger; one input
  * partition per changed file, read executor-side through Spark's own
  * parquet reader function (the same closure `FileSourceScanExec`
  * ships), with deletion bitmaps applied by file row position.
  *
  * DELETE rows carry PRIMARY KEYS ONLY (non-key columns null), matching
  * change_data.py:111-112; ADD and DELETE rows of one snapshot share its
  * `_commit_snapshot_id`, and UPDATE is the DELETE+ADD encoding
  * (change_data.py:42-44). Consumers needing the DELETE-before-ADD
  * ordering group by `_change_type` per micro-batch (rows of one batch
  * are unordered, as in any Spark DataFrame).
  *
  * Options: `location` (required), `branch` (default main),
  * `startingSnapshotId` (first snapshot whose changes stream; default 1
  *  = full history — set it past GC-expired snapshots).
  */
class GraftCdcProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftCdc.cdcSchema(GraftCdc.loadStorage(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftCdcTable(new CaseInsensitiveStringMap(properties))
}

object GraftCdc {
  val ChangeTypeCol = "_change_type"
  val SnapshotCol = "_commit_snapshot_id"

  private[graftshim] def location(options: CaseInsensitiveStringMap): String =
    Option(options.get("location")).orElse(Option(options.get("path"))).getOrElse(
      throw new IllegalArgumentException("graft-cdc requires option 'location'"))

  private[graftshim] def loadStorage(options: CaseInsensitiveStringMap): Storage =
    Storage.load(location(options), SparkSession.active.sparkContext.hadoopConfiguration)

  /** Physical table columns (all nullable: DELETEs null non-keys) plus
    * the change-type and snapshot-id metadata columns. */
  def cdcSchema(storage: Storage): StructType = {
    val physical = ReadOp.physicalSchema(storage.schema, storage.recordFields)
    StructType(physical.fields.map(_.copy(nullable = true)) ++ Seq(
      StructField(ChangeTypeCol, StringType, nullable = false),
      StructField(SnapshotCol, LongType, nullable = false)))
  }
}

final class GraftCdcTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {

  private val loc = GraftCdc.location(options)

  override def name(): String = s"graft-cdc.`$loc`"

  override def schema(): StructType = GraftCdc.cdcSchema(GraftCdc.loadStorage(options))

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftCdcMicroBatchStream(SparkSession.active,
            GraftCdc.loadStorage(options), options, appendOnly = false)
      }
    }
}

/** Offset = progress through the branch's snapshot chain. `filesDone = 0`
  * means snapshot `snapshotId` is fully emitted; `filesDone = k > 0`
  * means only its first k change rowsets are (byte/file admission
  * control splits one snapshot across triggers). Old checkpoints
  * (snapshot-only JSON) deserialize with filesDone 0. */
final case class GraftCdcOffset(snapshotId: Long, filesDone: Int = 0) extends Offset {
  override def json(): String =
    if (filesDone == 0) s"""{"snapshotId":$snapshotId}"""
    else s"""{"snapshotId":$snapshotId,"filesDone":$filesDone}"""
}

object GraftCdcOffset {
  def fromJson(json: String): GraftCdcOffset =
    try {
      implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
      org.json4s.jackson.JsonMethods.parse(json).extract[GraftCdcOffset]
    } catch {
      case e: Exception =>
        throw new IllegalArgumentException(s"bad graft-cdc offset: $json", e)
    }
}

/** One changed file of one snapshot: read it, mask to the change's row
  * bitmap, stamp change type + snapshot id. */
final case class GraftCdcPartition(
    absPath: String,
    fileLen: Long,
    bitmapB64: Option[String],
    changeType: String,
    snapshotId: Long) extends InputPartition

/** The change-feed micro-batch stream. `appendOnly = false` is the
  * `graft-cdc` format: DELETE+ADD rowsets with `_change_type` /
  * `_commit_snapshot_id` columns. `appendOnly = true` backs
  * `spark.readStream.table("graft.t")`: ADD rowsets only in the plain
  * table schema; a snapshot that deleted rows fails the stream unless
  * option `ignoreDeletes` is set (the append-only contract would
  * silently miss them otherwise). */
final class GraftCdcMicroBatchStream(
    spark: SparkSession,
    storage: Storage,
    options: CaseInsensitiveStringMap,
    appendOnly: Boolean)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private val branch = Option(options.get("branch")).getOrElse("main")
  private val ignoreDeletes = Option(options.get("ignoreDeletes")).exists(_.toBoolean)
  /** Admission control (all optional, combinable): at most this many
    * FULLY-COMPLETED snapshots / change rowsets (files) / bytes per
    * micro-batch. Files/bytes split one fat snapshot across triggers —
    * DELETE rowsets of a snapshot are ordered before its ADD rowsets, so
    * the delete-before-add contract holds across the split. A batch
    * always admits at least one rowset (progress guarantee). */
  private val maxSnapshotsPerBatch =
    Option(options.get("maxSnapshotsPerBatch")).map(_.toLong)
  private val maxFilesPerBatch =
    Option(options.get("maxFilesPerBatch")).map(_.toInt)
  private val maxBytesPerBatch =
    Option(options.get("maxBytesPerBatch")).map(_.toLong)
  private def unlimited: Boolean =
    maxSnapshotsPerBatch.isEmpty && maxFilesPerBatch.isEmpty && maxBytesPerBatch.isEmpty

  /** One snapshot's change rowsets in emission order: DELETEs first,
    * then ADDs (change_data.py's delete-before-add, preserved under any
    * file-boundary split). */
  private def changeRowsets(sid: Long): Seq[(graft.format.RowBitmap, String)] =
    storage.changeLog(sid).toSeq.flatMap { cl =>
      if (appendOnly && cl.deletedRows.nonEmpty && !ignoreDeletes)
        throw new IllegalStateException(
          s"snapshot $sid of ${storage.location} deleted rows; an append-only " +
            "table stream would miss them — set option ignoreDeletes=true to " +
            "skip deletes, or stream the full feed with format 'graft-cdc'")
      if (appendOnly) cl.addedRows.map(_ -> ChangeType.Add)
      else cl.deletedRows.map(_ -> ChangeType.Delete) ++
        cl.addedRows.map(_ -> ChangeType.Add)
    }

  /** Snapshots with pending rowsets after `from`, oldest first — the
    * partially-emitted snapshot (if any) then the branch chain to head.
    * (Walks THIS branch's parent chain: snapshot ids are allocated
    * globally, so id arithmetic could land on another branch.) */
  private def pendingChain(from: GraftCdcOffset, head: Long): Seq[Long] =
    (if (from.filesDone > 0) Seq(from.snapshotId) else Nil) ++
      (if (head == from.snapshotId) Nil
       else try storage.orderedSnapshotIds(from.snapshotId, head)
       catch {
         // the TYPED expired-history signal: the offset's snapshot was
         // EXPIRED out of metadata while the stream lagged — the one
         // recoverable shape, with a concrete remedy (a fresh checkpoint
         // plus startingSnapshotId past the expired range), surfaced by
         // name instead of folded into the generic walk error
         case e: graft.core.ExpiredHistoryException =>
           throw new IllegalStateException(
             s"checkpointed offset ${from.snapshotId} was EXPIRED from " +
               s"${storage.location} while the stream lagged (branch '$branch', " +
               s"head $head): the change walk is impossible; restart from a " +
               "fresh checkpoint with option startingSnapshotId set past the " +
               "expired history (or rebuild the consumer from a full read)", e)
         case e: IllegalArgumentException =>
           // the offset's snapshot still EXISTS but is not on the branch
           // chain — the table was ROLLED BACK past the stream's offset
           // (or the offset points into another branch's lineage); the
           // stream's emitted history diverged from what the branch can
           // serve, so failing is the only safe move
           throw new IllegalStateException(
             s"checkpointed offset ${from.snapshotId} is no longer on branch " +
               s"'$branch' of ${storage.location} (head $head): the table was " +
               "rolled back past the stream's offset (or the offset belongs to " +
               "another branch's lineage); restart the stream from a fresh " +
               "checkpoint", e)
       })

  override def initialOffset(): Offset =
    GraftCdcOffset(Option(options.get("startingSnapshotId")).map(_.toLong - 1).getOrElse(0L))

  override def latestOffset(): Offset = {
    storage.reload()
    GraftCdcOffset(storage.branchHead(branch))
  }

  /** (qualified path, length) of a change file, cached for the stream's
    * lifetime — data files are immutable, and both the byte-budget
    * admission loop and planInputPartitions need the same status. */
  private val fileMetaCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, Long)]
  private def fileMeta(rel: String): (String, Long) =
    fileMetaCache.getOrElseUpdate(rel, {
      val p = new Path(storage.absolute(rel))
      val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
      (st.getPath.toString, st.getLen)
    })

  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    storage.reload()
    val head = storage.branchHead(branch)
    val s = start.asInstanceOf[GraftCdcOffset]
    if (unlimited) return GraftCdcOffset(head)

    val fileLen: String => Long =
      if (maxBytesPerBatch.isEmpty) _ => 0L else rel => fileMeta(rel)._2
    var files = 0
    var bytes = 0L
    var fullSnaps = 0L
    var end = s
    for (sid <- pendingChain(s, head)) {
      val sets = changeRowsets(sid)
      val from = if (sid == s.snapshotId) s.filesDone else 0
      var k = from
      var stopped = false
      while (k < sets.size && !stopped) {
        val len = fileLen(sets(k)._1.file)
        val admit = files == 0 || // always make progress
          (maxFilesPerBatch.forall(files + 1 <= _) &&
            maxBytesPerBatch.forall(bytes + len <= _))
        if (admit) { files += 1; bytes += len; k += 1 } else stopped = true
      }
      if (k < sets.size) {
        // budget exhausted inside this snapshot. If NOTHING of it fit
        // (k == from), close the batch at the last COMPLETED offset —
        // (sid, 0) would read as "sid fully emitted" and admit the whole
        // snapshot. k > from is guaranteed for the first pending
        // snapshot (files == 0 always admits), so `end` has advanced.
        return if (k == from) end else GraftCdcOffset(sid, k)
      }
      end = GraftCdcOffset(sid)
      fullSnaps += 1
      if (maxSnapshotsPerBatch.exists(fullSnaps >= _)) return end
      if (maxFilesPerBatch.exists(files >= _) || maxBytesPerBatch.exists(bytes >= _))
        return end
    }
    end
  }

  override def reportLatestOffset(): Offset = {
    storage.reload()
    GraftCdcOffset(storage.branchHead(branch))
  }

  override def deserializeOffset(json: String): Offset = GraftCdcOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftCdcOffset]
    val e = end.asInstanceOf[GraftCdcOffset]
    if (s == e) return Array.empty
    pendingChain(s, e.snapshotId).flatMap { sid =>
      val sets = changeRowsets(sid)
      val from = if (sid == s.snapshotId) s.filesDone else 0
      val to = if (sid == e.snapshotId && e.filesDone > 0) e.filesDone else sets.size
      sets.slice(from, to).map { case (rb, ct) =>
        val (absPath, len) = fileMeta(rb.file)
        GraftCdcPartition(absPath, len,
          if (rb.allRows) None else rb.bitmapB64, ct, sid)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val physical = ReadOp.physicalSchema(storage.schema, storage.recordFields)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // Spark's own shippable parquet-read closure; returning_batch=false
    // keeps the iterator row-based (vectorized decode still applies
    // underneath). No filters pushed, so rows arrive in file order and a
    // running counter IS the file row position for the bitmap mask
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, physical, new StructType(), physical, Nil,
      Map(org.apache.spark.sql.execution.datasources.FileFormat.OPTION_RETURNING_BATCH -> "false"),
      classic.sessionState.newHadoopConf())
    GraftCdcReaderFactory(readFunc, physical, storage.primaryKeys.toSet,
      emitChangeCols = !appendOnly)
  }
}

final case class GraftCdcReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    physical: StructType,
    primaryKeys: Set[String],
    emitChangeCols: Boolean) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftCdcPartition]
    val base = readFunc(PartitionedFile(
      InternalRow.empty, SparkPath.fromUrlString(p.absPath), 0, p.fileLen))
    // the reader contract smuggles ColumnarBatch through Iterator[InternalRow]
    val rows: Iterator[InternalRow] = base.asInstanceOf[Iterator[Any]].flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r => Iterator.single(r.asInstanceOf[InternalRow])
    }
    val bitmap = p.bitmapB64.map(DmlOps.deserializeBitmap)
    val isDelete = p.changeType == ChangeType.Delete
    val cols = physical.fields.zipWithIndex.map { case (f, i) =>
      // DELETE rows carry primary keys only (change_data.py:111-112)
      if (isDelete && !primaryKeys(f.name)) Literal.create(null, f.dataType)
      else BoundReference(i, f.dataType, nullable = true)
    }.toSeq
    val exprs =
      if (!emitChangeCols) cols
      else cols ++ Seq(
        Literal(UTF8String.fromString(p.changeType), StringType),
        Literal(p.snapshotId))
    val proj = UnsafeProjection.create(exprs)

    new PartitionReader[InternalRow] {
      private var rowIdx = -1L
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (rows.hasNext) {
          val r = rows.next()
          rowIdx += 1
          if (bitmap.forall(_.contains(rowIdx.toInt))) {
            current = proj(r)
            return true
          }
        }
        false
      }

      override def get(): InternalRow = current

      override def close(): Unit = ()
    }
  }
}
