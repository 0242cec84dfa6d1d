package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.roaringbitmap.RoaringBitmap

/** Driver-side random access over a record field (reference
  * `RandomAccessDataSource`,
  * `/root/reference/python/src/space/core/random_access.py:37-287`):
  * `length`/`get(i)`/`getBatch(is)` for training loops that index into
  * the dataset without Spark jobs.
  *
  * Implemented OFF Spark (SURVEY.md §7.3 "Random access"): ordinals map
  * onto the snapshot's index files via cumulative manifest row counts;
  * batched fetches group ordinals per index file, read the address
  * column in one sequential pass per file, then group addresses per
  * record file and read payloads in one pass each — the reference's
  * file-instruction batching (random_access.py:244-279).
  *
  * MERGE-ON-READ snapshots are served through a MASKED slow path
  * (VERDICT r11 #3): ordinals address LIVE rows — each file's delete
  * vector subtracts from its ordinal span and the sequential address
  * scan skips dead positions — so the training-loop reader stays
  * available between a scattered MoR delete and the next compaction
  * instead of refusing until the vectors fold. Vector-free snapshots
  * (the steady state) pay nothing: ordinals are physical positions as
  * before. */
final class RandomAccessReader(ds: SpaceDataset, field: String) {
  require(ds.storage.recordFields.contains(field), s"$field is not a record field")

  private val conf: Configuration = ds.spark.sparkContext.hadoopConfiguration
  // inverse payload codec, same hook as the stitch path (the reference
  // deserializes TFDS records on random access, random_access.py:176-183)
  private val serializer = graft.format.SerializerRegistry.resolve(ds.storage.schema(field))

  // delete vectors of the pinned (current) snapshot: file → dead-row
  // bitmap. Empty for copy-on-write tables — the masked path never runs.
  private val deadByFile: Map[String, RoaringBitmap] = {
    val sid = ds.storage.metadata.currentSnapshotId
    ds.storage.deleteVectors(sid).collect {
      case (rel, bm) if bm.bitmapB64.isDefined =>
        rel -> DmlOps.deserializeBitmap(bm.bitmapB64.get)
    }
  }

  /** (absolute index file path, LIVE rows, dead bitmap) in manifest
    * order + running total over live counts. */
  private val files: Seq[(String, Long, Option[RoaringBitmap])] = {
    import org.apache.spark.sql.functions.col
    val ms = ds.storage.metadata.currentSnapshot.manifestFiles.indexManifestFiles
    if (ms.isEmpty) Nil
    else ManifestIO.readIndexManifests(ds.spark, ds.storage, ms)
      .select(col(ManifestIO.FileCol), col(ManifestIO.NumRowsCol))
      .collect().toSeq
      .map { r =>
        val rel = r.getString(0)
        val dead = deadByFile.get(rel)
        (ds.storage.absolute(rel),
          r.getLong(1) - dead.map(_.getLongCardinality).getOrElse(0L),
          dead)
      }
  }
  private val cumulative: Array[Long] = files.scanLeft(0L)(_ + _._2).toArray

  def length: Long = cumulative.last

  def get(i: Long): Array[Byte] = getBatch(Seq(i)).head

  /** Fetch payloads for `ordinals`, preserving input order. */
  def getBatch(ordinals: Seq[Long]): Seq[Array[Byte]] = {
    ordinals.foreach(i => require(i >= 0 && i < length, s"index $i out of [0, $length)"))

    // ordinal → (fileIdx, LIVE row rank in file); group by index file
    val byFile = ordinals.zipWithIndex.map { case (ord, pos) =>
      val fi = {
        var lo = 0; var hi = files.size - 1
        while (lo < hi) {
          val mid = (lo + hi + 1) / 2
          if (cumulative(mid) <= ord) lo = mid else hi = mid - 1
        }
        lo
      }
      (fi, ord - cumulative(fi), pos)
    }.groupBy(_._1)

    // pass 1: addresses from index files (one sequential scan per file);
    // under a delete vector the scan counts LIVE rows only — dead
    // physical positions never consume a rank
    val addresses = new Array[(String, Int)](ordinals.size)
    byFile.foreach { case (fi, rows) =>
      val wanted = rows.map(r => r._2 -> r._3).sortBy(_._1)
      val dead = files(fi)._3
      val reader = ParquetReader.builder(new GroupReadSupport(), new Path(files(fi)._1))
        .withConf(conf).build()
      try {
        var physIdx = 0L
        var liveIdx = 0L
        var remaining = wanted.toList
        var g: Group = reader.read()
        while (g != null && remaining.nonEmpty) {
          val isLive = dead.forall(!_.contains(physIdx.toInt))
          if (isLive) {
            // a while, not an if: the same ordinal may be requested twice
            while (remaining.nonEmpty && liveIdx == remaining.head._1) {
              // a NULL payload stores a null address struct (RecordIO
              // writes null for null bytes): repetition count 0 — getGroup
              // would throw, the ordinal must resolve to null instead
              addresses(remaining.head._2) =
                if (g.getFieldRepetitionCount(field) == 0) null
                else {
                  val addr = g.getGroup(field, 0)
                  (addr.getString("_FILE", 0), addr.getInteger("_ROW_ID", 0))
                }
              remaining = remaining.tail
            }
            liveIdx += 1
          }
          physIdx += 1
          g = if (remaining.nonEmpty) reader.read() else null
        }
      } finally reader.close()
    }

    // pass 2: payloads from record files (one sequential scan per file);
    // null addresses (null payloads) stay null in the result
    val result = new Array[Array[Byte]](ordinals.size)
    addresses.zipWithIndex.filter(_._1 != null).groupBy(_._1._1).foreach { case (recFile, entries) =>
      val wanted = entries.map { case ((_, rowId), pos) => rowId -> pos }.sortBy(_._1)
      val reader = ParquetReader.builder(new GroupReadSupport(),
        new Path(ds.storage.absolute(recFile))).withConf(conf).build()
      try {
        var rowIdx = 0
        var remaining = wanted.toList
        var g: Group = reader.read()
        while (g != null && remaining.nonEmpty) {
          while (remaining.nonEmpty && rowIdx == remaining.head._1) {
            result(remaining.head._2) = serializer.deserialize(g.getBinary("value", 0).getBytes)
            remaining = remaining.tail
          }
          rowIdx += 1
          g = if (remaining.nonEmpty) reader.read() else null
        }
      } finally reader.close()
    }
    result.toSeq
  }
}
