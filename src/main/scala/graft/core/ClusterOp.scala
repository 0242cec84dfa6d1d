package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.format._

/** CLUSTER BY maintenance op: rewrite the table's index files
  * range-partitioned and sorted by the given columns, so per-file
  * min/max stats become tight, disjoint ranges and falsifiable-filter
  * pruning ([[Pruning]]) on those columns skips almost everything.
  *
  * Declared stats columns ([[Storage.statsColumns]]) only pay off when
  * files are clustered on them — after ingestion order scatters a
  * column's values across every file, each file spans the full value
  * range and nothing is falsifiable. At 100 TB this op is the
  * difference between "stats exist" and "stats prune": one scheduled
  * rewrite turns every subsequent filtered scan into a partition's
  * worth of IO. The reference has no analog (no compaction either);
  * same family as Delta/Iceberg clustering maintenance.
  *
  * Unlike [[CompactOp]] (shuffle-free by design) this op inherently
  * SHUFFLES the rewritten bytes once — that is the price of global
  * ordering, paid once per rewrite, amortized over every pruned scan.
  *
  *  - Record-field addresses ride through untouched (payload files are
  *    never read or moved), as in compaction and CoW delete.
  *  - NO change log: physically-reorganizing, logically-idempotent —
  *    `diff()` across a clustering snapshot reports nothing and MV
  *    refresh skips it.
  *  - Replaced files stay on disk for time travel until
  *    [[GcOps.garbageCollect]].
  */
object ClusterOp {

  final case class ClusterResult(rewrittenFiles: Int, outputFiles: Int, rows: Long)

  /** Build the clustering patch, or None for an empty table.
    *
    * `zorder = false`: lexicographic range-sort — optimal pruning on the
    * FIRST column, nothing for the rest. `zorder = true`: sort by a
    * Morton (bit-interleaved) key over ALL `sortCols`, so each file
    * covers a small tile of the multi-dimensional value space and
    * min/max stats prune filters on EVERY clustered column (the
    * Delta/Iceberg OPTIMIZE ZORDER BY tradeoff: slightly looser
    * per-column ranges in exchange for pruning on all dimensions). */
  def cluster(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      sortCols: Seq[String],
      targetFileRows: Long,
      zorder: Boolean = false): Option[(Patch, ClusterResult)] = {
    require(sortCols.nonEmpty, "clusterBy requires at least one column")
    require(storage.metadata.numBuckets == 0,
      "clustering would destroy the hash-bucket layout of a bucketed table")
    require(targetFileRows > 0)
    require(!zorder || (sortCols.size >= 2 && sortCols.size <= 4),
      "zorder needs 2-4 columns (16 bits per dimension in a 64-bit key)")
    sortCols.foreach { c =>
      require(storage.schema.fieldNames.contains(c), s"unknown cluster column $c")
      require(!storage.recordFields.contains(c), s"record field $c cannot cluster")
      if (zorder) storage.schema(c).dataType match {
        case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType => ()
        case dt => throw new IllegalArgumentException(
          s"zorder column $c must be numeric, got $dt")
      }
    }
    val snap = storage.snapshotOrFail(snapshotId)
    if (snap.manifestFiles.indexManifestFiles.isEmpty) return None

    val mdf = ManifestIO.readIndexManifests(
      spark, storage, snap.manifestFiles.indexManifestFiles)
    val files = mdf
      .select(col(ManifestIO.FileCol), col(ManifestIO.NumRowsCol))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (files.isEmpty) return None

    val physical = ReadOp.physicalSchema(storage.schema, storage.recordFields)
    val totalRows = files.map(_._2).sum
    val parts = math.max(1, math.ceil(totalRows.toDouble / targetFileRows).toInt)
    val scan = spark.read.schema(physical)
      .parquet(files.map(f => storage.absolute(f._1)): _*)
    val rows =
      if (!zorder)
        scan.repartitionByRange(parts, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else {
        val zk = zorderKey(scan, sortCols)
        // the interleaved key drives BOTH the range partitioning and the
        // in-partition sort; AppendOp's schema-align select drops it
        scan.withColumn("__zkey", zk)
          .repartitionByRange(parts, col("__zkey"))
          .sortWithinPartitions(col("__zkey"))
      }
    val written = AppendOp.writeFilesWithMeta(spark, storage, rows)
    val appendPatch = written.patch

    val co = DmlOps.manifestCarryover(spark, storage, snapshotId, files.map(_._1).toSet)
    val outRows = appendPatch.statsDelta.numRows
    require(outRows == -co.removedStats.numRows,
      s"clustering row-count drift: wrote $outRows, removed ${-co.removedStats.numRows}")
    val patch = Patch(
      addedIndexManifests = appendPatch.addedIndexManifests ++ co.carryoverManifests,
      removedIndexManifests = co.removedManifests,
      statsDelta = appendPatch.statsDelta + co.removedStats,
      changeLog = None,
      manifestSummaries = appendPatch.manifestSummaries ++ co.summaries)
    Some((patch, ClusterResult(files.size, written.files.size, outRows)))
  }

  private val ZBits = 16 // per-dimension resolution: 65k tiles per axis

  /** Morton key over numeric columns: each value is linearly normalized
    * into [0, 2^16) via the column's global min/max (one tiny agg job —
    * at 100 TB the executors compute partial min/max map-side and ship
    * one row), then the per-column 16-bit ranks are bit-interleaved.
    * Nulls sort first (rank 0). Static expression tree, codegen'd. */
  private[core] def zorderKey(df: DataFrame, cols: Seq[String]): Column = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"mn_$c"), max(col(c).cast("double")).as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val maxRank = (1L << ZBits) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      val span = if (mx > mn) mx - mn else 1.0
      least(lit(maxRank), greatest(lit(0L),
        ((col(c).cast("double") - lit(mn)) / lit(span) * lit(maxRank.toDouble)).cast("long")))
        .cast("long")
    }
    val n = ranks.size
    val terms = for { i <- 0 until n; j <- 0 until ZBits } yield
      shiftleft(shiftright(ranks(i), j).bitwiseAND(lit(1L)), j * n + i)
    coalesce(terms.reduce(_.bitwiseOR(_)), lit(0L))
  }
}
