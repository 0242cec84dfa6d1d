package graft.core

import java.util.Base64

import org.apache.hadoop.fs.Path
import org.roaringbitmap.RoaringBitmap
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
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
  * The deletion bitmaps are built IN THE EXECUTORS by a typed
  * [[Aggregator]] (the reference builds per-file bitmaps inside each
  * remote `FileSetDeleteOp`, ray/ops/delete.py:32-70, bitmap at
  * core/ops/delete.py:215-228): the shuffle carries only `(file, row)`
  * pairs and the driver receives one `(file, serializedBitmap)` row per
  * affected FILE — O(files), never O(deleted rows).
  *
  * Insert/upsert replace the reference's OR-of-ANDs `primary_key_filter`
  * (flagged inefficient at ops/utils.py:77-78) with left-semi / left-anti
  * joins — the distributed-native formulation.
  */
object DmlOps {

  private[graft] val FileCol = "__graft_file"
  private[graft] val RowCol = "__graft_row"

  /** CoW delete of rows matching `cond`. None = no-op (nothing matched).
    * `dvMaxFraction` overrides the session's merge-on-read threshold for
    * THIS operation only (the safe alternative to set/unset on the
    * shared session conf — a concurrent job planning in the same
    * session never observes it). */
  def delete(spark: SparkSession, storage: Storage, snapshotId: Long, cond: Column,
      dvMaxFraction: Option[Double] = None,
      /** UPDATE's fusion hook (see [[deleteByKeysOn]]'s same param):
        * rewritten rows appended inside the delete's write pass. Not
        * written when nothing matched (an UPDATE matching zero rows is
        * a no-op and produces zero rewritten rows anyway). */
      extraAdds: Option[DataFrame] = None): Option[Patch] =
    deleteCore(spark, storage, snapshotId,
      candidates = ReadOp.plan(spark, storage, snapshotId, Some(cond)).files,
      markMatched = df => df.filter(cond),
      keepSurvivors = df => df.filter(!coalesce(cond, lit(false))),
      dvFracOverride = dvMaxFraction,
      extraAdds = extraAdds)

  /** CoW delete of rows whose primary key appears in `keys`. */
  def deleteByKeys(spark: SparkSession, storage: Storage, snapshotId: Long, keys: DataFrame): Option[Patch] =
    deleteByKeysOn(spark, storage, snapshotId, keys, storage.primaryKeys)

  /** CoW delete of rows matching `keys` on `keyCols` (top-level physical
    * columns, not necessarily this table's PK). This is the MV-refresh
    * generalization: an EXPAND transform (one source row → N view rows,
    * e.g. an inverted-index postings view) makes the view's PK a strict
    * superset of the source's, and a source-row delete must sweep EVERY
    * derived row — so the match runs on the source-PK columns that
    * survived the transform. With `keyCols == primaryKeys` this is
    * exactly [[deleteByKeys]]. */
  def deleteByKeysOn(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      keys: DataFrame,
      keyCols: Seq[String],
      /** [[deleteByKeysAndAppend]]'s fusion hook: rows appended INSIDE
        * the delete's write pass (plain layouts; None = classic). When
        * the sweep short-circuits (empty table / zero matches) the
        * adds are NOT written and the caller appends them itself. */
      extraAdds: Option[DataFrame] = None,
      /** Per-call merge-on-read threshold (see [[delete]]'s same
        * param) — view maintenance passes its state-sweep fraction so
        * refresh sweeps take vectors instead of CoW rewrites. */
      dvFracOverride: Option[Double] = None): Option[Patch] = {
    // an empty table can't match any key: skip the key-range job entirely
    // (first upsert into a fresh table — e.g. a streaming sink's batch 0)
    val manifests = storage.snapshotOrFail(snapshotId).manifestFiles.indexManifestFiles
    if (manifests.isEmpty) return None
    require(keyCols.nonEmpty, "deleteByKeysOn: empty key column list")
    keyCols.foreach(c => require(storage.schema.fieldNames.contains(c),
      s"deleteByKeysOn: key column $c is not in the table schema " +
        s"(${storage.schema.fieldNames.mkString(", ")})"))
    val k = keys.select(keyCols.map(col): _*).distinct()
    // SMALL-TABLE fast path (O(1) gate from the manifest-list
    // summaries): with only a handful of files there is nothing worth
    // pruning — the stats-prefilter construction (persist + probe
    // collect) and the planner's manifest-scan job cost MORE than
    // scanning every file. Candidates come off the driver-side
    // manifest read; everything downstream (exact semi/anti joins,
    // bitmaps, CDC) is identical. MV state sweeps hit this on every
    // refresh commit.
    val candidates = ManifestIO.summarizedFileCount(storage, manifests) match {
      case Some(n) if n <= DriverScanMaxFiles =>
        val fIdx = ManifestIO.manifestSchema(storage).fieldIndex(ManifestIO.FileCol)
        ManifestIO.readIndexManifestRowsDriver(storage,
          spark.sparkContext.hadoopConfiguration, manifests).map(_._2.getString(fIdx))
      case _ =>
        ReadOp.plan(spark, storage, snapshotId,
          keyLookupPredicate(spark, k, storage, keyCols)).files
    }
    deleteCore(spark, storage, snapshotId,
      candidates = candidates,
      markMatched = df => df.join(k, keyCols, "left_semi"),
      keepSurvivors = df => df.join(k, keyCols, "left_anti"),
      dvFracOverride = dvFracOverride,
      extraAdds = extraAdds)
  }

  /** A view state commit's delete+append as ONE maintenance call: the
    * key sweep's CoW survivor rewrite and the replacement rows land in
    * a single write pass (separate files via [[AppendOp
    * .writeSplitFiles]], so the changelog still tells carryover from
    * ADDs) — the two-pass commit was every refresh's residual cost
    * (VERDICT r14 next #3). Write-clustered tables fuse too — the
    * split write range-sorts both groups into tier shape (VERDICT r15
    * #2). Falls back to the classic two calls when the layout needs
    * the full append path (record fields, buckets) or when the sweep
    * matches nothing. Returns the patches to merge into one commit. */
  def deleteByKeysAndAppend(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      keys: DataFrame,
      keyCols: Seq[String],
      adds: DataFrame,
      /** Per-call merge-on-read threshold for the sweep leg (see
        * [[delete]]): a view refresh passes its state-sweep fraction,
        * so steady-state maintenance soft-deletes instead of CoW-
        * rewriting every touched state file. */
      dvFracOverride: Option[Double] = None): Seq[Patch] = {
    val fusible = storage.recordFields.isEmpty && storage.metadata.numBuckets == 0
    if (!fusible)
      return deleteByKeysOn(spark, storage, snapshotId, keys, keyCols,
        dvFracOverride = dvFracOverride).toSeq :+
        RecordIO.writeWithRecords(spark, storage, adds)
    deleteByKeysOn(spark, storage, snapshotId, keys, keyCols, Some(adds),
      dvFracOverride = dvFracOverride) match {
      case Some(p) => Seq(p) // adds written inside the fused pass
      case None => Seq(RecordIO.writeWithRecords(spark, storage, adds))
    }
  }

  /** Below this many FILES in a snapshot, metadata passes (candidate
    * listing, carryover, MoR row-count lookups) run on the driver via
    * [[ManifestIO.readIndexManifestRowsDriver]] instead of Spark jobs —
    * the job-scheduling overhead dominates at this size. */
  private[core] val DriverScanMaxFiles = 256L

  /** A point-shaped key lookup is one the planner can prune EXACTLY:
    * below this many key rows the prefilter is a per-column IN list
    * (falsifiable-IN manifest pruning + file-level parquet blooms both
    * engage) instead of a min/max box. The bound keeps driver-side
    * literals and bloom probes small; larger batches fall back to the
    * range box, which costs one aggregate regardless of size. */
  private[graft] val MaxPointLookupKeys = 1024

  /** Stats-driven pre-filter for key lookups over `cols` (default: the
    * primary keys — insert/upsert/merge all route here).
    *
    * Point form: when the lookup carries at most [[MaxPointLookupKeys]]
    * rows (a CDC delete batch, an upsert of a few keys, an MV sweep),
    * the predicate is the exact per-column IN list — on a clustered
    * layout the falsifiable-IN manifest form prunes to the touched
    * files, and on a layout DECORRELATED from the key the embedded
    * parquet blooms ([[BloomPruning]]) still drop every file that
    * cannot hold any key. The `limit(n+1)` probe short-circuits, so
    * large batches pay one cheap partial scan, never a shuffle.
    *
    * Range form (large batches): `pk BETWEEN min AND max` of the
    * incoming keys, per column, ANDed (the useful half of the
    * reference's range partitioning, ray/ops/join.py:148-176). With a
    * composite PK each column contributes its own range, so an upsert
    * keyed on (l_orderkey, l_linenumber) still prunes on BOTH; one tiny
    * agg job computes every min/max at once. */
  private[graft] def keyLookupPredicate(
      spark: SparkSession,
      keys: DataFrame,
      storage: Storage,
      cols: Seq[String]): Option[Column] = {
    val pks = cols.filter(pk => ManifestIO.statsEligible(storage.schema(pk).dataType))
    if (pks.isEmpty) return None
    // persist the PK projection across the point probe and the range
    // agg: for a large batch from an expensive keys plan, the probe
    // would otherwise evaluate (part of) the plan once and the min/max
    // agg a second time. Everything collected is literals, so the cache
    // is released before returning.
    val proj = keys.select(pks.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // collect-type probes with bounded output (≤1025 rows / one min-max
    // row): AQE's per-stage jobs are pure overhead — scoped off (the
    // CacheManager lives in SharedState, so the clone sees the persist)
    def noAqe[A](df: DataFrame)(body: DataFrame => A): A =
      org.apache.spark.sql.graftshim.ScopedConf.withScopedConf(df,
        Seq("spark.sql.adaptive.enabled" -> "false"))(body)
    try {
      val probe = noAqe(proj.limit(MaxPointLookupKeys + 1))(_.collect())
      if (probe.isEmpty) return None
      if (probe.length <= MaxPointLookupKeys) {
        // exact point form: every row matching the full composite key has
        // each column's value in that column's collected set, so the
        // per-column IN conjunction is a sound (superset) prefilter
        val preds = pks.indices.flatMap { i =>
          val vals = probe.map(_.get(i)).filter(_ != null).distinct.toSeq
          if (vals.isEmpty) None else Some(col(pks(i)).isInCollection(vals))
        }
        preds.reduceOption(_ && _)
      } else {
        val aggs = pks.flatMap(pk =>
          Seq(min(col(pk)).as(s"__lo_$pk"), max(col(pk)).as(s"__hi_$pk")))
        val row = noAqe(proj.agg(aggs.head, aggs.tail: _*))(_.collect())(0)
        val preds = pks.zipWithIndex.flatMap { case (pk, i) =>
          if (row.isNullAt(2 * i)) None
          else Some(col(pk) >= lit(row.get(2 * i)) && col(pk) <= lit(row.get(2 * i + 1)))
        }
        preds.reduceOption(_ && _)
      }
    } finally {
      proj.unpersist(blocking = false)
      ()
    }
  }

  /** Back-compat shim for the pre-point-form name. */
  private[graft] def keyRangePredicate(spark: SparkSession, keys: DataFrame, storage: Storage): Option[Column] =
    keyLookupPredicate(spark, keys, storage, storage.primaryKeys)

  /** Canonical identity of a data file for executor↔driver matching:
    * scheme + authority + path. `_metadata.file_path` renders a qualified
    * URI (`file:///…`) while manifest paths are table-root-relative (or
    * arbitrary absolute paths for zero-copy-ingested EXTERNAL files), so
    * comparing by anything less than the full normalized path can
    * collide — two external files legitimately share a basename. */
  private[graft] def pathKey(s: String): String = {
    val u = new Path(s).toUri
    val scheme = Option(u.getScheme).getOrElse("file")
    val auth = Option(u.getAuthority).getOrElse("")
    s"$scheme://$auth${u.getPath}"
  }

  /** Full-normalized-path → manifest-path map for a set of manifest
    * entries, keyed exactly like [[pathKey]] over `_metadata.file_path`.
    * The one idiom every scanned-file↔manifest-row join must use —
    * basenames are NOT unique once zero-copy-ingested external files
    * exist. */
  private[graft] def relByQualifiedKey(
      storage: Storage,
      conf: org.apache.hadoop.conf.Configuration,
      rels: Seq[String]): Map[String, String] =
    rels.map { rel =>
      val abs = new Path(storage.absolute(rel))
      pathKey(abs.getFileSystem(conf).makeQualified(abs).toString) -> rel
    }.toMap

  /** Per-file deletion bitmaps, built executor-side: group the matched
    * `(file, row)` pairs by file and fold row positions into a
    * RoaringBitmap inside the aggregation buffer. Exposed for the plan
    * spec: the physical plan must contain this aggregate and NO
    * `collect_list` of row positions. */
  private[graft] def matchedBitmaps(matched: DataFrame): DataFrame = {
    val agg = udaf(new RowBitmapAgg, Encoders.scalaLong)
    matched
      .groupBy(col(FileCol))
      .agg(agg(col(RowCol)).as("bitmap"))
  }

  private def deleteCore(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      candidates: Seq[String],
      markMatched: DataFrame => DataFrame,
      keepSurvivors: DataFrame => DataFrame,
      dvFracOverride: Option[Double] = None,
      extraAdds: Option[DataFrame] = None): Option[Patch] = {
    if (candidates.isEmpty) return None
    val physical = ReadOp.physicalSchema(storage.schema, storage.recordFields)
    val conf = spark.sparkContext.hadoopConfiguration
    val relByKey = relByQualifiedKey(storage, conf, candidates)
    val dvs = storage.deleteVectors(snapshotId)

    val raw = spark.read.schema(physical)
      .parquet(candidates.map(storage.absolute): _*)
      .withColumn(FileCol, col("_metadata.file_path"))
      .withColumn(RowCol, col("_metadata.row_index"))
    // rows already soft-deleted by an earlier merge-on-read commit are
    // not matchable — re-deleting them would double-log the CDC DELETE
    // (an aggregate view would subtract them twice)
    val candDvs = dvs.view.filterKeys(candidates.toSet).toMap
    val withPos = DeleteVectorOps.maskFilter(spark, storage, candDvs)
      .fold(raw)(raw.filter)

    // one (file, serializedBitmap) row per affected file — bitmaps are
    // built in executors; the driver never sees row positions.
    // On a driver-small candidate set (every MV state sweep and most
    // keyed DML), AQE is pure overhead for this COLLECT-type query: it
    // materializes each of the plan's exchanges (the key distinct, the
    // semi-join build, the bitmap partial) as its OWN sequential job
    // with a replan between — profiled at 5-7 jobs where the static
    // plan runs 1-2 — and there is no output write whose sizing AQE
    // could improve. Large candidate sets keep AQE (skew handling on
    // the semi-join matters there).
    val bitmapQuery = matchedBitmaps(markMatched(withPos))
    val matchedRows =
      if (candidates.size <= DriverScanMaxFiles)
        org.apache.spark.sql.graftshim.ScopedConf.withScopedConf(bitmapQuery,
          Seq("spark.sql.adaptive.enabled" -> "false"))(_.collect())
      else bitmapQuery.collect()
    if (matchedRows.isEmpty) return None

    val deletedByFile: Map[String, RoaringBitmap] = matchedRows.map { r =>
      val bm = deserializeBitmapBytes(r.getAs[Array[Byte]](1))
      relByKey(pathKey(r.getString(0))) -> bm
    }.toMap
    val affectedRel = deletedByFile.keySet

    // ---- merge-on-read split: a file whose CUMULATIVE dead fraction
    // (existing vector + this delete) stays at or below the threshold
    // (and that keeps at least one live row) takes a delete VECTOR
    // instead of a rewrite; fully-dead files and debt-heavy files take
    // the copy-on-write leg. The cumulative form is what bounds
    // steady-state read debt (VERDICT r11 #1): under repeated small
    // deletes a file's vector can never grow past dvMaxFraction of its
    // physical rows — the delete that would cross the line flips the
    // file to CoW, folding its vector — where the per-delete form let
    // debt accumulate without bound. Pure-CoW tables with the conf at 0
    // skip the per-file row-count lookup entirely.
    val dvFrac = dvFracOverride match {
      case Some(v) =>
        require(java.lang.Double.isFinite(v) && v >= 0 && v <= 1,
          s"dvMaxFraction override must be a number in [0, 1], got $v")
        v
      case None => DeleteVectorOps.dvMaxFraction(spark)
    }
    val needSplit = dvFrac > 0
    val physRows: Map[String, Long] =
      if (needSplit) fileNumRows(spark, storage, snapshotId, affectedRel) else Map.empty
    val (morFiles, cowFiles) =
      if (!needSplit) (Set.empty[String], affectedRel)
      else affectedRel.partition { f =>
        val phys = physRows(f)
        val existing = dvs.get(f).map(_.numRows).getOrElse(0L)
        val newDead = deletedByFile(f).getLongCardinality
        existing + newDead < phys && (existing + newDead).toDouble / phys <= dvFrac
      }

    // ---- merge-on-read leg: no data IO — merge each file's new dead
    // rows into its (possibly absent) existing vector
    val dvAdded: Map[String, RowBitmap] = morFiles.iterator.map { f =>
      val merged = dvs.get(f).flatMap(_.bitmapB64) match {
        case Some(b64) =>
          val bm = deserializeBitmap(b64); bm.or(deletedByFile(f)); bm
        case None => deletedByFile(f)
      }
      f -> RowBitmap(f, allRows = false, numRows = merged.getLongCardinality,
        bitmapB64 = Some(bitmapToB64(merged)))
    }.toMap
    val dvObserved: Map[String, Option[String]] =
      morFiles.iterator.map(f => f -> dvs.get(f).flatMap(_.bitmapB64)).toMap
    val morDead = morFiles.iterator.map(f => deletedByFile(f).getLongCardinality).sum

    // ---- copy-on-write leg: rewrite ONLY the CoW files; survivors keep
    // record addresses as-is (record_address_input=True analog,
    // delete.py:103). An existing vector on a rewritten file FOLDS in:
    // the survivor scan masks its dead rows, the entry retires, and the
    // fold compensates the stats (those rows were already subtracted).
    val emptyCo = CarryoverResult(Nil, Nil, StorageStatistics(), Map.empty)
    val (appendPatch, addBitmaps, co, dvRemoved, foldComp) =
      if (cowFiles.isEmpty) extraAdds match {
        case Some(adds) =>
          // pure-MoR sweep (no survivor rewrite to fuse into): the adds
          // still ride THIS commit — one write (cluster-shaped when the
          // table declares write_cluster_by), bitmaps collected for the
          // merged changelog below
          val ar = AppendOp.writeFilesWithMeta(spark, storage, adds,
            writeClustered = true)
          (ar.patch, ar.files.map(m =>
            RowBitmap(m.file, allRows = true, numRows = m.numRows)).toList,
            emptyCo, Nil, StorageStatistics())
        case None =>
          (Patch(), Nil, emptyCo, Nil, StorageStatistics())
      }
      else {
        val affectedDF = spark.read.schema(physical)
          .parquet(cowFiles.toSeq.map(storage.absolute): _*)
        val (maskedDF, removedDvs, comp) = DeleteVectorOps.foldIntoScan(
          spark, storage, snapshotId, cowFiles, affectedDF)
        val survivors = keepSurvivors(maskedDF)
        val carry = manifestCarryover(spark, storage, snapshotId, cowFiles)
        extraAdds match {
          case Some(adds) =>
            // FUSED: survivors and adds in one write pass, separate
            // files — the add files become ADD bitmaps, the survivor
            // files stay CDC-silent carryover (deleteByKeysAndAppend)
            val (p, addMetas) = AppendOp.writeSplitFiles(spark, storage, survivors, adds)
            (p, addMetas.map(m =>
              RowBitmap(m.file, allRows = true, numRows = m.numRows)).toList,
              carry, removedDvs, comp)
          case None =>
            val ap = AppendOp.writeFiles(spark, storage, survivors)
            (ap, Nil, carry, removedDvs, comp)
        }
      }

    // physical row counts for allRows detection: the carryover pass
    // covers the CoW files; the split pass covers everything when MoR
    // was in play (a MoR file is never allRows — it keeps live rows)
    val fileRows = co.affectedFileRows ++ physRows

    val deleteLog = ChangeLog(deletedRows = deletedByFile.toList.sortBy(_._1).map {
      case (file, bm) =>
        val n = bm.getLongCardinality
        // n == physical rows is only possible when the file had no
        // existing vector (masked rows are unmatchable), so allRows
        // stays exact under merge-on-read
        val all = fileRows.get(file).contains(n)
        RowBitmap(file, allRows = all, numRows = n,
          bitmapB64 = if (all) None else Some(bitmapToB64(bm)))
    }, addedRows = addBitmaps)

    Some(Patch(
      addedIndexManifests = appendPatch.addedIndexManifests ++ co.carryoverManifests,
      removedIndexManifests = co.removedManifests,
      statsDelta = appendPatch.statsDelta + co.removedStats + foldComp +
        StorageStatistics(numRows = -morDead),
      changeLog = Some(deleteLog),
      manifestSummaries = appendPatch.manifestSummaries ++ co.summaries,
      dvAdded = dvAdded,
      dvObserved = dvObserved,
      dvRemoved = dvRemoved))
  }

  /** Above this many members a file-set filter becomes a broadcast
    * semi/anti join instead of an IN literal list: a broad delete
    * touching tens of thousands of files would otherwise build a huge
    * expression tree on the manifest-scan paths (ADVICE r11). */
  private[core] val MaxFileSetLiterals = 1000

  /** `df` restricted to (keep = true) or stripped of (keep = false) the
    * rows whose `c` is in `files` — IN list below [[MaxFileSetLiterals]],
    * broadcast left_semi/left_anti join above it. Public: every
    * manifest-scan path that restricts to a file set (incl. the shim's
    * metadata tables and compaction's vector-debt selection) routes
    * through here so no caller rebuilds the unbounded-IN hazard. */
  def filterFileSet(
      spark: SparkSession,
      df: DataFrame,
      c: String,
      files: Set[String],
      keep: Boolean): DataFrame =
    if (files.size <= MaxFileSetLiterals) {
      val in = col(c).isin(files.toSeq: _*)
      df.filter(if (keep) in else !in)
    } else {
      import spark.implicits._
      val fdf = broadcast(files.toSeq.toDF(c))
      df.join(fdf, Seq(c), if (keep) "left_semi" else "left_anti")
    }

  /** Physical row count per file (manifest projection) for a specific
    * file set — the merge-on-read split needs counts BEFORE deciding
    * which files the carryover pass will cover. */
  private def fileNumRows(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      files: Set[String]): Map[String, Long] = {
    val manifests = storage.snapshotOrFail(snapshotId).manifestFiles.indexManifestFiles
    ManifestIO.summarizedFileCount(storage, manifests) match {
      case Some(n) if n <= DriverScanMaxFiles =>
        // small-table fast path: counts off the driver-read manifests
        val schema = ManifestIO.manifestSchema(storage)
        val fIdx = schema.fieldIndex(ManifestIO.FileCol)
        val nIdx = schema.fieldIndex(ManifestIO.NumRowsCol)
        return ManifestIO.readIndexManifestRowsDriver(storage,
            spark.sparkContext.hadoopConfiguration, manifests)
          .collect { case (_, r) if files.contains(r.getString(fIdx)) =>
            r.getString(fIdx) -> r.getLong(nIdx) }.toMap
      case _ =>
    }
    filterFileSet(spark,
      ManifestIO.readIndexManifests(spark, storage, manifests),
      ManifestIO.FileCol, files, keep = true)
      .select(col(ManifestIO.FileCol), col(ManifestIO.NumRowsCol))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  final case class CarryoverResult(
      removedManifests: List[String],
      carryoverManifests: List[String],
      removedStats: StorageStatistics,
      affectedFileRows: Map[String, Long],
      summaries: Map[String, ManifestSummary] = Map.empty)

  /** Driver-side [[manifestCarryover]] for small tables: identical
    * outputs, zero Spark jobs — pure set arithmetic over the driver-
    * read manifest rows. */
  private def manifestCarryoverDriver(
      spark: SparkSession,
      storage: Storage,
      manifests: Seq[String],
      affectedRel: Set[String]): CarryoverResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    val schema = ManifestIO.manifestSchema(storage)
    val fIdx = schema.fieldIndex(ManifestIO.FileCol)
    val nIdx = schema.fieldIndex(ManifestIO.NumRowsCol)
    val cIdx = schema.fieldIndex(ManifestIO.CompressedCol)
    val uIdx = schema.fieldIndex(ManifestIO.UncompressedCol)
    val rows = ManifestIO.readIndexManifestRowsDriver(storage, conf, manifests)
    val affected = rows.filter { case (_, r) => affectedRel.contains(r.getString(fIdx)) }
    val affectedManifests = affected.map(_._1).toSet
    val removedManifests = manifests.filter(affectedManifests.contains).toList
    val carryRows = rows.collect {
      case (m, r) if affectedManifests.contains(m) &&
        !affectedRel.contains(r.getString(fIdx)) => r
    }
    val (carryoverManifest, summaries) =
      if (carryRows.isEmpty) (Nil, Map.empty[String, ManifestSummary])
      else {
        val rel = StoragePaths.newIndexManifestFile()
        DriverParquet.write(conf, storage.absolute(rel), schema, carryRows)
        (List(rel), Map(rel -> ManifestIO.summarizeRows(storage, schema, carryRows)))
      }
    val removed = StorageStatistics(
      numRows = -affected.map(_._2.getLong(nIdx)).sum,
      indexCompressedBytes = -affected.map(_._2.getLong(cIdx)).sum,
      indexUncompressedBytes = -affected.map(_._2.getLong(uIdx)).sum)
    CarryoverResult(removedManifests, carryoverManifest, removed,
      affected.map { case (_, r) => r.getString(fIdx) -> r.getLong(nIdx) }.toMap,
      summaries)
  }

  /** Above this many surviving rows the carryover manifest is written by
    * a distributed job instead of a driver collect (the same cutover
    * shape as AppendOp's footer harvest): collecting is fine at
    * thousands of files but is the first thing to break past ~10⁶. */
  private[core] val CarryoverDriverMaxRows = 50000

  /** Manifest carryover for a CoW rewrite of `affectedRel` files: drop
    * the manifests that list them and re-emit their UNTOUCHED rows as
    * carryover manifest(s) (delete.py:144-150). Also returns the
    * negative stats delta of the affected files and their per-file row
    * counts. Shared by delete and compaction. Small carryovers (≤
    * `driverMaxRows`, the overwhelmingly common case) write driver-side
    * without a Spark job; larger ones write distributed, one manifest
    * per task output. */
  private[core] def manifestCarryover(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      affectedRel: Set[String],
      driverMaxRows: Int = CarryoverDriverMaxRows): CarryoverResult = {
    val manifests = storage.snapshotOrFail(snapshotId).manifestFiles.indexManifestFiles
    // SMALL-TABLE fast path: the whole carryover is set arithmetic over
    // a few manifest rows — do it on the driver (zero Spark jobs; the
    // Spark path below launches two) when the O(1) summary gate allows
    ManifestIO.summarizedFileCount(storage, manifests) match {
      case Some(n) if n <= DriverScanMaxFiles =>
        return manifestCarryoverDriver(spark, storage, manifests, affectedRel)
      case _ =>
    }
    val mdf = ManifestIO.readIndexManifests(spark, storage, manifests)
      .withColumn("__mfile", element_at(split(col("_metadata.file_path"), "/"), -1))
    val manifestRelByName = manifests.map(m => new Path(m).getName -> m).toMap
    // ONE job over the affected rows yields the touched manifests, the
    // negative stats delta, and the per-file row counts (previously
    // three jobs; file-set filters join instead of IN past the literal
    // bound — ADVICE r11)
    val affectedRows = filterFileSet(spark, mdf, ManifestIO.FileCol, affectedRel, keep = true)
      .select(col("__mfile"), col(ManifestIO.FileCol), col(ManifestIO.NumRowsCol),
        col(ManifestIO.CompressedCol), col(ManifestIO.UncompressedCol))
      .collect()
    val affectedManifestNames = affectedRows.map(_.getString(0)).distinct.toSeq
    val removedManifests = affectedManifestNames.map(manifestRelByName).toList

    val carryover = filterFileSet(spark,
      filterFileSet(spark, mdf, "__mfile", affectedManifestNames.toSet, keep = true),
      ManifestIO.FileCol, affectedRel, keep = false)
      .drop("__mfile")
    // probe one past the cutover: a short collect decides the path
    // without a separate count job
    val head = carryover.limit(driverMaxRows + 1).collect().toSeq
    val conf = spark.sparkContext.hadoopConfiguration
    val (carryoverManifest, summaries) =
      if (head.isEmpty) (Nil, Map.empty[String, ManifestSummary])
      else if (head.size <= driverMaxRows) {
        val rel = StoragePaths.newIndexManifestFile()
        DriverParquet.write(conf, storage.absolute(rel), carryover.schema, head)
        (List(rel),
          Map(rel -> ManifestIO.summarizeRows(storage, carryover.schema, head)))
      } else {
        val pairs = writeCarryoverDistributed(spark, storage, carryover)
        (pairs.map(_._1), pairs.toMap)
      }

    // negative stats of the removed files (delete.py's stats delta) and
    // per-file numRows for allRows detection — both from the one
    // collected affected-row pass above
    val removed = StorageStatistics(
      numRows = -affectedRows.map(_.getLong(2)).sum,
      indexCompressedBytes = -affectedRows.map(_.getLong(3)).sum,
      indexUncompressedBytes = -affectedRows.map(_.getLong(4)).sum)
    val fileRows: Map[String, Long] =
      affectedRows.map(r => r.getString(1) -> r.getLong(2)).toMap

    CarryoverResult(removedManifests, carryoverManifest, removed, fileRows, summaries)
  }

  /** Distributed carryover write: executors write the surviving manifest
    * rows as parquet; the driver renames each non-empty part file into a
    * manifest name and returns it WITH its manifest-list summary.
    * Driver work is O(part files), never O(rows) — and one footer read
    * per part: the summary's `numFiles` IS the part's row count, so the
    * 0-row skip and the summary share the same open. */
  private[core] def writeCarryoverDistributed(
      spark: SparkSession,
      storage: Storage,
      carryover: DataFrame): List[(String, ManifestSummary)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpRel = s"${StoragePaths.MetadataDir}/tmp_carry_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val tmpAbs = storage.absolute(tmpRel)
    carryover.write.mode("overwrite")
      // tmp-dir write consumed and deleted by this call: no _SUCCESS,
      // single-pass committer (see AppendOp.bloomWriter)
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .parquet(tmpAbs)
    val fs = new Path(tmpAbs).getFileSystem(conf)
    val parts = fs.listStatus(new Path(tmpAbs)).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val rels = parts.toList.flatMap { p =>
      // a task whose partition lost every row still writes a 0-row part;
      // it never becomes a manifest
      val summary = ManifestIO.summarizeManifestFile(storage, p.toString, conf)
      if (summary.numFiles == 0L) None
      else {
        val rel = StoragePaths.newIndexManifestFile()
        if (!fs.rename(p, new Path(storage.absolute(rel))))
          throw new java.io.IOException(s"rename $p failed")
        Some(rel -> summary)
      }
    }
    fs.delete(new Path(tmpAbs), true)
    rels
  }

  /** Atomic whole-table overwrite (SQL `INSERT OVERWRITE` = truncate +
    * append in ONE snapshot): drop every index/record manifest of the
    * pinned snapshot, negate its statistics, log every current row as
    * deleted (`allRows` per file — no bitmap bytes), and append the new
    * data. Single commit, so readers never observe an empty table and
    * CDC sees one DELETE(all)+ADD(new) snapshot (the reference's
    * DELETE+ADD encoding, change_data.py:42-44, at whole-table scope).
    * Old files stay on disk for time travel until GC, like any CoW
    * rewrite. */
  def overwriteAll(spark: SparkSession, storage: Storage, snapshotId: Long, df: DataFrame): Patch = {
    val snap = storage.snapshotOrFail(snapshotId)
    val appendPatch = RecordIO.writeWithRecords(spark, storage, df)
    val manifests = snap.manifestFiles.indexManifestFiles
    // no early return on empty index manifests: a prior full delete can
    // leave the snapshot with ZERO index manifests but dangling record
    // manifests and positive record-byte statistics (CoW delete only
    // rewrites the index side) — the overwrite must still drop those and
    // negate the stats, or phantom record files stay referenced forever
    val fileRows =
      if (manifests.isEmpty) Array.empty[(String, Long)]
      else ManifestIO.readIndexManifests(spark, storage, manifests)
        .select(col(ManifestIO.FileCol), col(ManifestIO.NumRowsCol))
        .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val s = snap.storageStatistics
    // merge-on-read: a vector-carrying file's DELETE rowset is its LIVE
    // rows (the complement of the vector) — logging allRows would
    // re-delete rows an earlier MoR commit already logged, and an
    // aggregate view would subtract them twice. Every vector entry
    // retires with the overwrite.
    val dvs = storage.deleteVectors(snapshotId)
    val removePatch = Patch(
      removedIndexManifests = manifests,
      removedRecordManifests = snap.manifestFiles.recordManifestFiles,
      statsDelta = StorageStatistics(-s.numRows, -s.indexCompressedBytes,
        -s.indexUncompressedBytes, -s.recordUncompressedBytes),
      changeLog =
        if (fileRows.isEmpty) None
        else Some(ChangeLog(deletedRows = fileRows.toList.map { case (f, n) =>
          dvs.get(f).flatMap(_.bitmapB64) match {
            case Some(b64) =>
              val live = RoaringBitmap.flip(deserializeBitmap(b64), 0L, n)
              RowBitmap(f, allRows = false, numRows = live.getLongCardinality,
                bitmapB64 = Some(bitmapToB64(live)))
            case None => RowBitmap(f, allRows = true, numRows = n)
          }
        })),
      dvRemoved = dvs.keys.toList.sorted)
    Patch.merge(Seq(removePatch, appendPatch)).get
  }

  /** Append with duplicate-primary-key rejection against the current
    * snapshot AND within the input (insert.py:60-104, filter_matched
    * :119-134 — as a distributed semi-join instead of OR-chains). The
    * dup-check scan is pre-pruned to files overlapping the input's key
    * range (the same stats prefilter deleteByKeys uses), so inserting a
    * narrow key range never scans the whole table. */
  def insert(spark: SparkSession, storage: Storage, snapshotId: Long, df: DataFrame): Patch = {
    val pks = storage.primaryKeys
    // pinned: the dup checks and the write each evaluate the input — a
    // nondeterministic source re-evaluated after passing the checks
    // could write keys the checks never saw
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      failOnInternalDupes(pinned, pks)
      val keys = pinned.select(pks.map(col): _*)
      val rangePred = keyRangePredicate(spark, keys, storage)
      val existing = ReadOp.scanPhysical(spark, storage, snapshotId, rangePred)
        .select(pks.map(col): _*)
      val dupes = existing.join(keys, pks, "left_semi").limit(1).count()
      require(dupes == 0, s"insert: input contains existing primary keys")
      RecordIO.writeWithRecords(spark, storage, pinned)
    } finally { pinned.unpersist(); () }
  }

  /** Delete-matching-PKs + append, one snapshot; DELETE+ADD of the same
    * key in one snapshot is the UPDATE encoding (change_data.py:42-44).
    * The input is PINNED (like [[merge]]/overwriteWhere): the delete leg
    * and the append leg each evaluate it, and a nondeterministic source
    * re-evaluated between them could delete keys it never re-appends. */
  def upsert(spark: SparkSession, storage: Storage, snapshotId: Long, df: DataFrame): Patch = {
    val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      failOnInternalDupes(pinned, storage.primaryKeys)
      // fused: the matched-key CoW sweep and the incoming rows land in
      // one write pass (plain layouts; see deleteByKeysAndAppend)
      Patch.merge(deleteByKeysAndAppend(spark, storage, snapshotId,
        pinned, storage.primaryKeys, pinned)).get
    } finally { pinned.unpersist(); () }
  }

  /** MERGE semantics on a PK-keyed table, ONE snapshot (the general form
    * of upsert; the reference ships upsert only, insert.py:93-99 — merge
    * composes the same CoW delete + append machinery):
    *
    *   - matched source rows (PK exists in target) satisfying
    *     `matchedDeleteCond` delete the target row;
    *   - other matched rows, when `matchedUpdate`, REPLACE the target row
    *     (the DELETE+ADD encoding, change_data.py:42-44) — when
    *     `matchedUpdate` is false they leave the target untouched;
    *   - unmatched source rows, when `insertNew`, append;
    *   - TARGET rows with no matching source row ("NOT MATCHED BY
    *     SOURCE", the sync-two-tables shape): when
    *     `notMatchedBySourceDelete` is set, rows satisfying it delete;
    *     when `notMatchedBySourceUpdate` is set, remaining unmatched
    *     rows satisfying its condition are rewritten with the
    *     assignments applied (every RHS sees the PRE-update row —
    *     same staging rule as row-level UPDATE). Assignments address
    *     top-level non-key columns. These two legs necessarily scan the
    *     WHOLE target (a row outside the source's key range is by
    *     definition unmatched), so only merges that use them pay a full
    *     anti-join pass; the matched legs keep the pruned scan.
    *
    * The target-side match scan is pre-pruned to the source's key range
    * (same stats prefilter as insert/deleteByKeys), so merging a narrow
    * key range never scans the whole table; matching is one distributed
    * semi/anti join pair. All delete legs combine into ONE CoW pass and
    * all appends into ONE write, so each data file is rewritten at most
    * once per MERGE. */
  def merge(
      spark: SparkSession,
      storage: Storage,
      snapshotId: Long,
      source: DataFrame,
      matchedUpdate: Boolean,
      matchedDeleteCond: Option[Column],
      insertNew: Boolean,
      notMatchedBySourceDelete: Option[Column] = None,
      notMatchedBySourceUpdate: Option[(Column, Seq[(String, Column)])] = None): Option[Patch] = {
    val pks = storage.primaryKeys
    failOnInternalDupes(source, pks)
    // every merge condition/assignment is evaluated MORE THAN ONCE over
    // the same rows (a matched delete cond filters the delete leg and,
    // negated, the re-append leg; the NMBS cond/assignments derive both
    // the delete-key union and the rewritten rows) — a nondeterministic
    // expression (rand()) would delete keys one evaluation saw and
    // re-append rows another saw, silently losing or duplicating rows.
    // Spark's analyzer guards the SQL MERGE path; mirror it here
    // (same rule as AggregateView.create's filter check — ADVICE r11).
    def requireDeterministic(frame: DataFrame, c: Column, what: String): Unit =
      require(frame.select(c).queryExecution.analyzed.deterministic,
        s"merge: $what must be deterministic — it is evaluated more than once")
    val src = source.persist()
    try {
      val keys = src.select(pks.map(col): _*)
      val rangePred = keyRangePredicate(spark, keys, storage)
      val targetKeys = ReadOp.scanPhysical(spark, storage, snapshotId, rangePred)
        .select(pks.map(col): _*)
      val matched = src.join(targetKeys, pks, "left_semi")
      matchedDeleteCond.foreach(c =>
        requireDeterministic(matched, c, "the WHEN MATCHED delete condition"))
      val delCond = matchedDeleteCond.getOrElse(lit(false))
      val toDelete = (matchedDeleteCond, matchedUpdate) match {
        case (None, false) => None // no matched clause: matched rows untouched
        case (None, true) => Some(matched)
        case (Some(_), false) => Some(matched.filter(delCond))
        case (Some(_), true) => Some(matched) // updates also delete-then-add
      }

      // ---- NOT MATCHED BY SOURCE legs (full-target anti-join; rows are
      // read at the pinned snapshot, logical shape — record payloads
      // stitched so the rewritten rows re-append uniformly)
      val nmbsNeeded = notMatchedBySourceDelete.isDefined || notMatchedBySourceUpdate.isDefined
      val notMatched: Option[DataFrame] =
        if (!nmbsNeeded) None
        else {
          val full = ReadOp.scanPhysical(spark, storage, snapshotId, None)
          val stitched =
            if (storage.recordFields.isEmpty) full
            else RecordIO.stitch(spark, storage, full, None)
          Some(stitched.join(keys, pks, "left_anti"))
        }
      notMatchedBySourceDelete.foreach(c => requireDeterministic(notMatched.get, c,
        "the NOT MATCHED BY SOURCE delete condition"))
      notMatchedBySourceUpdate.foreach { case (c, assigns) =>
        requireDeterministic(notMatched.get, c,
          "the NOT MATCHED BY SOURCE update condition")
        assigns.foreach { case (k, v) => requireDeterministic(notMatched.get, v,
          s"the NOT MATCHED BY SOURCE assignment to $k") }
      }
      val nmbsDelVictims = notMatchedBySourceDelete.map(c => notMatched.get.filter(c))
      val nmbsUpdVictims = notMatchedBySourceUpdate.map { case (cond, _) =>
        // a row claimed by the DELETE clause never reaches UPDATE
        val base = notMatchedBySourceDelete.fold(notMatched.get)(dc =>
          notMatched.get.filter(!coalesce(dc, lit(false))))
        base.filter(cond)
      }
      val nmbsUpdatedRows = notMatchedBySourceUpdate.map { case (_, assigns) =>
        // stage every RHS first so later assignments read PRE-update values
        val tmp = assigns.zipWithIndex.map { case ((k, v), i) => (k, v, s"__graft_set_$i") }
        val staged = tmp.foldLeft(nmbsUpdVictims.get) { case (df, (_, v, t)) => df.withColumn(t, v) }
        val applied = tmp.foldLeft(staged) { case (df, (k, _, t)) => df.withColumn(k, col(t)) }
        applied.drop(tmp.map(_._3): _*)
      }

      // ONE CoW delete pass over the union of every leg's victim keys
      val deleteKeyFrames =
        toDelete.map(_.select(pks.map(col): _*)).toSeq ++
          nmbsDelVictims.map(_.select(pks.map(col): _*)).toSeq ++
          nmbsUpdVictims.map(_.select(pks.map(col): _*)).toSeq
      val deleteKeys = deleteKeyFrames.reduceOption(_.unionByName(_))

      val toAppend =
        (if (matchedUpdate) Seq(matched.filter(!coalesce(delCond, lit(false)))) else Nil) ++
          (if (insertNew) Seq(src.join(targetKeys, pks, "left_anti")) else Nil) ++
          nmbsUpdatedRows.toSeq
      val appendRows = toAppend.reduceOption(_.unionByName(_)).filter(!_.isEmpty)
      // fused: the one CoW pass and the one append share a write job
      (deleteKeys, appendRows) match {
        case (Some(k), Some(a)) =>
          Patch.merge(deleteByKeysAndAppend(spark, storage, snapshotId, k, pks, a))
        case (Some(k), None) => deleteByKeys(spark, storage, snapshotId, k)
        case (None, Some(a)) => Some(RecordIO.writeWithRecords(spark, storage, a))
        case (None, None) => None
      }
    } finally {
      src.unpersist()
      ()
    }
  }

  private def failOnInternalDupes(df: DataFrame, pks: Seq[String]): Unit = {
    val d = df.groupBy(pks.map(col): _*).count().filter(col("count") > 1).limit(1).count()
    require(d == 0, "input contains duplicate primary keys")
  }

  def serializeBitmap(rows: Seq[Long]): String = {
    val bm = new RoaringBitmap()
    rows.foreach { r =>
      // same wrap hazard as RowBitmapAgg.reduce: a silent toInt past 2^31
      // would mark the wrong rows deleted with no downstream error
      require(r >= 0 && r <= Int.MaxValue,
        s"row position $r exceeds the 2^31-1 per-file bitmap range; " +
          "split the file (writer batch-size options) before row-level ops")
      bm.add(r.toInt)
    }
    bitmapToB64(bm)
  }

  def bitmapToB64(bm: RoaringBitmap): String =
    Base64.getEncoder.encodeToString(bitmapBytes(bm))

  def bitmapBytes(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val buf = java.nio.ByteBuffer.allocate(bm.serializedSizeInBytes())
    bm.serialize(buf)
    buf.array()
  }

  def deserializeBitmapBytes(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(java.nio.ByteBuffer.wrap(bytes))
    bm
  }

  def deserializeBitmap(b64: String): RoaringBitmap =
    deserializeBitmapBytes(Base64.getDecoder.decode(b64))
}

/** Folds per-file row positions into a RoaringBitmap executor-side
  * (delete.py:215-228's bitmap, built where the rows are). The buffer
  * rides shuffles via Java serialization (RoaringBitmap is
  * Externalizable); partial aggregation means each map task ships at most
  * one small bitmap per file, not its row ids. */
private[graft] class RowBitmapAgg extends Aggregator[Long, RoaringBitmap, Array[Byte]] {
  override def zero: RoaringBitmap = new RoaringBitmap()
  override def reduce(b: RoaringBitmap, row: Long): RoaringBitmap = {
    // row positions are per-FILE indexes; the writer caps files far below
    // 2^31 rows, but a future big-file config must fail loudly here — a
    // silent toInt wrap would corrupt the delete bitmap (drop/hit the
    // wrong rows) with no error anywhere downstream.
    require(row >= 0 && row <= Int.MaxValue,
      s"row position $row exceeds the 2^31-1 per-file bitmap range; " +
        "split the file (writer batch-size options) before row-level ops")
    b.add(row.toInt); b
  }
  override def merge(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = { a.or(b); a }
  override def finish(b: RoaringBitmap): Array[Byte] = DmlOps.bitmapBytes(b)
  override def bufferEncoder: Encoder[RoaringBitmap] = Encoders.javaSerialization[RoaringBitmap]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
