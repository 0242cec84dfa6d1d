package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.format._

/** Distributed append (reference `LocalAppendOp`/`RayAppendOp`,
  * `/root/reference/python/src/space/core/ops/append.py:69-298` and
  * `/root/reference/python/src/space/ray/ops/append.py:32-120`).
  *
  * Spark-first shape: the input DataFrame is written by executors with a
  * plain `df.write.parquet` (one file per task — Spark tasks play the
  * reference's writer-actor role), then the DRIVER harvests only the
  * footers for row counts + PK min/max stats, moves the files into
  * `data/`, and emits one manifest + a Patch. No row ever passes through
  * the driver; footer IO is O(files), not O(rows).
  *
  * The reference caps index files at 1 MiB uncompressed
  * (options.py:66-67) — pathological at 100 TB; we instead inherit
  * Spark's task partitioning (≈128 MB splits) and expose an optional
  * `targetFileRows` repartition knob (SURVEY.md §7.3 "small-file
  * defaults").
  */
object AppendOp {

  final case class AppendResult(patch: Patch, files: Seq[IndexFileMeta])

  /** Synthetic per-column bucket-id column names for the dynamic-
    * partition write of a [[graft.format.StorageMetadata.bucketCounts]]
    * layout. */
  private[core] def bucketDirNames(m: Int): Seq[String] =
    (0 until m).map(i => s"__graft_b$i")
  private[core] def bucketDirCols(m: Int): Seq[org.apache.spark.sql.Column] =
    bucketDirNames(m).map(org.apache.spark.sql.functions.col)

  /** `pmod(murmur3(cᵢ, seed 42), nᵢ)` per bucket column — the exact
    * per-column hash [[BucketPruning.bucketId]] probes and the `bucket`
    * V2 function computes for one column. Float/double inputs collapse
    * -0.0 onto +0.0 first (x + 0.0 is the identity everywhere else,
    * incl. NaN/∞), matching the normalization `df.repartition` keys get
    * in the single-hash layout. `columns`/`counts` default to the
    * table's — rebucket passes its NEW layout. */
  private[core] def perColumnBucketExprs(
      storage: Storage,
      columns: Seq[String] = Nil,
      counts: Seq[Int] = Nil): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val effectiveCols = if (columns.nonEmpty) columns else storage.metadata.bucketColumns.toSeq
    val effective = if (counts.nonEmpty) counts else storage.metadata.bucketCounts
    effectiveCols.zip(effective)
      .zipWithIndex.map { case ((c, n), i) =>
        val base = storage.schema(c).dataType match {
          case org.apache.spark.sql.types.FloatType => col(c) + lit(0.0f)
          case org.apache.spark.sql.types.DoubleType => col(c) + lit(0.0d)
          case _ => col(c)
        }
        pmod(hash(base), lit(n)).as(s"__graft_b$i")
      }
  }

  /** Row-major flat id of a dynamic-partition output file's directory
    * tuple (`.../__graft_b0=X/__graft_b1=Y/part-…`). */
  private[core] def flatBucketOfDir(p: Path, counts: Seq[Int]): Int = {
    val byName = Iterator.iterate(p.getParent)(_.getParent)
      .takeWhile(_ != null)
      .map(_.getName)
      .filter(_.startsWith("__graft_b"))
      .map { seg =>
        val Array(k, v) = seg.split("=", 2)
        k.stripPrefix("__graft_b").toInt -> v.toInt
      }.toMap
    require(byName.size == counts.size,
      s"malformed bucket directory layout at $p (want ${counts.size} levels)")
    counts.indices.foldLeft(0) { (acc, i) => acc * counts(i) + byName(i) }
  }

  /** Inverse of [[flatBucketOfDir]]: the per-column tuple of a flat id
    * (public: the shim-side bucketed batch decodes partition keys). */
  def tupleOfFlat(flat: Int, counts: Seq[Int]): Seq[Int] = {
    var rem = flat
    val out = new Array[Int](counts.size)
    var i = counts.size - 1
    while (i >= 0) { out(i) = rem % counts(i); rem /= counts(i); i -= 1 }
    out.toSeq
  }

  /** Align `df` to the table's physical index schema: schema order,
    * field-id metadata re-attached so Spark embeds `parquet.field.id`
    * in the written footers (schema-evolution-by-id). Type alignment:
    * a column whose frame type differs from the table's UPCASTS in
    * place (int frame into a widened bigint table — files then always
    * match the declared schema); a frame WIDER than the table refuses
    * loudly — writing it would commit files the declared schema cannot
    * read back (the row-wise-MV-after-source-widen shape: widen the
    * target table's column first, then retry). */
  private[core] def alignToSchema(storage: Storage, df: DataFrame): DataFrame = {
    val idSchema = ReadOp.physicalSchemaWithIds(storage.schema, storage.recordFields)
    val inTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // catalogString compare: metadata- and nullability-insensitive, so
    // the type-matched fast path is exactly the old raw projection.
    // Beyond Catalyst's canUpCast, a small-precision decimal widens
    // losslessly into double (a double holds 15 significant digits
    // exactly) — the shape SQL UPDATE literals arrive in (0.5 parses as
    // decimal(1,1) against a double column).
    def safeCast(from: org.apache.spark.sql.types.DataType,
        to: org.apache.spark.sql.types.DataType): Boolean =
      org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to) ||
        ((from, to) match {
          case (d: org.apache.spark.sql.types.DecimalType,
                org.apache.spark.sql.types.DoubleType) => d.precision <= 15
          case _ => false
        })
    def typeAligned(f: org.apache.spark.sql.types.StructField): org.apache.spark.sql.Column = {
      val cur = inTypes.getOrElse(f.name, throw new IllegalArgumentException(
        s"append: missing column ${f.name}"))
      val base =
        if (cur.catalogString == f.dataType.catalogString)
          org.apache.spark.sql.functions.col(f.name)
        else if (safeCast(cur, f.dataType))
          org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
        else throw new IllegalArgumentException(
          s"append: column ${f.name} arrives as ${cur.simpleString} but the " +
            s"table stores ${f.dataType.simpleString}, and that is not a safe " +
            "upcast — files written as-is could not be read back under the " +
            "table schema. If a source column was type-widened, widen this " +
            "table's column first (widenColumn), then retry")
      base.as(f.name, f.metadata)
    }
    df.select(idSchema.fields.map(typeAligned).toIndexedSeq: _*)
  }

  /** Parquet writer for `frame` with the table's PK/bloom-column bloom
    * filters attached (adaptive sizing; `spark.graft.pkBloomFilters`
    * opts out) — shared by the append writer and the fused
    * survivor+add writer. */
  private def bloomWriter(
      spark: SparkSession,
      storage: Storage,
      frame: DataFrame): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
    val idSchema = ReadOp.physicalSchemaWithIds(storage.schema, storage.recordFields)
    val bloomEnabled = spark.conf
      .getOption("spark.graft.pkBloomFilters").forall { v =>
        v.trim.toLowerCase match {
          case "true" => true
          case "false" => false
          case other => throw new IllegalArgumentException(
            s"spark.graft.pkBloomFilters must be true or false, got '$other'")
        }
      }
    val bloomCols =
      if (!bloomEnabled) Nil
      else (storage.primaryKeys ++ storage.metadata.bloomColumns).distinct.filter(c =>
        idSchema.fields.exists(f => f.name == c && ManifestIO.statsEligible(f.dataType)))
    bloomCols.foldLeft(
      frame.write.mode("overwrite")
        .option("parquet.bloom.filter.adaptive.enabled", "true")
        .option("parquet.bloom.filter.max.bytes", (128 * 1024).toString)
        // Every engine write lands in a UUID-named tmp dir whose part
        // files the footer harvest immediately renames into data/ and
        // whose directory is then deleted — the engine's manifest IS
        // the commit marker. The Hadoop committer's _SUCCESS file and
        // v1's second rename pass (task dir → job dir → output) are
        // driver-side filesystem round-trips per commit that nothing
        // ever observes; committer v2 renames task outputs straight
        // into the (private, single-writer) tmp dir at task commit.
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")) {
      (w, c) => w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
  }

  /** Footer-harvest + move of freshly written part files into their
    * final `data/` homes: driver loop for a handful, one small Spark
    * job past that (the driver loop is O(new files) and becomes the
    * append bottleneck at thousands of task outputs). `assignments` =
    * (src part path, final rel, final abs). */
  private def harvestAndMove(
      spark: SparkSession,
      storage: Storage,
      assignments: Seq[(String, String, String)]): Seq[IndexFileMeta] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val pks = storage.statsColumns
    val evid = ManifestIO.evidenceColumns(storage)
    if (assignments.size <= 8) {
      val fs = new Path(storage.location).getFileSystem(conf)
      assignments.map { case (src, rel, dstAbs) =>
        val meta = ManifestIO.harvestFooter(src, rel, conf, pks, evid)
        if (!fs.rename(new Path(src), new Path(dstAbs)))
          throw new java.io.IOException(s"rename $src failed")
        meta
      }
    } else {
      // ship the SESSION's Hadoop conf: the table may sit on a
      // filesystem configured via spark.hadoop.* (credentials, custom
      // fs impl) that a default Configuration would not resolve
      val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
      spark.sparkContext
        .parallelize(assignments, math.min(assignments.size, 32))
        .map { case (src, rel, dstAbs) =>
          val c = serConf.value
          val srcPath = new Path(src)
          val dst = new Path(dstAbs)
          val tfs = dst.getFileSystem(c)
          if (tfs.exists(srcPath)) {
            val meta = ManifestIO.harvestFooter(src, rel, c, pks, evid)
            if (!tfs.rename(srcPath, dst))
              throw new java.io.IOException(s"rename $src -> $dstAbs failed")
            meta
          } else if (tfs.exists(dst)) {
            // task retry after a completed rename: harvest the moved file
            ManifestIO.harvestFooter(dstAbs, rel, c, pks, evid)
          } else throw new java.io.IOException(s"missing $src and $dstAbs")
        }
        .collect().toSeq
    }
  }

  /** Write `df` as new data files + one index manifest; returns the Patch
    * to commit. `df` must carry the table's index schema (record-field
    * columns already replaced by addresses when record fields exist). */
  def writeFiles(
      spark: SparkSession,
      storage: Storage,
      df: DataFrame,
      targetFileRows: Option[Long] = None,
      writeClustered: Boolean = false): Patch =
    writeFilesWithMeta(spark, storage, df, targetFileRows, writeClustered).patch

  /** `writeClustered = true` (APPEND-path callers only) honors the
    * table's `write_cluster_by` columns: the batch is range-partitioned
    * + sorted so it lands as an internally-disjoint tier. Maintenance
    * rewrites (compact/cluster/CoW survivors) pass false — they arrange
    * their own layout and must not be re-shuffled. */
  def writeFilesWithMeta(
      spark: SparkSession,
      storage: Storage,
      df: DataFrame,
      targetFileRows: Option[Long] = None,
      writeClustered: Boolean = false,
      /** Rebucket's hook: write under this PER-COLUMN (columns, counts)
        * layout instead of the table's current one (the metadata
        * switches to it in the same commit that references the written
        * files). */
      bucketLayoutOverride: Option[(Seq[String], Seq[Int])] = None): AppendResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpRel = s"${StoragePaths.DataDir}/tmp_append_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val tmpAbs = storage.absolute(tmpRel)

    // Bucketed tables: EVERY write shuffles rows to
    // pmod(murmur3(bucketColumns), numBuckets) — partition index IS the
    // bucket id (HashPartitioning semantics), and the output file name
    // encodes it. CoW rewrites and compaction flow through here too, so
    // the invariant survives delete/update/upsert/compact.
    val numBuckets = bucketLayoutOverride
      .map(_._2.map(_.toLong).product.toInt)
      .getOrElse(storage.metadata.numBuckets)
    val bucketCounts = bucketLayoutOverride.map(_._2).getOrElse(
      storage.metadata.bucketCounts.toSeq)
    val bucketColumns = bucketLayoutOverride.map(_._1).getOrElse(
      storage.metadata.bucketColumns.toSeq)
    // per-column sub-buckets (multi-column SPJ layout): rows shuffle by
    // the TUPLE of per-column ids — one task per occupied tuple — and
    // the dynamic-partition write below splits tasks into tuple-pure
    // files whose directory names carry the ids
    val perColumn = numBuckets > 0 && bucketCounts.nonEmpty
    val wcb = storage.metadata.writeClusterBy
    // align to schema order + upcast frame types (see [[alignToSchema]]).
    // Alignment happens BEFORE bucketing: bucket ids hash the STORED
    // type (murmur3-of-long ≠ murmur3-of-int for the same value), so an
    // int frame appended to a widened-bigint bucket column must be cast
    // first or its files land under ids BucketPruning/SPJ would never
    // probe — a silent layout corruption instead of a wrong hash.
    val alignedDf = alignToSchema(storage, df)
    // the per-column layout keeps its (synthetic) bucket-id columns
    // through the repartition for the dynamic-partition write;
    // partitionBy excludes them from the written data files
    val aligned =
      if (perColumn) {
        val bCols = AppendOp.perColumnBucketExprs(storage, bucketColumns, bucketCounts)
        alignedDf.select((alignedDf.columns.map(org.apache.spark.sql.functions.col) ++ bCols).toIndexedSeq: _*)
          .repartition(numBuckets, AppendOp.bucketDirCols(bucketCounts.size): _*)
      } else if (numBuckets > 0)
        alignedDf.repartition(numBuckets,
          storage.metadata.bucketColumns.map(org.apache.spark.sql.functions.col): _*)
      else if (writeClustered && wcb.nonEmpty) {
        // cluster-on-write: the batch lands as an internally-disjoint
        // sorted tier with tight per-file stats. NO explicit partition
        // count — AQE coalesces tiny range partitions (a small batch
        // becomes one sorted file, a large ingest fans out), under the
        // REDUCED advisory size set around the write below: pruning
        // granularity needs several files per tier, and AQE's default
        // 64 MB advisory would fold a whole mid-size tier into one
        val cols = wcb.map(org.apache.spark.sql.functions.col)
        alignedDf.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
      } else targetFileRows match {
        case Some(n) if n > 0 =>
          val total = alignedDf.count()
          val parts = math.max(1, math.ceil(total.toDouble / n).toInt)
          alignedDf.repartition(parts)
        case _ => alignedDf
      }
    // Parquet BLOOM FILTERS on the primary-key columns: min/max stats
    // prune files only when the layout correlates with the key; a bloom
    // skips row groups on PK point lookups regardless of layout — the
    // unbucketed-table complement to hash buckets at 100 TB. ADAPTIVE
    // sizing (parquet 1.15+): the filter is right-sized to the row
    // group's ACTUAL distinct count under a hard byte cap — a fixed
    // expected-NDV would be oversized for this harness's small files
    // and badly undersized (useless FPP) for 128 MB row groups holding
    // ~1M distinct keys at production scale. Write tax measured ≤ noise
    // (~0.1s on the 600k-row append); the reader consults the filters
    // automatically for pushed equality predicates.
    // `spark.graft.pkBloomFilters=false` opts a write-heavy pipeline out
    // (e.g. bulk ingest that will be compacted/clustered anyway)
    def writeOut(frame: DataFrame): Unit = {
      val base = bloomWriter(spark, storage, frame)
      (if (perColumn) base.partitionBy(
        AppendOp.bucketDirNames(bucketCounts.size): _*)
       else base).parquet(tmpAbs)
    }
    if (writeClustered && wcb.nonEmpty && numBuckets == 0) {
      // reduced AQE advisory for the write-clustered shuffle: several
      // tight-range files per tier beat one 64 MB-coalesced file
      // (pruning granularity). Overridable for other workloads.
      // SESSION-SCOPED via a cloned session — a set/restore on the
      // shared conf would leak the 8 MB advisory to any job planning
      // concurrently in this session during the write window.
      org.apache.spark.sql.graftshim.ScopedConf.withScopedConf(aligned,
        clusterAdvisoryConfs(spark))(writeOut)
    } else if (AppendOp.shuffleFree(aligned)) {
      // a shuffle-free write plan (scan/broadcast-join/union inputs —
      // every delta-sized MV state commit and plain append lands here)
      // gives AQE nothing to size: output files = input partitions
      // either way, but AQE still materializes each broadcast build as
      // its own sequential job with a replan loop around the write.
      // Scoped off (same clone mechanism); any plan with a shuffle
      // keeps AQE for partition coalescing / skew handling.
      org.apache.spark.sql.graftshim.ScopedConf.withScopedConf(aligned,
        AppendOp.NoAqeConfs)(writeOut)
    } else writeOut(aligned)

    val fs = new Path(tmpAbs).getFileSystem(conf)
    val parts: Array[Path] =
      if (!perColumn)
        fs.listStatus(new Path(tmpAbs)).map(_.getPath)
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      else {
        // dynamic-partition layout: tmp/__gb0=X/__gb1=Y/part-*.parquet
        val out = Array.newBuilder[Path]
        val it = fs.listFiles(new Path(tmpAbs), true)
        while (it.hasNext) {
          val p = it.next().getPath
          if (p.getName.startsWith("part-")) out += p
        }
        out.result().sortBy(_.toString)
      }

    // footer harvest + move into data/ — one small task per batch of
    // files for large appends (the driver loop is O(new files) and
    // becomes the append bottleneck at thousands of task outputs);
    // driver-side below a small threshold to avoid job overhead
    // part-NNNNN task numbering = partition index = bucket id (an
    // explicit df.repartition(n, expr) is never AQE-coalesced); the
    // per-column layout reads the tuple from the directory names and
    // flattens it row-major into the file-name id
    val partIdxRe = "part-(\\d+)-.*".r
    val assignments = parts.map { p =>
      val rel =
        if (perColumn)
          StoragePaths.newIndexDataFile(
            bucket = AppendOp.flatBucketOfDir(p, bucketCounts))
        else if (numBuckets > 0) p.getName match {
          case partIdxRe(idx) => StoragePaths.newIndexDataFile(bucket = idx.toInt)
          case other => throw new IllegalStateException(s"unparseable part file $other")
        }
        else StoragePaths.newIndexDataFile()
      (p.toString, rel, storage.absolute(rel))
    }.toSeq
    val harvested = harvestAndMove(spark, storage, assignments)
    // a task whose partition lost every row still writes a 0-row parquet;
    // it never enters the manifest, so remove it rather than orphan it
    val (kept, empties) = harvested.partition(_.numRows > 0)
    empties.foreach(m => fs.delete(new Path(storage.absolute(m.file)), false))
    val metas = kept.sortBy(_.file)
    fs.delete(new Path(tmpAbs), true)

    if (metas.isEmpty) return AppendResult(Patch(), Nil)

    val manifest = ManifestIO.writeIndexManifest(spark, storage, metas)
    val stats = StorageStatistics(
      numRows = metas.map(_.numRows).sum,
      indexCompressedBytes = metas.map(_.compressedBytes).sum,
      indexUncompressedBytes = metas.map(_.uncompressedBytes).sum)
    // changelog: every row of every new file is an ADD (append.py:240-241)
    val changeLog = ChangeLog(addedRows =
      metas.map(m => RowBitmap(m.file, allRows = true, numRows = m.numRows)).toList)
    AppendResult(Patch(
      addedIndexManifests = List(manifest),
      statsDelta = stats,
      changeLog = Some(changeLog),
      manifestSummaries = Map(manifest -> ManifestIO.summarize(storage, metas))), metas)
  }

  /** Transient discriminator column of [[writeSplitFiles]] — a dynamic
    * partition, so parquet drops it from the written data. */
  private val KindCol = "__graft_kind"

  /** Scoped override for shuffle-free write plans (see the writeOut
    * call sites): AQE has nothing to size there but still runs each
    * broadcast build as its own job with a replan loop. */
  private val NoAqeConfs = Seq("spark.sql.adaptive.enabled" -> "false")

  /** True when `df`'s STATIC physical plan contains no shuffle
    * exchange — the honest gate for dropping AQE around a write: with
    * no shuffle to coalesce or skew-split, AQE cannot change the
    * output layout, only add per-stage scheduling. The probe plans the
    * query once on the original session (mirrors what the scoped clone
    * will replan); tens of ms against the stage-jobs it saves. */
  private def shuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }

  /** Scoped-conf set for a write-clustered shuffle: the reduced AQE
    * advisory (`spark.graft.writeCluster.advisoryBytes`, default 8 MB —
    * several tight-range files per tier beat one 64 MB-coalesced file)
    * plus a matching coalesce floor when the advisory is set BELOW
    * AQE's default 1 MB `minPartitionSize` (otherwise the floor wins
    * and a small tier still folds into one file). At the default
    * advisory the floor stays at Spark's default — no behavior
    * change. */
  private def clusterAdvisoryConfs(
      spark: SparkSession): Seq[(String, String)] = {
    val advisory = spark.conf.getOption("spark.graft.writeCluster.advisoryBytes")
      .getOrElse((8L * 1024 * 1024).toString)
    val floor = math.min(advisory.toLong, 1L * 1024 * 1024).toString
    Seq("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisory,
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> floor)
  }

  /** FUSED carryover + append: land CoW `survivors` and fresh `adds`
    * in ONE Spark write job but in SEPARATE files (dynamic partition on
    * a transient kind column), so a view state commit's delete+append
    * costs one write pass instead of two while the changelog still
    * tells carryover rewrites (CDC-silent) from genuine ADDs (VERDICT
    * r14 next #3).
    *
    * Plain AND write-clustered layouts (VERDICT r15 #2 — the engine's
    * flagship MVs are write-clustered: the text-index postings table,
    * the streaming band index). A clustered table's union range-
    * partitions and sorts on (kind, clusterColumns): the dynamic
    * partition keeps the files kind-pure, the leading kind keeps tasks
    * kind-contiguous, and within each kind the files come out range-
    * disjoint and sorted — the same tight-stats tier shape the append
    * path produces, for BOTH groups (survivors regain tier shape too,
    * strictly better than the classic unclustered carryover). Bucketed
    * and record-field layouts still take the two-pass fallback — their
    * file naming / payload plumbing lives in [[writeFilesWithMeta]] /
    * RecordIO.
    *
    * Returns (patch, addMetas): the patch carries the manifest, stats
    * and summaries for BOTH file groups but NO changelog — the caller
    * owns it (deleted-row bitmaps plus `addMetas` as ADD bitmaps). */
  private[core] def writeSplitFiles(
      spark: SparkSession,
      storage: Storage,
      survivors: DataFrame,
      adds: DataFrame): (Patch, Seq[IndexFileMeta]) = {
    import org.apache.spark.sql.functions.{col, lit}
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpRel = s"${StoragePaths.DataDir}/tmp_append_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val tmpAbs = storage.absolute(tmpRel)
    val union = alignToSchema(storage, survivors).withColumn(KindCol, lit(0))
      .unionByName(alignToSchema(storage, adds).withColumn(KindCol, lit(1)))
    val wcb = storage.metadata.writeClusterBy
    if (wcb.nonEmpty && storage.metadata.numBuckets == 0) {
      val cols = (KindCol +: wcb).map(col)
      val shaped = union.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
      // same reduced AQE advisory as the clustered append path: several
      // tight-range files per tier beat one 64 MB-coalesced file
      org.apache.spark.sql.graftshim.ScopedConf.withScopedConf(shaped,
        clusterAdvisoryConfs(spark))(f =>
        bloomWriter(spark, storage, f).partitionBy(KindCol).parquet(tmpAbs))
    } else if (shuffleFree(union))
      // same shuffle-free gate as the plain append write: the fused
      // survivor∪adds plan is scan + broadcast-join + union on every
      // delta-sized state commit — AQE only adds stage jobs there
      org.apache.spark.sql.graftshim.ScopedConf.withScopedConf(union,
        NoAqeConfs)(f =>
        bloomWriter(spark, storage, f).partitionBy(KindCol).parquet(tmpAbs))
    else
      bloomWriter(spark, storage, union).partitionBy(KindCol).parquet(tmpAbs)

    val fs = new Path(tmpAbs).getFileSystem(conf)
    val parts = Array.newBuilder[(Path, Boolean)] // (part file, isAdd)
    val it = fs.listFiles(new Path(tmpAbs), true)
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.startsWith("part-"))
        parts += p -> (p.getParent.getName == s"$KindCol=1")
    }
    val assignments = parts.result().sortBy(_._1.toString).map { case (p, isAdd) =>
      val rel = StoragePaths.newIndexDataFile()
      ((p.toString, rel, storage.absolute(rel)), isAdd)
    }.toSeq
    val harvested = harvestAndMove(spark, storage, assignments.map(_._1))
      .zip(assignments.map(_._2))
    // 0-row task outputs never enter the manifest
    val (kept, empties) = harvested.partition(_._1.numRows > 0)
    empties.foreach { case (m, _) => fs.delete(new Path(storage.absolute(m.file)), false) }
    fs.delete(new Path(tmpAbs), true)
    if (kept.isEmpty) return (Patch(), Nil)

    val metas = kept.map(_._1).sortBy(_.file)
    val addMetas = kept.collect { case (m, true) => m }.sortBy(_.file)
    val manifest = ManifestIO.writeIndexManifest(spark, storage, metas)
    (Patch(
      addedIndexManifests = List(manifest),
      statsDelta = StorageStatistics(
        numRows = metas.map(_.numRows).sum,
        indexCompressedBytes = metas.map(_.compressedBytes).sum,
        indexUncompressedBytes = metas.map(_.uncompressedBytes).sum),
      manifestSummaries = Map(manifest -> ManifestIO.summarize(storage, metas))),
      addMetas)
  }
}
