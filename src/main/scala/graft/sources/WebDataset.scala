package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream}

import scala.collection.mutable

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.commons.compress.utils.IOUtils
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}

/** WebDataset-style sharded multimodal ingest (reference
  * `notebooks/webdataset_ingestion.ipynb`): a WebDataset is a directory
  * of `.tar` shards, each holding per-sample files grouped by basename —
  * `<key>.txt`, `<key>.jpg`, … — and ingestion reads shards IN PARALLEL
  * into rows `(key, <one binary column per extension>)`, appended as
  * ONE snapshot via `SpaceDataset.appendFrom` with the payload columns
  * as record fields (the notebook's `append_from` + ArrayRecord shape).
  *
  * Spark-first: shard parsing runs ON EXECUTORS — one task per shard
  * (exactly the notebook's one-iterator-per-shard parallelism; at
  * 100 TB parallelism is shard count, the same unit WebDataset itself
  * distributes by), each task STREAMING its tar off the filesystem, so
  * no whole-shard byte array is ever materialized and shards larger
  * than 2 GB (the binary-source row cap) ingest fine. Well-formed
  * shards store each sample's files CONTIGUOUSLY (the format's own
  * sequential-access contract), so samples are EMITTED AS THEIR RUN
  * ENDS and task memory is bounded by ONE sample's requested payloads,
  * not the shard: a cheap first pass walks only the tar headers
  * (payload bytes are seek-skipped) to confirm contiguity; a shard
  * whose keys interleave falls back to whole-shard grouping, which
  * produces the identical sample set. Nothing passes through the
  * driver.
  *
  * Key semantics mirror the `webdataset` library: the sample key is the
  * entry name up to the FIRST dot of its basename (directories kept),
  * the extension is everything after — so `a/b.seg.jpg` → key `a/b`,
  * ext `seg.jpg`. Entries whose extension is not requested are ignored
  * (e.g. sidecar `.json` when only txt/jpg are wanted); entries with an
  * empty basename before the first dot (hidden files like `.txt`) are
  * skipped, and a duplicate `(key, ext)` within a shard is an ERROR —
  * both the library's rules (its `base_plus_ext` regex requires a
  * non-empty stem, and it raises on a duplicate file in a sample). */
object WebDataset {

  /** Read tar shards into `(key string, <ext binary>…)` rows — one
    * DataFrame spanning all `shardPaths`, one input task per shard. */
  def read(spark: SparkSession, shardPaths: Seq[String],
      extCols: Seq[String]): DataFrame = {
    require(extCols.nonEmpty, "at least one extension column")
    require(shardPaths.nonEmpty, "at least one shard path")
    val schema = StructType(StructField("key", StringType, nullable = false) +:
      extCols.map(c => StructField(c, BinaryType, nullable = true)))
    val exts = extCols.toIndexedSeq
    val sc = spark.sparkContext
    val conf = sc.broadcast(new SerializableWritable(sc.hadoopConfiguration))
    val rows = sc.parallelize(shardPaths, shardPaths.size).flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf.value.value)
      // pass 1 — headers only (payloads seek-skipped on FS streams):
      // are this shard's sample keys contiguous?
      val contiguous = {
        val s = new BufferedInputStream(fs.open(path))
        try keysContiguous(s, exts) finally s.close()
      }
      val samples: Iterator[(String, Map[String, Array[Byte]])] =
        if (contiguous) {
          // pass 2 — streaming emit, memory bounded by one sample; the
          // stream closes at EOF, and the task-completion listener
          // covers abnormal task exit mid-iteration
          val in = new BufferedInputStream(fs.open(path))
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => in.close()))
          parseSamplesStreaming(in, exts)
        } else {
          // out-of-order shard: whole-shard grouping (identical sample
          // set; memory = the shard's requested payloads — unavoidable
          // when a sample's files are genuinely scattered)
          val in = new BufferedInputStream(fs.open(path))
          val all = try parseSamples(in, exts) finally in.close()
          all.iterator
        }
      samples.map { case (k, m) => Row.fromSeq(k +: exts.map(m.get(_).orNull)) }
    }
    spark.createDataFrame(rows, schema)
  }

  /** webdataset `base_plus_ext` split: name up to the FIRST dot of the
    * basename is the key, the rest is the extension. None for entries
    * that cannot be a sample file (no dot, or an empty/hidden stem). */
  private def keyExt(name: String): Option[(String, String)] = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    // a valid sample entry needs a non-empty stem before the first
    // dot of its basename: extension-less entries cannot address a
    // column, and hidden files (`.txt`, `dir/.txt`) would collapse
    // into one bogus empty-stem sample — webdataset skips them
    if (dot > slash + 1) Some((name.substring(0, dot), name.substring(dot + 1)))
    else None
  }

  /** Pass-1 contiguity check: do the shard's requested-extension keys
    * appear in contiguous runs? Walks tar HEADERS only — payload bytes
    * are skipped by `getNextEntry` (a seek on filesystem streams), so
    * this costs one header sweep regardless of shard size. Memory is
    * one string per distinct key (keys, not payloads). */
  private[graft] def keysContiguous(stream: InputStream, exts: Seq[String]): Boolean = {
    val wanted = exts.toSet
    val in = new TarArchiveInputStream(stream)
    val closed = mutable.HashSet.empty[String]
    var cur: String = null
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        keyExt(e.getName) match {
          case Some((key, ext)) if wanted.contains(ext) =>
            if (key != cur) {
              if (cur != null) closed += cur
              if (closed.contains(key)) return false
              cur = key
            }
          case _ =>
        }
      }
      e = in.getNextEntry
    }
    true
  }

  /** Streaming parse of a CONTIGUOUS shard: each sample is emitted the
    * moment its run of entries ends, so memory is bounded by one
    * sample's requested payloads. Callers must have verified contiguity
    * ([[keysContiguous]]); a key reappearing after its run closed is
    * reported as the corrupt/out-of-order shard it is. */
  private[graft] def parseSamplesStreaming(stream: InputStream, exts: Seq[String])
      : Iterator[(String, Map[String, Array[Byte]])] =
    new Iterator[(String, Map[String, Array[Byte]])] {
      private val wanted = exts.toSet
      private val in = new TarArchiveInputStream(stream)
      private val closed = mutable.HashSet.empty[String]
      private var curKey: String = null
      private var curFiles = Map.empty[String, Array[Byte]]
      private var ready: (String, Map[String, Array[Byte]]) = null
      private var eof = false

      private def close(): Unit = { eof = true; in.close() }

      private def advance(): Unit = while (ready == null && !eof) {
        val e = in.getNextEntry
        if (e == null) {
          if (curKey != null) { ready = (curKey, curFiles); curKey = null }
          close()
        } else if (!e.isDirectory) {
          keyExt(e.getName) match {
            case Some((key, ext)) if wanted.contains(ext) =>
              if (key == curKey) {
                if (curFiles.contains(ext)) throw new IllegalArgumentException(
                  s"duplicate file '${e.getName}' in sample '$key' — corrupt shard")
                curFiles += ext -> IOUtils.toByteArray(in)
              } else {
                if (closed.contains(key)) throw new IllegalStateException(
                  s"sample '$key' reappears after its run ended — " +
                    "out-of-order shard in streaming parse")
                if (curKey != null) { ready = (curKey, curFiles); closed += curKey }
                curKey = key
                curFiles = Map(ext -> IOUtils.toByteArray(in))
              }
            case _ =>
          }
        }
      }

      def hasNext: Boolean = { if (ready == null) advance(); ready != null }
      def next(): (String, Map[String, Array[Byte]]) = {
        if (!hasNext) throw new NoSuchElementException("shard exhausted")
        val r = ready; ready = null; r
      }
    }

  /** One shard → the samples it holds: key → (ext → bytes), grouping
    * the WHOLE shard in memory (insertion order preserved). Robust to
    * any entry order — the fallback for out-of-order shards, and the
    * semantics [[parseSamplesStreaming]] must reproduce on contiguous
    * ones. The stream is consumed to EOF but only requested-extension
    * payloads are retained. */
  private[graft] def parseSamples(stream: InputStream, exts: Seq[String])
      : Seq[(String, Map[String, Array[Byte]])] = {
    val wanted = exts.toSet
    val samples = mutable.LinkedHashMap.empty[String, Map[String, Array[Byte]]]
    val in = new TarArchiveInputStream(stream)
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        keyExt(e.getName) match {
          case Some((key, ext)) if wanted.contains(ext) =>
            val bytes = IOUtils.toByteArray(in) // to current-entry EOF
            samples.updateWith(key) {
              case Some(m) =>
                if (m.contains(ext)) throw new IllegalArgumentException(
                  s"duplicate file '${e.getName}' in sample '$key' — corrupt shard")
                Some(m + (ext -> bytes))
              case None => Some(Map(ext -> bytes))
            }
          case _ =>
        }
      }
      e = in.getNextEntry
    }
    samples.toSeq
  }

  /** Byte-array convenience overload (tests / small in-memory shards). */
  private[graft] def parseSamples(tarBytes: Array[Byte], exts: Seq[String])
      : Seq[(String, Map[String, Array[Byte]])] =
    parseSamples(new ByteArrayInputStream(tarBytes), exts)

  /** Write samples as one tar shard (fixture/export helper — the
    * inverse of [[parseSamples]]). Each sample is `(key, ext → bytes)`;
    * entries are written contiguously per sample, WebDataset layout. */
  def writeShard(path: java.nio.file.Path,
      samples: Seq[(String, Seq[(String, Array[Byte])])]): Unit = {
    val out = new TarArchiveOutputStream(java.nio.file.Files.newOutputStream(path))
    try {
      out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
      for ((key, files) <- samples; (ext, bytes) <- files) {
        val entry = new TarArchiveEntry(s"$key.$ext")
        entry.setSize(bytes.length.toLong)
        out.putArchiveEntry(entry)
        out.write(bytes)
        out.closeArchiveEntry()
      }
    } finally out.close()
  }
}
