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
  * than 2 GB (the binary-source row cap) ingest fine. Task memory is
  * bounded by the shard's REQUESTED payloads, not the tar size.
  * Nothing passes through the driver.
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
      val in = new BufferedInputStream(fs.open(path))
      try parseSamples(in, exts)
        .map { case (k, m) => Row.fromSeq(k +: exts.map(m.get(_).orNull)) }
      finally in.close()
    }
    spark.createDataFrame(rows, schema)
  }

  /** One shard → the samples it holds: key → (ext → bytes). Insertion
    * order preserved (WebDataset tars store a sample's files
    * contiguously, but grouping the whole shard is robust to any
    * order — a shard is one task's input, the same memory unit the
    * webdataset library assumes). The stream is consumed to EOF but
    * only requested-extension payloads are retained. */
  private[graft] def parseSamples(stream: InputStream, exts: Seq[String])
      : Seq[(String, Map[String, Array[Byte]])] = {
    val wanted = exts.toSet
    val samples = mutable.LinkedHashMap.empty[String, Map[String, Array[Byte]]]
    val in = new TarArchiveInputStream(stream)
    var e = in.getNextEntry
    while (e != null) {
      if (!e.isDirectory) {
        val name = e.getName
        val slash = name.lastIndexOf('/')
        val dot = name.indexOf('.', slash + 1)
        // a valid sample entry needs a non-empty stem before the first
        // dot of its basename: extension-less entries cannot address a
        // column, and hidden files (`.txt`, `dir/.txt`) would collapse
        // into one bogus empty-stem sample — webdataset skips them
        if (dot > slash + 1) {
          val key = name.substring(0, dot)
          val ext = name.substring(dot + 1)
          if (wanted.contains(ext)) {
            val bytes = IOUtils.toByteArray(in) // to current-entry EOF
            samples.updateWith(key) {
              case Some(m) =>
                if (m.contains(ext)) throw new IllegalArgumentException(
                  s"duplicate file '$name' in sample '$key' — corrupt shard")
                Some(m + (ext -> bytes))
              case None => Some(Map(ext -> bytes))
            }
          }
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
