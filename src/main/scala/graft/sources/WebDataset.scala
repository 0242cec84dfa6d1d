package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.collection.mutable

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}

/** WebDataset-style sharded multimodal ingest (reference
  * `notebooks/webdataset_ingestion.ipynb`): a WebDataset is a directory
  * of `.tar` shards, each holding per-sample files grouped by basename —
  * `<key>.txt`, `<key>.jpg`, … — and ingestion reads shards IN PARALLEL
  * into rows `(key, <one binary column per extension>)`, appended as
  * ONE snapshot via `SpaceDataset.appendFrom` with the payload columns
  * as record fields (the notebook's `append_from` + ArrayRecord shape).
  *
  * Spark-first: shard parsing runs ON EXECUTORS — `binaryFile` gives
  * one row per tar (one task per shard, exactly the notebook's
  * one-iterator-per-shard parallelism; at 100 TB parallelism is shard
  * count, the same unit WebDataset itself distributes by), and a
  * flatMap over the tar bytes yields the sample rows. Nothing passes
  * through the driver.
  *
  * Key semantics mirror the `webdataset` library: the sample key is the
  * entry name up to the FIRST dot of its basename (directories kept),
  * the extension is everything after — so `a/b.seg.jpg` → key `a/b`,
  * ext `seg.jpg`. Entries whose extension is not requested are ignored
  * (e.g. sidecar `.json` when only txt/jpg are wanted).
  */
object WebDataset {

  /** Read tar shards into `(key string, <ext binary>…)` rows — one
    * DataFrame spanning all `shardPaths`, one input task per shard. */
  def read(spark: SparkSession, shardPaths: Seq[String],
      extCols: Seq[String]): DataFrame = {
    require(extCols.nonEmpty, "at least one extension column")
    val schema = StructType(StructField("key", StringType, nullable = false) +:
      extCols.map(c => StructField(c, BinaryType, nullable = true)))
    val exts = extCols.toIndexedSeq
    val bin = spark.read.format("binaryFile").load(shardPaths: _*)
      .select(col("content"))
    val rows = bin.rdd.flatMap(r =>
      parseSamples(r.getAs[Array[Byte]](0), exts)
        .map { case (k, m) => Row.fromSeq(k +: exts.map(m.get(_).orNull)) })
    spark.createDataFrame(rows, schema)
  }

  /** One shard → the samples it holds: key → (ext → bytes). Insertion
    * order preserved (WebDataset tars store a sample's files
    * contiguously, but grouping the whole shard is robust to any
    * order — a shard is one task's input, the same memory unit the
    * webdataset library assumes). */
  private[graft] def parseSamples(tarBytes: Array[Byte], exts: Seq[String])
      : Seq[(String, Map[String, Array[Byte]])] = {
    val wanted = exts.toSet
    val samples = mutable.LinkedHashMap.empty[String, Map[String, Array[Byte]]]
    val in = new TarArchiveInputStream(new ByteArrayInputStream(tarBytes))
    try {
      var e = in.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val name = e.getName
          val slash = name.lastIndexOf('/')
          val dot = name.indexOf('.', slash + 1)
          if (dot > slash) { // extension-less entries cannot address a column
            val key = name.substring(0, dot)
            val ext = name.substring(dot + 1)
            if (wanted.contains(ext)) {
              val buf = new ByteArrayOutputStream(math.max(64, e.getSize.toInt))
              val chunk = new Array[Byte](64 * 1024)
              var n = in.read(chunk)
              while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
              samples.updateWith(key) {
                case Some(m) => Some(m + (ext -> buf.toByteArray))
                case None => Some(Map(ext -> buf.toByteArray))
              }
            }
          }
        }
        e = in.getNextEntry
      }
    } finally in.close()
    samples.toSeq
  }

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
