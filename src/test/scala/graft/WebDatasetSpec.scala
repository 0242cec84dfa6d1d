package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.sources.WebDataset

/** WebDataset sharded-ingest semantics: tar round-trip, webdataset-style
  * key splitting, executor-side parsing into rows, and the one-snapshot
  * multi-shard appendFrom with record-field payloads. */
class WebDatasetSpec extends AnyFunSuite {
  import TestSpark._

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("writeShard/parseSamples round-trip with webdataset key semantics") {
    val dir = Files.createTempDirectory("graft_wds_rt_")
    val p = dir.resolve("s.tar")
    WebDataset.writeShard(p, Seq(
      "000000001" -> Seq("txt" -> bytes("hello"), "jpg" -> Array[Byte](1, 2, 3)),
      // key with a directory AND a dotted double extension: key is the
      // name up to the FIRST dot of the basename
      "a/b" -> Seq("seg.jpg" -> Array[Byte](9), "txt" -> bytes("x"))))
    val back = WebDataset.parseSamples(Files.readAllBytes(p), Seq("txt", "jpg", "seg.jpg"))
    assert(back.map(_._1) == Seq("000000001", "a/b"))
    assert(new String(back.head._2("txt"), UTF_8) == "hello")
    assert(back.head._2("jpg").toSeq == Seq[Byte](1, 2, 3))
    assert(back(1)._2("seg.jpg").toSeq == Seq[Byte](9))
    // unrequested extensions are ignored
    val only = WebDataset.parseSamples(Files.readAllBytes(p), Seq("txt"))
    assert(only.forall(_._2.keySet == Set("txt")))
  }

  test("hidden files are skipped and duplicate sample files are an error") {
    // webdataset's base_plus_ext requires a non-empty stem: `.txt` and
    // `dir/.txt` are stray hidden files, not samples — silently merging
    // them under an empty key would collide as a duplicate PK later
    val dir = Files.createTempDirectory("graft_wds_hid_")
    val p = dir.resolve("h.tar")
    WebDataset.writeShard(p, Seq(
      "" -> Seq("txt" -> bytes("stray")),          // entry name ".txt"
      "dir/" -> Seq("txt" -> bytes("stray2")),     // entry "dir/.txt"
      "good" -> Seq("txt" -> bytes("keep"))))
    val back = WebDataset.parseSamples(Files.readAllBytes(p), Seq("txt"))
    assert(back.map(_._1) == Seq("good"), s"hidden files leaked: $back")

    // the same file twice in one sample is a corrupt shard, not
    // last-wins data loss — the webdataset library raises too
    val d = dir.resolve("dup.tar")
    WebDataset.writeShard(d, Seq(
      "k" -> Seq("txt" -> bytes("v1"), "txt" -> bytes("v2"))))
    val err = intercept[IllegalArgumentException] {
      WebDataset.parseSamples(Files.readAllBytes(d), Seq("txt"))
    }
    assert(err.getMessage.contains("duplicate"), err.getMessage)
  }

  test("interleaved and ordered shards produce identical samples") {
    val dir = Files.createTempDirectory("graft_wds_ord_")
    val ordered = dir.resolve("ordered.tar")
    WebDataset.writeShard(ordered, Seq(
      "a" -> Seq("txt" -> bytes("ta"), "jpg" -> Array[Byte](1, 2)),
      "b" -> Seq("txt" -> bytes("tb"), "jpg" -> Array[Byte](3)),
      "c" -> Seq("txt" -> bytes("tc"), "jpg" -> Array[Byte](4, 5, 6))))
    // same content, sample files scattered across the shard (writeShard
    // writes outer-seq order, so repeating a key interleaves entries)
    val interleaved = dir.resolve("interleaved.tar")
    WebDataset.writeShard(interleaved, Seq(
      "a" -> Seq("txt" -> bytes("ta")),
      "b" -> Seq("txt" -> bytes("tb")),
      "c" -> Seq("txt" -> bytes("tc")),
      "a" -> Seq("jpg" -> Array[Byte](1, 2)),
      "b" -> Seq("jpg" -> Array[Byte](3)),
      "c" -> Seq("jpg" -> Array[Byte](4, 5, 6))))

    // contiguity pre-scan classifies them correctly
    def scan(p: java.nio.file.Path) = {
      val s = new java.io.ByteArrayInputStream(Files.readAllBytes(p))
      WebDataset.keysContiguous(s, Seq("txt", "jpg"))
    }
    assert(scan(ordered), "ordered shard misclassified as interleaved")
    assert(!scan(interleaved), "interleaved shard misclassified as ordered")

    // streaming parse of the ordered shard equals whole-shard grouping
    val streamed = WebDataset.parseSamplesStreaming(
      new java.io.ByteArrayInputStream(Files.readAllBytes(ordered)), Seq("txt", "jpg"))
      .toSeq.map { case (k, m) => (k, m.view.mapValues(_.toSeq).toMap) }
    val grouped = WebDataset.parseSamples(Files.readAllBytes(ordered), Seq("txt", "jpg"))
      .map { case (k, m) => (k, m.view.mapValues(_.toSeq).toMap) }
    assert(streamed == grouped)

    // the full reader yields the identical sample set for both layouts
    def rows(p: java.nio.file.Path) =
      WebDataset.read(spark, Seq(p.toString), Seq("txt", "jpg")).collect()
        .map(r => (r.getString(0),
          new String(r.getAs[Array[Byte]](1), UTF_8),
          r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(rows(ordered) == rows(interleaved))
    assert(rows(ordered).map(_._1) == Set("a", "b", "c"))
  }

  test("multi-shard read ingests as ONE snapshot with byte-identical record payloads") {
    import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}
    val dir = Files.createTempDirectory("graft_wds_ing_")
    val samples = (0 until 20).map { i =>
      f"$i%09d" -> Seq("txt" -> bytes(s"caption $i"),
        "jpg" -> Array.tabulate[Byte](10 + i)(j => ((i + j) % 256).toByte))
    }
    val shardPaths = (0 until 2).map { sh =>
      val p = dir.resolve(f"shard-$sh%05d.tar")
      WebDataset.writeShard(p, samples.filter(_._1.takeRight(1).toInt % 2 == sh))
      p.toString
    }
    // loader yields all samples across shards
    val df = WebDataset.read(spark, shardPaths, Seq("txt", "jpg"))
    assert(df.count() == 20)

    val schema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("txt", BinaryType),
      StructField("jpg", BinaryType)))
    val ds = SpaceDataset.create(spark, Files.createTempDirectory("graft_wds_t_")
      .toString + "/tbl", schema, Seq("key"), recordFields = Seq("jpg"))
    val snapsBefore = ds.storage.metadata.currentSnapshotId
    ds.appendFrom(shardPaths.map(p =>
      () => WebDataset.read(spark, Seq(p), Seq("txt", "jpg"))))
    // N shards, ONE commit (the notebook's append_from contract)
    assert(ds.storage.metadata.currentSnapshotId == snapsBefore + 1)

    val got = ds.readAll().collect()
      .map(r => r.getString(0) -> (new String(r.getAs[Array[Byte]](1), UTF_8),
        r.getAs[Array[Byte]](2).toSeq)).toMap
    assert(got.size == 20)
    for ((k, exts) <- samples) {
      val (txt, jpg) = got(k)
      assert(txt == new String(exts.head._2, UTF_8), s"caption mismatch for $k")
      assert(jpg == exts(1)._2.toSeq, s"payload mismatch for $k")
    }
  }
}
