package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** HuggingFace ⇄ graft conversion semantics (reference
  * notebooks/huggingface_conversion.ipynb): zero-copy parquet append,
  * PK-pruned CoW manipulation that leaves untouched downloads in
  * place, version-pinned export to a raw parquet reader, and the
  * caption+image-record variant for image datasets. */
class HfConversionSpec extends AnyFunSuite {
  import TestSpark._

  test("HF round-trip: CoW delete rewrites only the touched shard; export is pinned") {
    val docs = Tables.read(spark, sfDir, "documents")
    // the "downloaded" HF parquet files: 4 disjoint-key-range shards
    val dlDir = Files.createTempDirectory("graft_hfc_dl_").toString + "/shards"
    docs.repartitionByRange(4, col("doc_id")).write.parquet(dlDir)
    val shards = new java.io.File(dlDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted.toSeq
    assert(shards.size == 4)

    val loc = Files.createTempDirectory("graft_hfc_tbl_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, docs.schema, Seq("doc_id"))
    ParquetLoader.loadParquet(spark, ds, shards)
    // zero-copy: every listed index file IS a downloaded shard
    assert(ds.indexFiles().toSet == shards.toSet)

    // the notebook's manipulation: delete a PK range; manifest pruning
    // must confine the CoW rewrite to the one shard holding those keys
    ds.delete(col("doc_id").between(10L, 19L))
    ds.addTag("after_delete")
    val tagged = ds.indexFiles(version = Some("after_delete"))
    val survivingDownloads = tagged.filter(shards.contains)
    assert(survivingDownloads.size == 3,
      s"expected 3 untouched downloaded shards, got $survivingDownloads")
    assert(tagged.exists(!shards.contains(_)), "no rewritten survivor file")

    // head moves on; the tagged export must not see the new rows
    ds.append(docs.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 9000000L))
    // explicit id-stripped schema (the export mixes id-carrying engine
    // files with id-less downloads; inference must not pick the former)
    val exported = spark.read.schema(graft.format.FieldIds.strip(docs.schema))
      .parquet(ds.indexFiles(version = Some("after_delete")): _*)
    val expected = docs.filter(!col("doc_id").between(10L, 19L))
    assert(exported.count() == expected.count())
    assert(exported.filter(col("doc_id") >= 9000000L).count() == 0,
      "post-tag append leaked into the pinned export")
    assert(exported.filter(col("doc_id").between(10L, 19L)).count() == 0)
  }

  test("HF image dataset converts with the image bytes as a record field") {
    import spark.implicits._
    // an HF image dataset export: (id, caption, image-bytes) parquet
    val rows = (0L until 30L).map(i =>
      (i, s"caption $i", Array.tabulate[Byte](50 + i.toInt)(j => ((i + j) % 256).toByte)))
    val src = rows.toDF("id", "caption", "image")
    val dlDir = Files.createTempDirectory("graft_hfc_img_").toString + "/dl"
    src.write.parquet(dlDir)

    // conversion with the payload split to record storage (the shape
    // the reference stores image datasets in): appendFrom rewrites —
    // zero-copy cannot apply when the field layout changes
    val loc = Files.createTempDirectory("graft_hfc_imgt_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, src.schema, Seq("id"),
      recordFields = Seq("image"))
    ds.appendFrom(Seq(() => spark.read.parquet(dlDir)))

    // record roundtrip: payload bytes come back byte-identical
    val back = ds.readAll().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2).toSeq))
      .sortBy(_._1)
    val want = rows.map { case (i, c, b) => (i, c, b.toSeq) }
    assert(back.toSeq == want, "record payloads did not roundtrip byte-identically")
    // and the index side reads without touching payloads
    assert(ds.read().select("caption").count() == 30)
  }
}
