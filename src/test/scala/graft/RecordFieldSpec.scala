package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Hybrid columnar/row layout: payloads in record parquet, addresses in
  * index parquet, stitched on read (SURVEY.md §1.2). */
class RecordFieldSpec extends AnyFunSuite {
  import TestSpark._

  private def freshLoc(): String =
    Files.createTempDirectory("graft_rec_").toString + "/tbl"

  // documents with `text` as a binary record field
  private def docsBinary = Tables.read(spark, sfDir, "documents")
    .withColumn("text", encode(col("text"), "UTF-8"))

  test("append + read stitches record payloads back, in order") {
    val docs = docsBinary
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, docs.schema, Seq("doc_id"),
      recordFields = Seq("text"))
    ds.append(docs)

    val back = ds.readAll().withColumn("text", decode(col("text"), "UTF-8"))
    val exp = Tables.read(spark, sfDir, "documents")
    assert(back.count() == exp.count())
    assert(back.exceptAll(exp).isEmpty && exp.exceptAll(back).isEmpty)

    // physical layout: addresses in index files, payloads in record files
    val ref = ds.read(referenceRead = true)
    assert(ref.schema("text").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("_FILE", "_ROW_ID"))
    val recDir = new java.io.File(s"$loc/data/records")
    assert(recDir.listFiles().nonEmpty)
  }

  test("filtered read only opens record rows it needs; projection skips payloads") {
    val docs = docsBinary
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, docs.schema, Seq("doc_id"), Seq("text"))
    ds.append(docs)

    val got = ds.read(filter = Some(col("doc_id") < 50L))
      .withColumn("text", decode(col("text"), "UTF-8"))
    val exp = Tables.read(spark, sfDir, "documents").filter(col("doc_id") < 50L)
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)

    // projection without the record field never touches record files
    val proj = ds.read(fields = Some(Seq("doc_id", "lang")))
    assert(proj.columns.toSeq == Seq("doc_id", "lang"))
    assert(proj.count() == docs.count())
  }

  test("CoW delete keeps surviving record addresses valid") {
    val docs = docsBinary
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, docs.schema, Seq("doc_id"), Seq("text"))
    ds.append(docs)
    val n = docs.count()
    ds.delete(col("doc_id") % 7 === 0)

    val back = ds.readAll().withColumn("text", decode(col("text"), "UTF-8"))
    val exp = Tables.read(spark, sfDir, "documents").filter(col("doc_id") % 7 =!= 0)
    assert(back.count() == exp.count() && back.count() < n)
    assert(back.exceptAll(exp).isEmpty && exp.exceptAll(back).isEmpty)
  }

  test("upsert replaces record payloads") {
    val docs = docsBinary
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, docs.schema, Seq("doc_id"), Seq("text"))
    ds.append(docs)
    val up = docs.filter(col("doc_id") < 10L)
      .withColumn("text", encode(lit("REPLACED"), "UTF-8"))
    ds.upsert(up)
    val back = ds.readAll().withColumn("text", decode(col("text"), "UTF-8"))
    assert(back.filter(col("doc_id") < 10L && col("text") === "REPLACED").count() ==
      up.count())
    assert(back.count() == docs.count())
  }
}
