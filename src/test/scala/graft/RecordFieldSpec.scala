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

  test("zero-copy record ingest: external payload files indexed in place") {
    val docs = Tables.read(spark, sfDir, "documents")
    val extDir = Files.createTempDirectory("graft_ext_").toString
    docs.select(encode(concat_ws("\u0001", col("doc_id"), col("text")), "UTF-8").as("value"))
      .repartition(3).write.mode("overwrite").parquet(extDir)
    val extFiles = new java.io.File(extDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted.toSeq
    assert(extFiles.size == 3)

    val loc = freshLoc()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("body", org.apache.spark.sql.types.BinaryType)))
    val ds = SpaceDataset.create(spark, loc, schema, Seq("doc_id"), Seq("body"))
    RecordLoader.loadRecordParquet(spark, ds, "body", extFiles, Map(
      "doc_id" -> expr("CAST(split(decode(value, 'UTF-8'), '\u0001', 2)[0] AS BIGINT)")))

    // payloads were NOT copied: no record data files under the table,
    // record manifest points at the external paths
    val recDir = new java.io.File(loc, "data/records")
    val copied = Option(recDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    assert(copied.isEmpty, s"payloads copied: ${copied.map(_.getName).toSeq}")
    val manifestFiles = ds.recordManifest().select("_FILE")
      .collect().map(_.getString(0)).toSet
    assert(manifestFiles == extFiles.toSet)

    // roundtrip: stitched payloads decode to the original text
    val back = ds.readAll()
      .select(col("doc_id"), expr("split(decode(body, 'UTF-8'), '\u0001', 2)[1]").as("text"))
    val exp = docs.select(col("doc_id"), col("text"))
    assert(back.count() == exp.count())
    assert(back.exceptAll(exp).isEmpty && exp.exceptAll(back).isEmpty)

    // random access works over external record files too
    val ra = new RandomAccessReader(ds, "body")
    assert(ra.length == docs.count())
    val one = new String(ra.get(0), "UTF-8")
    assert(one.contains("\u0001"))
  }

  test("migrates a pre-addressed payload layout (ArrayRecord export shape)") {
    // Synthetic stand-in for an existing Space dataset (README
    // "Migrating an existing Space dataset"): payloads live in external
    // per-file stores where a record's identity is (file, row-position)
    // — exactly the ArrayRecord address model — and the index rows carry
    // the address struct, as a reference_read export would.
    val docs = Tables.read(spark, sfDir, "documents").limit(200)
    val store = Files.createTempDirectory("graft_ar_store_").toString
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("value"))
      .repartition(4).write.mode("overwrite").parquet(store)

    // the "exported" index: (doc_id, addr{_FILE,_ROW_ID}) derived from
    // the store's physical layout — no payload bytes in it
    val addressed = spark.read.parquet(store)
      .select(col("doc_id"),
        struct(col("_metadata.file_path").as("_FILE"),
          col("_metadata.row_index").as("_ROW_ID")).as("addr"))

    // migration step 2: one distributed join of addresses to payload
    // bytes on (_FILE, _ROW_ID) — the bulk copy, O(payload bytes), no
    // driver materialization
    val bytesByPos = spark.read.parquet(store)
      .select(col("_metadata.file_path").as("_FILE"),
        col("_metadata.row_index").as("_ROW_ID"), col("value"))
    val fetched = addressed
      .join(bytesByPos, col("addr._FILE") === col("_FILE") &&
        col("addr._ROW_ID") === col("_ROW_ID"))
      .select(col("doc_id"), col("value").as("body"))

    // migration step 3: append into a record-field table — the engine
    // writes record-Parquet and fresh addresses itself
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, fetched.schema, Seq("doc_id"),
      recordFields = Seq("body"))
    ds.append(fetched)

    val back = ds.readAll().select(col("doc_id"),
      decode(col("body"), "UTF-8").as("text"))
    val exp = docs.select(col("doc_id"), col("text"))
    assert(back.count() == exp.count())
    assert(back.exceptAll(exp).isEmpty && exp.exceptAll(back).isEmpty)
    // and the migrated table serves random access like any native one
    val ra = new RandomAccessReader(ds, "body")
    assert(ra.length == docs.count())
  }

  test("field serializer: payloads encoded on write, decoded on read and random access") {
    graft.format.SerializerRegistry.register("xor-test", new XorSerializer)
    val docs = docsBinary.filter(col("doc_id") < 100L)
    val loc = freshLoc()
    // schema carries the serializer marker on the record field
    val schema = org.apache.spark.sql.types.StructType(
      docs.schema.fields.map { f =>
        if (f.name == "text") graft.format.ExtTypes.serializedField("text", "xor-test")
        else f
      })
    val ds = SpaceDataset.create(spark, loc, schema, Seq("doc_id"), Seq("text"))
    ds.append(docs)

    // logical read round-trips through the codec
    val back = ds.readAll().withColumn("text", decode(col("text"), "UTF-8"))
    val exp = Tables.read(spark, sfDir, "documents").filter(col("doc_id") < 100L)
    assert(back.exceptAll(exp).isEmpty && exp.exceptAll(back).isEmpty)

    // on-disk record bytes are the ENCODED form, not the raw payload
    val recDir = new java.io.File(s"$loc/data/records")
    val rawOnDisk = spark.read.parquet(recDir.listFiles().map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("value").limit(1).collect()(0).getAs[Array[Byte]](0)
    val plainTexts = exp.select("text").collect().map(_.getString(0)).toSet
    assert(!plainTexts.contains(new String(rawOnDisk, "UTF-8")),
      "record file stores raw payloads; serializer was not applied on write")
    assert(plainTexts.contains(new String(new XorSerializer().deserialize(rawOnDisk), "UTF-8")))

    // random access decodes too
    val ra = new RandomAccessReader(ds, "text")
    assert(plainTexts.contains(new String(ra.get(0), "UTF-8")))
  }

  test("File-typed column resolves relative paths against the directory prefix on read") {
    import org.apache.spark.sql.types._
    import graft.format.ExtTypes
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      ExtTypes.fileField("img", "/data/images"),
      StructField("plain", StringType)))
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, schema, Seq("id"))
    ds.append(spark.createDataFrame(
      Seq((1L, "a/x.png", "a"), (2L, "/abs/y.png", "b"), (3L, null, "c"))
        .toDF("id", "img", "plain").rdd, schema))

    // default read: stored (relative) values untouched
    val raw = ds.readAll().orderBy("id").select("img").collect().map(_.getString(0))
    assert(raw.toSeq == Seq("a/x.png", "/abs/y.png", null))

    // resolveFilePaths: relative → directory-prefixed, absolute passes
    // through (os.path.join semantics, files.py:62-64), null stays null,
    // non-File columns untouched
    val resolved = ds.read(resolveFilePaths = true).orderBy("id")
      .select("img", "plain").collect()
    assert(resolved.map(_.getString(0)).toSeq ==
      Seq("/data/images/a/x.png", "/abs/y.png", null))
    assert(resolved.map(_.getString(1)).toSeq == Seq("a", "b", "c"))

    // the marker survives the table's schema round-trip
    val reloaded = SpaceDataset.load(spark, loc)
    assert(ExtTypes.isFile(reloaded.schema("img")))
    assert(ExtTypes.fileDirectory(reloaded.schema("img")).contains("/data/images"))
    assert(ExtTypes.fullPath(reloaded.schema("img"), "z.png") == "/data/images/z.png")
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

/** Trivially invertible codec for the serializer-wiring spec. */
class XorSerializer extends graft.format.FieldSerializer {
  private def xor(b: Array[Byte]): Array[Byte] = b.map(x => (x ^ 0x5a).toByte)
  def serialize(value: Array[Byte]): Array[Byte] = xor(value)
  def deserialize(bytes: Array[Byte]): Array[Byte] = xor(bytes)
}
