package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ConcurrentCommitException, Storage}
import graft.format._

class FormatSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("payload", BinaryType)))

  private def tmpTable(): String =
    Files.createTempDirectory("graft_fmt_").toString + "/tbl"

  test("create + load roundtrip preserves schema, pks, record fields") {
    val loc = tmpTable()
    Storage.create(loc, schema, Seq("id"), Seq("payload"))
    val st = Storage.load(loc)
    assert(st.primaryKeys == Seq("id"))
    assert(st.recordFields == Seq("payload"))
    assert(st.schema.fieldNames.toSeq == Seq("id", "name", "tags", "payload"))
    assert(st.metadata.currentSnapshotId == 0L)
    assert(st.metadata.currentSnapshot.manifestFiles.indexManifestFiles.isEmpty)
  }

  test("field ids assigned depth-first with list-element gap") {
    val withIds = FieldIds.assign(StructType(Seq(
      StructField("a", LongType),
      StructField("b", ArrayType(StringType)),
      StructField("c", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType)))),
      StructField("d", StringType))))
    assert(FieldIds.fieldId(withIds("a")) == 0)
    assert(FieldIds.fieldId(withIds("b")) == 1) // element consumes id 2
    assert(FieldIds.fieldId(withIds("c")) == 3)
    val c = withIds("c").dataType.asInstanceOf[StructType]
    assert(FieldIds.fieldId(c("x")) == 4)
    assert(FieldIds.fieldId(c("y")) == 5)
    assert(FieldIds.fieldId(withIds("d")) == 6)
  }

  test("schema validation rejects bad pk / record field configs") {
    intercept[IllegalArgumentException] {
      SchemaValidation.validate(schema, Nil, Nil)
    }
    intercept[IllegalArgumentException] {
      SchemaValidation.validate(schema, Seq("missing"), Nil)
    }
    intercept[IllegalArgumentException] {
      SchemaValidation.validate(schema, Seq("tags"), Nil) // nested type pk
    }
    intercept[IllegalArgumentException] {
      SchemaValidation.validate(schema, Seq("id"), Seq("name")) // non-binary record
    }
    intercept[IllegalArgumentException] {
      SchemaValidation.validate(schema, Seq("payload"), Seq("payload")) // record pk
    }
  }

  test("commit applies manifest patch and advances snapshot") {
    val loc = tmpTable()
    val st = Storage.create(loc, schema, Seq("id"))
    val s1 = st.commit(Patch(
      addedIndexManifests = List("metadata/index_manifest_a.parquet"),
      statsDelta = StorageStatistics(numRows = 10)))
    assert(s1 == 1L)
    assert(st.metadata.currentSnapshotId == 1L)
    assert(st.metadata.currentSnapshot.manifestFiles.indexManifestFiles ==
      List("metadata/index_manifest_a.parquet"))
    assert(st.metadata.currentSnapshot.storageStatistics.numRows == 10)

    val s2 = st.commit(Patch(
      addedIndexManifests = List("metadata/index_manifest_b.parquet"),
      removedIndexManifests = List("metadata/index_manifest_a.parquet"),
      statsDelta = StorageStatistics(numRows = -4)))
    assert(st.metadata.currentSnapshot.manifestFiles.indexManifestFiles ==
      List("metadata/index_manifest_b.parquet"))
    assert(st.metadata.currentSnapshot.storageStatistics.numRows == 6)
    // time travel: snapshot 1 still sees manifest a
    assert(st.snapshotOrFail(1L).manifestFiles.indexManifestFiles ==
      List("metadata/index_manifest_a.parquet"))
    assert(st.orderedSnapshotIds(0L, s2) == Seq(1L, 2L))
    // reload from disk sees the same state
    val st2 = Storage.load(loc)
    assert(st2.metadata.currentSnapshotId == 2L)
  }

  test("removing a non-present manifest fails") {
    val loc = tmpTable()
    val st = Storage.create(loc, schema, Seq("id"))
    intercept[IllegalArgumentException] {
      st.commit(Patch(removedIndexManifests = List("metadata/nope.parquet")))
    }
  }

  test("tags and branches resolve and move correctly") {
    val loc = tmpTable()
    val st = Storage.create(loc, schema, Seq("id"))
    st.commit(Patch(addedIndexManifests = List("m1")))
    st.addTag("v1")
    st.commit(Patch(addedIndexManifests = List("m2")))
    assert(st.versionToSnapshotId("v1") == 1L)
    assert(st.versionToSnapshotId("main") == 2L)

    st.addBranch("dev") // at snapshot 2
    val s3 = st.commit(Patch(addedIndexManifests = List("m3")), branch = "dev")
    assert(st.branchHead("dev") == s3)
    assert(st.metadata.currentSnapshotId == 2L) // main unmoved
    // dev sees m3, main does not
    assert(st.snapshotOrFail(s3).manifestFiles.indexManifestFiles.contains("m3"))
    assert(!st.metadata.currentSnapshot.manifestFiles.indexManifestFiles.contains("m3"))

    intercept[IllegalArgumentException](st.addTag("v1"))
    st.removeRef("v1")
    intercept[IllegalArgumentException](st.versionToSnapshotId("v1"))

    val vs = st.versions
    assert(vs.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("typed ref removal checks type, existence, and main-branch guard") {
    val loc = tmpTable()
    val st = Storage.create(loc, schema, Seq("id"))
    st.commit(Patch(addedIndexManifests = List("m1")))
    st.addTag("v1")
    st.addBranch("dev")

    // wrong-type removals fail and leave the refs intact (storage.py:298-307)
    intercept[IllegalArgumentException](st.removeBranch("v1"))
    intercept[IllegalArgumentException](st.removeTag("dev"))
    intercept[IllegalArgumentException](st.removeTag("nope"))
    intercept[IllegalArgumentException](st.removeBranch("main"))
    assert(st.versionToSnapshotId("v1") == 1L)
    assert(st.branchHead("dev") == 1L)

    st.removeTag("v1")
    st.removeBranch("dev")
    intercept[IllegalArgumentException](st.versionToSnapshotId("v1"))
    intercept[IllegalArgumentException](st.versionToSnapshotId("dev"))
  }

  test("transaction aborts when the branch head moves") {
    val loc = tmpTable()
    val st = Storage.create(loc, schema, Seq("id"))
    intercept[ConcurrentCommitException] {
      st.transaction() { _ =>
        // concurrent writer sneaks in a commit through a second handle
        Storage.load(loc).commit(Patch(addedIndexManifests = List("mx")))
        (Some(Patch(addedIndexManifests = List("my"))), ())
      }
    }
    st.reload()
    assert(st.metadata.currentSnapshot.manifestFiles.indexManifestFiles == List("mx"))
  }

  test("changelog with roaring bitmap roundtrips through JSON") {
    val loc = tmpTable()
    val st = Storage.create(loc, schema, Seq("id"))
    val bm = new org.roaringbitmap.RoaringBitmap()
    bm.add(1L, 5L) // rows [1,5)
    val buf = java.nio.ByteBuffer.allocate(bm.serializedSizeInBytes())
    bm.serialize(buf)
    val b64 = java.util.Base64.getEncoder.encodeToString(buf.array())
    val cl = ChangeLog(
      addedRows = List(RowBitmap("data/index_x.parquet", allRows = true, numRows = 7)),
      deletedRows = List(RowBitmap("data/index_y.parquet", allRows = false, numRows = 4, Some(b64))))
    val sid = st.commit(Patch(changeLog = Some(cl)))
    val back = st.changeLog(sid).get
    assert(back.addedRows.head.allRows && back.addedRows.head.numRows == 7)
    val bm2 = new org.roaringbitmap.RoaringBitmap()
    bm2.deserialize(java.nio.ByteBuffer.wrap(
      java.util.Base64.getDecoder.decode(back.deletedRows.head.bitmapB64.get)))
    assert(bm2.getCardinality == 4 && bm2.contains(1) && bm2.contains(4) && !bm2.contains(5))
    assert(st.changeLog(0L).isEmpty)
  }

  test("metadata without the logicalPlanSubstrait key still parses (pre-round-5 files)") {
    val loc = tmpTable()
    val st = Storage.create(loc, schema, Seq("id"))
    val json = MetadataJson.write(st.metadata)
    // fresh non-MV metadata must not even serialize the absent option —
    // i.e. pre-round-5 files and new files are byte-compatible
    assert(!json.contains("logicalPlanSubstrait"))
    val meta = MetadataJson.readMetadata(json)
    assert(meta.logicalPlanSubstrait.isEmpty && meta.currentSnapshotId == 0L)
    // and a populated sidecar round-trips
    val withPlan = st.metadata.copy(logicalPlanSubstrait = Some("AAEC"))
    assert(MetadataJson.readMetadata(MetadataJson.write(withPlan))
      .logicalPlanSubstrait.contains("AAEC"))
  }
}
