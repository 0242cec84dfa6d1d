package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Schema evolution: metadata-only ADD COLUMN, null-fill on old files,
  * field-id continuity, catalog ALTER TABLE, and CDC across the
  * evolution boundary. */
class EvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private val kvSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType)))

  private def kv(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("added column null-fills old files and carries a fresh field id") {
    val loc = Files.createTempDirectory("graft_evo_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, kvSchema, Seq("id"))
    ds.append(kv(1L -> "a", 2L -> "b"))
    val idsBefore = ds.schema.fields.map(graft.format.FieldIds.fieldId).toSet

    ds.addColumn("score", DoubleType)
    val f = ds.schema.fields.find(_.name == "score").get
    assert(f.nullable)
    assert(!idsBefore.contains(graft.format.FieldIds.fieldId(f)), "field ids never reuse")

    // old rows null-fill; new append populates
    import spark.implicits._
    ds.append(Seq((3L, "c", 0.5)).toDF("id", "v", "score"))
    val got = ds.readAll().collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.5))))

    // filters on the evolved column plan and run (old files scan as null)
    assert(ds.readAll().filter(col("score") > 0.1).count() == 1)
    // PK pruning still sound after evolution
    assert(ds.read(filter = Some(col("id") === 3L)).count() == 1)
  }

  test("rejects duplicates and non-nullable adds; CDC spans the boundary") {
    val loc = Files.createTempDirectory("graft_evo2_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, kvSchema, Seq("id"))
    ds.append(kv(1L -> "a"))
    intercept[IllegalArgumentException] { ds.addColumn("v", StringType) }
    intercept[IllegalArgumentException] {
      ds.storage.addColumn(StructField("x", LongType, nullable = false))
    }

    ds.addColumn("score", DoubleType)
    import spark.implicits._
    ds.append(Seq((2L, "b", 1.5)).toDF("id", "v", "score"))
    // diff across the evolution boundary: both ADD batches read with the
    // evolved schema (old batch null-fills)
    val batches = ds.diff("0", "2")
    assert(batches.map(_.changeType) == Seq("ADD", "ADD"))
    assert(batches.forall(_.data.schema.fieldNames.contains("score")))
    val first = batches.head.data.collect()
    assert(first.length == 1 && first(0).isNullAt(first(0).fieldIndex("score")))
  }

  test("ALTER TABLE ADD COLUMN works through the SQL catalog") {
    val root = Files.createTempDirectory("graft_evo_cat_").toString
    spark.conf.set("spark.sql.catalog.graft_evo",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_evo.location", root)
    spark.sql(
      "CREATE TABLE graft_evo.t (id BIGINT, v STRING) TBLPROPERTIES ('primary_keys'='id')")
    spark.sql("INSERT INTO graft_evo.t VALUES (1, 'a')")
    spark.sql("ALTER TABLE graft_evo.t ADD COLUMN tag STRING")
    spark.sql("INSERT INTO graft_evo.t VALUES (2, 'b', 'new')")
    val rows = spark.sql("SELECT id, tag FROM graft_evo.t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ==
      Seq((1L, None), (2L, Some("new"))))
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.t RENAME COLUMN v TO w")
    }
  }
}
