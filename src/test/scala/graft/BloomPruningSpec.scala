package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** File-level bloom pruning: point predicates on bloom-carrying columns
  * must drop files whose embedded parquet blooms prove the value
  * absent — on an arbitrary (stats-useless) layout — while every kept
  * answer stays exactly correct and bloom-less files stay scanned. */
class BloomPruningSpec extends AnyFunSuite {
  import TestSpark._

  private def freshLoc(p: String): String =
    Files.createTempDirectory(s"graft_$p").toString + "/tbl"

  private def docs = Tables.read(spark, sfDir, "documents")

  /** Documents table written in a layout DECORRELATED from doc_id
    * (ordered by a hash of the text), so doc_id min/max spans every
    * file and stats pruning is useless — the bloom's home turf. */
  private def shuffledDocs(nFiles: Int): SpaceDataset = {
    val ds = SpaceDataset.create(spark, freshLoc("bloom"),
      docs.schema, Seq("doc_id"))
    ds.append(docs.repartitionByRange(nFiles, xxhash64(col("text"))))
    ds
  }

  test("PK point lookup prunes files on a stats-useless layout") {
    val ds = shuffledDocs(8)
    val all = ds.plan().files.size
    assert(all == 8)
    val p = ds.plan(Some(col("doc_id") === 41L))
    assert(p.files.size < all / 2,
      s"bloom should drop most of the $all files, kept ${p.files.size}")
    val rows = ds.read(filter = Some(col("doc_id") === 41L)).collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("doc_id") == 41L)
  }

  test("absent value prunes everything; result is exactly empty") {
    val ds = shuffledDocs(8)
    val p = ds.plan(Some(col("doc_id") === 99999999L))
    assert(p.files.isEmpty, s"kept ${p.files.size} files for an absent key")
    assert(ds.read(filter = Some(col("doc_id") === 99999999L)).count() == 0L)
  }

  test("IN list keeps the union of matching files, prunes the rest") {
    val ds = shuffledDocs(8)
    val keys = Seq(3L, 41L, 107L)
    val p = ds.plan(Some(col("doc_id").isin(keys: _*)))
    assert(p.files.size <= keys.size, s"kept ${p.files.size}")
    val got = ds.read(filter = Some(col("doc_id").isin(keys: _*)))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == keys.sorted)
  }

  test("bloom-less files (writes opted out) are conservatively kept") {
    spark.conf.set("spark.graft.pkBloomFilters", "false")
    val ds = try shuffledDocs(8)
    finally spark.conf.unset("spark.graft.pkBloomFilters")
    BloomPruning.clearCache()
    val p = ds.plan(Some(col("doc_id") === 41L))
    assert(p.files.size == 8, s"no blooms -> no pruning, kept ${p.files.size}")
    assert(ds.read(filter = Some(col("doc_id") === 41L)).count() == 1L)
  }

  test("bloom_columns property adds blooms on a non-key column; SQL point read prunes") {
    val root = Files.createTempDirectory("graft_bloomsql_").toString
    spark.conf.set("spark.sql.catalog.graft_bloom",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_bloom.location", root)
    spark.sql("CREATE TABLE graft_bloom.t (id BIGINT, fp STRING, v DOUBLE) " +
      "TBLPROPERTIES ('primary_keys'='id', 'bloom_columns'='fp')")
    spark.sql("INSERT INTO graft_bloom.t " +
      "SELECT id, concat('fp-', md5(CAST(id AS STRING))), id * 1.0 FROM range(0, 4000)")
    val ds = SpaceDataset.load(spark, s"$root/t")
    // fingerprint of one known row: high-cardinality, layout-independent
    val fp = ds.readAll().filter(col("id") === 1234L).select("fp").collect()(0).getString(0)
    val all = ds.plan().files.size
    val p = ds.plan(Some(col("fp") === fp))
    assert(all >= 2, s"need a multi-file table, got $all")
    assert(p.files.size < all, s"bloom on fp should prune, kept ${p.files.size}/$all")
    val viaSql = spark.sql(s"SELECT id FROM graft_bloom.t WHERE fp = '$fp'").collect()
    assert(viaSql.map(_.getLong(0)).toSeq == Seq(1234L))
    // property surface reports the bloom columns
    val shown = spark.sql("SHOW TBLPROPERTIES graft_bloom.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown("bloom_columns") == "fp")
  }

  test("bloom column validation: missing, record-field and bad-type columns rejected") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("arr", ArrayType(LongType))))
    intercept[IllegalArgumentException] {
      SpaceDataset.create(spark, freshLoc("bv"), schema, Seq("id"), bloomColumns = Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      SpaceDataset.create(spark, freshLoc("bv"), schema, Seq("id"),
        recordFields = Seq("payload"), bloomColumns = Seq("payload"))
    }
    intercept[IllegalArgumentException] {
      SpaceDataset.create(spark, freshLoc("bv"), schema, Seq("id"), bloomColumns = Seq("arr"))
    }
  }

  test("manifest evidence markers: evidence-less files plan with ZERO footer opens") {
    // high-NDV long PKs overflow parquet's 1MB dictionary page (plain
    // encoding, no dictionary evidence) and blooms are opted out, so
    // the write marks every file evidence-less in the manifest — a
    // point-read plan must then touch NO data-file footer at all
    spark.conf.set("spark.graft.pkBloomFilters", "false")
    val ds = try {
      val rows = spark.range(0, 300000).selectExpr("id AS k", "CAST(id AS STRING) AS tag")
      val d = SpaceDataset.create(spark, freshLoc("evid"), rows.schema, Seq("k", "tag"))
      // scatter so min/max stats cannot falsify the probe on their own
      d.append(rows.repartitionByRange(4, org.apache.spark.sql.functions.xxhash64(col("tag"))))
      d
    } finally spark.conf.unset("spark.graft.pkBloomFilters")
    BloomPruning.clearCache()
    val before = BloomPruning.footerOpens.get()
    val p = ds.plan(Some(col("k") === 123456L))
    assert(p.files.size == 4, s"no evidence -> no pruning, kept ${p.files.size}")
    assert(BloomPruning.footerOpens.get() == before,
      s"evidence-less files must plan metadata-only, opened " +
        s"${BloomPruning.footerOpens.get() - before} footers")
    // the read itself is still exact
    assert(ds.read(filter = Some(col("k") === 123456L)).count() == 1L)
    // the Catalyst path consults the same markers
    val before2 = BloomPruning.footerOpens.get()
    assert(ds.readAll().filter(col("k") === 123456L).count() == 1L)
    assert(BloomPruning.footerOpens.get() == before2)
  }

  test("files WITH evidence still probe and prune (markers never disable pruning)") {
    val ds = shuffledDocs(8)
    BloomPruning.clearCache()
    val before = BloomPruning.footerOpens.get()
    val p = ds.plan(Some(col("doc_id") === 41L))
    assert(p.files.size < 8)
    assert(BloomPruning.footerOpens.get() > before,
      "evidence-marked files must have been probed through their footers")
  }

  test("CoW delete keeps blooms effective on the rewritten survivors") {
    val ds = shuffledDocs(8)
    ds.delete(col("doc_id") % 2 === 0L)
    BloomPruning.clearCache()
    val odd = 41L
    val p = ds.plan(Some(col("doc_id") === odd))
    assert(p.files.size <= 2, s"kept ${p.files.size} after rewrite")
    assert(ds.read(filter = Some(col("doc_id") === odd)).count() == 1L)
    // the deleted key is gone AND its files are pruned or empty
    assert(ds.read(filter = Some(col("doc_id") === 42L)).count() == 0L)
  }
}
