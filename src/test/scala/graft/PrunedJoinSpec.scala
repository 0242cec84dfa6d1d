package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.operators.PrunedJoin

/** Dynamic file pruning joins: the dim side's distinct keys must prune
  * fact files through the metadata layers (here: PK blooms on a
  * key-decorrelated layout) while the join result stays exactly the
  * plain inner join — including the non-point-shaped fallback, NULL dim
  * keys, and an empty dim side. */
class PrunedJoinSpec extends AnyFunSuite {
  import TestSpark._

  // vals, not defs: a re-read produces FRESH attribute ids, so
  // `li.join(dim, li("l_orderkey") === ...)` with a def evaluates `li`
  // twice and the handle condition fails analysis (MISSING_ATTRIBUTES)
  private lazy val li = Tables.read(spark, sfDir, "lineitem")
  private lazy val orders = Tables.read(spark, sfDir, "orders")

  /** Fact table in a layout DECORRELATED from the join key, so only
    * the PK blooms can prune the key IN list. */
  private def factTable(): SpaceDataset = {
    val ds = SpaceDataset.create(spark,
      Files.createTempDirectory("graft_pjoin_").toString + "/tbl",
      li.schema, Seq("l_orderkey", "l_linenumber"))
    ds.append(li.repartitionByRange(8,
      xxhash64(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))))
    ds
  }

  private def sameRows(a: DataFrame, b: DataFrame, hint: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$hint: join mismatch")

  private def project(df: DataFrame): DataFrame =
    df.select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"),
      col("o_totalprice"))

  test("point-shaped dim prunes fact files; result equals the plain join") {
    val ds = factTable()
    // a GENUINELY point-shaped dim (2 keys -> ~9 fact rows over 8
    // files) so at least one file provably holds no match and the
    // blooms must drop it; a wider key set scatters a row into every
    // file and "kept 8/8" is then CORRECT, not a pruning failure
    // (that was r8's unsound assertion)
    val dim = orders.filter(col("o_orderkey").isin(3L, 411L))
      .select(col("o_orderkey"), col("o_totalprice"))
    val keys = dim.select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(keys.nonEmpty && keys.size <= 1024)

    val all = ds.plan().files.size
    val kept = ds.plan(Some(col("l_orderkey").isInCollection(keys))).files.size
    assert(all == 8, s"expected 8 fact files, got $all")
    assert(kept < all, s"key IN list should bloom-prune, kept $kept/$all")

    val got = project(PrunedJoin.inner(spark, ds, "l_orderkey", dim, "o_orderkey"))
    val exp = project(li.join(dim, li("l_orderkey") === dim("o_orderkey")))
    sameRows(got, exp, "pruned path")
  }

  test("non-point-shaped dim falls back to a plain join, still exact") {
    val ds = factTable()
    val dim = orders.select(col("o_orderkey"), col("o_totalprice"))
    val got = project(PrunedJoin.inner(spark, ds, "l_orderkey", dim, "o_orderkey",
      maxKeys = 16))
    val exp = project(li.join(dim, li("l_orderkey") === dim("o_orderkey")))
    sameRows(got, exp, "fallback path")
  }

  test("NULL dim keys never match; all-NULL dim yields the empty join") {
    val ds = factTable()
    import spark.implicits._
    val mixed = Seq((Some(1L), 1.0), (None: Option[Long], 2.0))
      .toDF("o_orderkey", "o_totalprice")
    val got = PrunedJoin.inner(spark, ds, "l_orderkey", mixed, "o_orderkey")
    val expCount = li.filter(col("l_orderkey") === 1L).count()
    assert(got.count() == expCount)

    val allNull = Seq((None: Option[Long], 2.0)).toDF("o_orderkey", "o_totalprice")
    assert(PrunedJoin.inner(spark, ds, "l_orderkey", allNull, "o_orderkey").count() == 0L)
  }

  test("point-form key-lookup prefilter prunes the upsert/delete candidate scan") {
    val ds = factTable()
    val keys = li.select(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).limit(3)
    // small key set -> exact per-column IN lists -> blooms prune even
    // on this key-decorrelated layout (the old min/max box kept all 8)
    val pred = DmlOps.keyLookupPredicate(spark, keys, ds.storage, ds.storage.primaryKeys)
    assert(pred.isDefined)
    val kept = ReadOp.plan(spark, ds.storage,
      ds.storage.metadata.currentSnapshotId, pred).files.size
    assert(kept < 8, s"3-key lookup kept $kept of 8 files")

    // and the op built on it stays exact: upsert 3 rewritten rows
    val bumped = li.join(keys, Seq("l_orderkey", "l_linenumber"), "left_semi")
      .withColumn("l_quantity", col("l_quantity") + 100)
    ds.upsert(bumped)
    assert(ds.readAll().join(keys, Seq("l_orderkey", "l_linenumber"), "left_semi")
      .filter(col("l_quantity") <= 100).count() == 0L)
    assert(ds.readAll().count() == li.count())
  }
}
