package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

class StorageSpec extends AnyFunSuite {
  import TestSpark._

  private def freshLoc(): String =
    Files.createTempDirectory("graft_ds_").toString + "/tbl"

  private def lineitem = Tables.read(spark, sfDir, "lineitem")
  private def orders = Tables.read(spark, sfDir, "orders")

  test("append + read_all roundtrips lineitem") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, lineitem.schema,
      primaryKeys = Seq("l_orderkey", "l_linenumber"))
    ds.append(lineitem)
    val back = ds.readAll()
    assert(back.count() == lineitem.count())
    assert(back.schema.fieldNames.toSeq == lineitem.schema.fieldNames.toSeq)
    // spot-check content equality via anti-joins both ways
    assert(back.exceptAll(lineitem).isEmpty)
    assert(lineitem.exceptAll(back).isEmpty)
  }

  test("filtered read with manifest pruning skips files") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    // write ordered by PK so per-file min/max ranges are disjoint
    ds.append(orders.repartitionByRange(8, col("o_orderkey")))
    val pred = col("o_orderkey") < 1000L
    val plan = ds.plan(Some(pred))
    assert(plan.totalFiles == 8)
    assert(plan.files.size < plan.totalFiles,
      s"expected pruning, kept ${plan.files.size}/${plan.totalFiles}")
    val got = ds.read(filter = Some(pred))
    val exp = orders.filter(pred)
    assert(got.count() == exp.count())
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("pruning is conservative for OR / NOT / unsupported predicates") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.repartitionByRange(4, col("o_orderkey")))
    for (pred <- Seq(
        col("o_orderkey") < 100L || col("o_orderkey") > 5000L,
        !(col("o_orderkey") >= 100L),
        col("o_orderkey") < 100L && col("o_orderstatus") === "F", // non-PK side ignored
        upper(col("o_orderstatus")) === "F")) { // unconvertible → scan all
      val got = ds.read(filter = Some(pred)).count()
      val exp = orders.filter(pred).count()
      assert(got == exp, s"pred $pred: $got vs $exp")
    }
  }

  test("many-file append uses the distributed footer harvest") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    // 16 part files > the driver-loop threshold → harvest+rename runs as
    // a Spark job (the scale path for thousands-of-files appends)
    ds.append(orders.repartitionByRange(16, col("o_orderkey")))
    assert(ds.indexManifest().count() == 16)
    val back = ds.readAll()
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    // stats survived the distributed harvest: pruning still works
    val plan = ds.plan(Some(col("o_orderkey") < 500L))
    assert(plan.files.size < plan.totalFiles)
  }

  test("nested stats fields prune on struct-member filters (API and SQL paths)") {
    val loc = freshLoc()
    val nested = orders.select(col("o_orderkey"), struct(
      col("o_orderstatus").as("status"), col("o_totalprice").as("price")).as("meta"))
    val ds = SpaceDataset.create(spark, loc, nested.schema, Seq("o_orderkey"),
      statsFields = Seq("meta.price"))
    ds.append(nested.repartitionByRange(8, col("meta.price")))

    val pred = col("meta.price") > 400000.0
    val plan = ds.plan(Some(pred))
    assert(plan.prunedFiles > 0 && plan.files.size < plan.totalFiles,
      s"nested stats kept all ${plan.totalFiles} files")
    // pruned read returns exactly the full-filter rows (soundness)
    assert(ds.read(filter = Some(pred)).count() == nested.filter(pred).count())

    // SQL path: the relation-backed view hands Catalyst dataFilters (a
    // GetStructField tree) to GraftFileIndex — fewer files are READ
    ds.createOrReplaceTempView("nested_stats_t")
    val df = spark.sql(
      "SELECT o_orderkey FROM nested_stats_t WHERE meta.price > 400000.0")
    assert(df.count() == nested.filter(pred).count())
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.get
    assert(scan.metrics("numFiles").value < 8,
      s"SQL scan read ${scan.metrics("numFiles").value} of 8 files")
  }

  test("append_from: four sources land in one snapshot with one changelog") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    val before = ds.storage.metadata.currentSnapshotId
    val sources = (0 until 4).map { i =>
      () => orders.filter(col("o_orderkey") % 4 === i)
    }
    ds.appendFrom(sources)
    // exactly ONE commit for all four sources
    assert(ds.storage.metadata.currentSnapshotId == before + 1)
    val back = ds.readAll()
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    // the single changelog covers every appended row
    val cl = ds.storage.changeLog(ds.storage.metadata.currentSnapshotId).get
    assert(cl.addedRows.map(_.numRows).sum == orders.count())
    assert(cl.deletedRows.isEmpty)
  }

  test("CoW delete removes matching rows and records a changelog") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.repartitionByRange(4, col("o_orderkey")))
    val cond = col("o_totalprice") > 300000.0
    val nDeleted = orders.filter(cond).count()
    assert(nDeleted > 0)
    ds.delete(cond)
    val back = ds.readAll()
    assert(back.count() == orders.count() - nDeleted)
    assert(back.filter(cond).isEmpty)
    // survivors intact
    val exp = orders.filter(!cond)
    assert(back.exceptAll(exp).isEmpty && exp.exceptAll(back).isEmpty)
    // changelog records the deleted row count
    val cl = ds.storage.changeLog(ds.storage.metadata.currentSnapshotId).get
    assert(cl.deletedRows.map(_.numRows).sum == nDeleted)
    assert(cl.addedRows.isEmpty)
  }

  test("fused upsert/update: one write pass, one data manifest, exact CDC") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.repartitionByRange(4, col("o_orderkey")))
    def manifests: Set[String] = ds.storage
      .snapshotOrFail(ds.storage.metadata.currentSnapshotId)
      .manifestFiles.indexManifestFiles.toSet

    // UPSERT: the matched-key CoW sweep and the incoming rows land in
    // ONE write job — the commit adds exactly ONE data manifest beyond
    // the untouched-survivor carryover (two-pass minted two)
    val before = manifests
    val incoming = orders.filter(col("o_orderkey") < 500L)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    ds.upsert(incoming)
    val added = manifests -- before
    assert(added.size <= 2, // fused manifest + at most one carryover
      s"fused upsert must mint at most carryover + ONE data manifest, got ${added.size}")
    // the UPDATE encoding survives fusion: DELETE then ADD of the keys,
    // one snapshot, adds disjoint from the swept originals
    val cl = ds.storage.changeLog(ds.storage.metadata.currentSnapshotId).get
    assert(cl.deletedRows.nonEmpty && cl.addedRows.nonEmpty)
    assert(cl.addedRows.map(_.file).toSet
      .intersect(cl.deletedRows.map(_.file).toSet).isEmpty,
      "fused adds must land in files separate from the swept originals")
    assert(cl.addedRows.forall(_.allRows),
      "every fused add file is all-adds (survivors live in their own files)")
    assert(cl.addedRows.map(_.numRows).sum == incoming.count())
    assert(ds.readAll().count() == orders.count())

    // UPDATE: same fused shape through the condition-delete path
    val before2 = manifests
    ds.update(col("o_orderkey") % 11 === 3, Map("o_totalprice" -> lit(1.0)))
    assert((manifests -- before2).size <= 2,
      "fused update must mint at most carryover + ONE data manifest")
    val cl2 = ds.storage.changeLog(ds.storage.metadata.currentSnapshotId).get
    assert(cl2.deletedRows.map(_.numRows).sum == cl2.addedRows.map(_.numRows).sum,
      "UPDATE deletes and re-adds exactly the matched rows")
    assert(ds.readAll().filter(col("o_orderkey") % 11 === 3 &&
      col("o_totalprice") =!= 1.0).count() == 0)
  }

  test("delete bitmaps are built executor-side: no row-position collect in the plan") {
    // VERDICT r1 scale-killer fix: the aggregate that produces per-file
    // deletion bitmaps must fold positions into RoaringBitmaps inside the
    // executors (partial aggregation), never collect_list row ids.
    val matched = orders
      .select(
        concat(lit("file_"), col("o_orderkey") % 7).as(DmlOps.FileCol),
        (col("o_orderkey") % 10000).cast("long").as(DmlOps.RowCol))
    val agg = DmlOps.matchedBitmaps(matched)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), s"row positions collected:\n$plan")
    assert(plan.contains("RowBitmapAgg") || plan.contains("rowbitmapagg"),
      s"expected the bitmap aggregator in the plan:\n$plan")
    // and the bitmaps are correct
    val got = agg.collect().map { r =>
      r.getString(0) -> DmlOps.deserializeBitmapBytes(r.getAs[Array[Byte]](1))
    }.toMap
    val exp = orders.select((col("o_orderkey") % 7).as("f"), (col("o_orderkey") % 10000).as("r"))
      .collect().groupBy(r => s"file_${r.getLong(0)}")
    assert(got.keySet == exp.keySet)
    exp.foreach { case (f, rows) =>
      val positions = rows.map(_.getLong(1).toInt).toSet
      assert(got(f).getLongCardinality == positions.size)
      positions.foreach(p => assert(got(f).contains(p), s"missing $p in $f"))
    }
  }

  test("delete is a no-op when nothing matches") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders)
    val before = ds.storage.metadata.currentSnapshotId
    ds.delete(col("o_totalprice") > 1e12)
    assert(ds.storage.metadata.currentSnapshotId == before) // no commit
  }

  test("composite-PK key-range pruning uses every PK column, not just the head") {
    val loc = freshLoc()
    // the synthetic lineitem is NOT unique on (l_orderkey, l_linenumber);
    // dedup to a valid composite-PK corpus first
    val li = lineitem.dropDuplicates("l_orderkey", "l_linenumber")
    val ds = SpaceDataset.create(spark, loc, li.schema,
      primaryKeys = Seq("l_orderkey", "l_linenumber"))
    // layout disjoint in the SECOND key: a head-only (l_orderkey) range
    // covers every file, so any pruning observed must come from the
    // l_linenumber range (VERDICT r4 item 6)
    ds.append(li.repartitionByRange(8, col("l_linenumber")))
    val keys = li.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_linenumber"))
    val pred = DmlOps.keyRangePredicate(spark, keys, ds.storage)
    assert(pred.nonEmpty)
    val p = ds.plan(pred)
    assert(p.totalFiles >= 4)
    assert(p.prunedFiles > 0,
      s"composite key range kept all ${p.totalFiles} files — second-key pruning lost")
    // end-to-end: the upsert that rides this pruning still replaces
    // exactly the keyed rows
    val modified = li.filter(col("l_linenumber") === 1)
      .withColumn("l_quantity", col("l_quantity") + 1000.0)
    ds.upsert(modified)
    val back = ds.readAll()
    assert(back.count() == li.count())
    assert(back.filter(col("l_linenumber") === 1 && col("l_quantity") <= 1000.0).isEmpty)
    assert(back.filter(col("l_linenumber") =!= 1 && col("l_quantity") > 1000.0).isEmpty)
  }

  test("written data files carry bloom filters on the primary key") {
    import scala.jdk.CollectionConverters._
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.repartitionByRange(4, col("o_orderkey")))
    val conf = spark.sparkContext.hadoopConfiguration
    val file = ds.indexFiles().head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(ds.storage.absolute(file)), conf))
    try {
      val rg = reader.getFooter.getBlocks.get(0)
      val chunk = rg.getColumns.asScala
        .find(_.getPath.toDotString == "o_orderkey").get
      assert(chunk.getBloomFilterOffset > 0, "no bloom filter on the PK chunk")
      assert(reader.getBloomFilterDataReader(rg).readBloomFilter(chunk) != null)
      // non-PK columns don't pay for one
      val other = rg.getColumns.asScala
        .find(_.getPath.toDotString == "o_orderstatus").get
      assert(other.getBloomFilterOffset <= 0)
    } finally reader.close()
    // point lookup through the bloom-equipped scan stays correct
    val k = orders.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    assert(ds.read(filter = Some(col("o_orderkey") === k)).count() ==
      orders.filter(col("o_orderkey") === k).count())
  }

  test("RowBitmapAgg refuses row positions beyond 2^31-1 loudly") {
    // a silent toInt wrap would corrupt delete bitmaps (VERDICT r4 item 7)
    val agg = new RowBitmapAgg
    val b = agg.zero
    agg.reduce(b, 5L)
    assert(b.contains(5))
    val e = intercept[IllegalArgumentException](
      agg.reduce(b, Int.MaxValue.toLong + 1))
    assert(e.getMessage.contains("row position"))
  }

  test("insert rejects duplicate PKs, upsert replaces them") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    val base = orders.filter(col("o_orderkey") % 10 =!= 0)
    val rest = orders.filter(col("o_orderkey") % 10 === 0)
    ds.append(base)

    // inserting fresh keys works
    ds.insert(rest)
    assert(ds.readAll().count() == orders.count())
    // re-inserting fails
    intercept[IllegalArgumentException] { ds.insert(rest.limit(5)) }

    // upsert: modify a slice, verify replacement not duplication
    val modified = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    ds.upsert(modified)
    val back = ds.readAll()
    assert(back.count() == orders.count())
    val exp = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 2).otherwise(col("o_totalprice")))
    assert(back.exceptAll(exp).isEmpty && exp.exceptAll(back).isEmpty)
  }

  test("time travel + tags + branches") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    val half = orders.filter(col("o_orderkey") <= 3000L)
    ds.append(half) // snapshot 1
    ds.addTag("v1")
    ds.append(orders.filter(col("o_orderkey") > 3000L)) // snapshot 2

    assert(ds.read(version = Some("v1")).count() == half.count())
    assert(ds.read(version = Some("1")).count() == half.count())
    assert(ds.readAll().count() == orders.count())

    ds.addBranch("exp", version = Some("v1"))
    ds.delete(col("o_orderkey") <= 1000L, branch = "exp")
    // main unaffected, branch shrunk
    assert(ds.readAll().count() == orders.count())
    val expCount = half.filter(col("o_orderkey") > 1000L).count()
    assert(ds.read(version = Some("exp")).count() == expCount)

    val vs = ds.versions().collect()
    assert(vs.length >= 4)
  }

  test("diff emits DELETE (pks only) before ADD, append/delete/upsert") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    val a = orders.filter(col("o_orderkey") <= 2000L)
    ds.append(a) // s1: ADD a
    ds.delete(col("o_orderkey") <= 1000L) // s2: DELETE
    val up = orders.filter(col("o_orderkey") > 1200L && col("o_orderkey") <= 1300L)
      .withColumn("o_totalprice", lit(1.0))
    assert(up.count() > 0)
    ds.upsert(up) // s3: DELETE old + ADD new

    val batches = ds.diff("0", ds.storage.metadata.currentSnapshotId.toString)
    val bySnap = batches.groupBy(_.snapshotId)

    // s1: single ADD batch of a
    val s1 = bySnap(1L)
    assert(s1.map(_.changeType) == Seq(ChangeType.Add))
    assert(s1.head.data.count() == a.count())

    // s2: single DELETE batch, pk-only schema
    val s2 = bySnap(2L)
    assert(s2.map(_.changeType) == Seq(ChangeType.Delete))
    assert(s2.head.data.columns.toSeq == Seq("o_orderkey"))
    assert(s2.head.data.count() == a.filter(col("o_orderkey") <= 1000L).count())

    // s3: DELETE before ADD within the snapshot
    val s3 = bySnap(3L)
    assert(s3.map(_.changeType) == Seq(ChangeType.Delete, ChangeType.Add))
    assert(s3(0).data.count() == up.count())
    assert(s3(1).data.count() == up.count())
    // replaying ADDs of s3 yields the upserted values
    assert(s3(1).data.agg(sum("o_totalprice")).collect()(0).getDouble(0) == up.count().toDouble)
  }

  test("concurrent transaction aborts cleanly") {
    val loc = freshLoc()
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.limit(100))
    val ds2 = SpaceDataset.load(spark, loc)
    intercept[ConcurrentCommitException] {
      ds.storage.transaction() { _ =>
        ds2.append(orders.limit(10).withColumn("o_orderkey", col("o_orderkey") + 1000000))
        (Some(graft.format.Patch()), ())
      }
    }
  }
}

class RollbackSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("rollback resets the head to an ancestor; history continues under fresh ids") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = java.nio.file.Files.createTempDirectory("graft_rb_").toString + "/tbl"
    val ds = core.SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.limit(100))                                      // snap 1
    ds.append(orders.limit(150).withColumn("o_orderkey",
      col("o_orderkey") + 1000000L))                                  // snap 2: bad
    assert(ds.readAll().count() == 250)

    intercept[IllegalArgumentException](ds.rollback("2"))             // already head
    ds.rollback("1")
    assert(ds.readAll().count() == 100)
    // abandoned snapshot stays time-travelable until expiry
    assert(ds.read(version = Some("2")).count() == 250)

    // next commit: parent = restored head, id continues past the
    // high-water mark (never reused)
    val newId = ds.append(orders.limit(30).withColumn("o_orderkey",
      col("o_orderkey") + 2000000L))
    assert(newId == 3L)
    assert(ds.storage.snapshotOrFail(3L).parentSnapshotId.contains(1L))
    assert(ds.readAll().count() == 130)

    // the abandoned snapshot is now expirable (not a ref, not current)
    val expired = ds.expireSnapshots(olderThanMs = -1000L, keepLast = 1)
    assert(expired.contains(2L))
    intercept[IllegalArgumentException](ds.read(version = Some("2")).count())
  }

  test("rollback rejects non-ancestors and moves only the named branch") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = java.nio.file.Files.createTempDirectory("graft_rb2_").toString + "/tbl"
    val ds = core.SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.limit(100))                                      // snap 1 (main)
    ds.addBranch("exp")
    ds.setCurrentBranch("exp")
    ds.append(orders.limit(50).withColumn("o_orderkey",
      col("o_orderkey") + 1000000L))                                  // snap 2 (exp)
    ds.setCurrentBranch("main")
    ds.append(orders.limit(80).withColumn("o_orderkey",
      col("o_orderkey") + 2000000L))                                  // snap 3 (main)

    // exp's snapshot 2 is NOT on main's chain
    intercept[IllegalArgumentException](ds.rollback("2"))

    // rolling exp back must not move main
    ds.setCurrentBranch("exp")
    ds.rollback("1")
    assert(ds.readAll().count() == 100)
    ds.setCurrentBranch("main")
    assert(ds.readAll().count() == 180)
  }

  test("overwriteWhere is one DELETE+ADD snapshot and rejects mis-scoped rows") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = java.nio.file.Files.createTempDirectory("graft_ow_").toString + "/tbl"
    val ds = core.SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.filter(col("o_orderkey") <= 200L))
    val pred = col("o_orderkey") <= 100L
    val repl = orders.filter(pred).withColumn("o_totalprice", lit(1.0))
    ds.overwriteWhere(pred, repl)
    // exactly one new snapshot, whose CDC is DELETE(old range)+ADD(new)
    assert(ds.storage.branchHead("main") == 2L)
    val batches = ds.diff("1", "2")
    assert(batches.map(_.changeType) == Seq(ChangeType.Delete, ChangeType.Add),
      batches.map(_.changeType).toString)
    assert(batches.forall(_.snapshotId == 2L))
    assert(ds.readAll().filter(pred && col("o_totalprice") =!= 1.0).count() == 0)
    // replacement rows outside the predicate are a loud error, not a
    // silent widened overwrite
    val bad = orders.filter(col("o_orderkey") > 150L && col("o_orderkey") <= 160L)
    intercept[IllegalArgumentException](ds.overwriteWhere(pred, bad))
  }

  test("countRows answers from metadata and stays exact through CoW mutation") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = java.nio.file.Files.createTempDirectory("graft_cnt_").toString + "/tbl"
    val ds = core.SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    assert(ds.countRows() == 0)
    ds.append(orders.limit(300))
    assert(ds.countRows() == 300 && ds.countRows() == ds.readAll().count())
    ds.addTag("v300")
    ds.delete(col("o_orderkey") <= 100L)
    assert(ds.countRows() == ds.readAll().count())
    ds.upsert(orders.limit(50).withColumn("o_totalprice", lit(1.0)))
    assert(ds.countRows() == ds.readAll().count())
    ds.compact(targetFileRows = 1000000L, smallFraction = 1.0)
    assert(ds.countRows() == ds.readAll().count())
    // versioned counts: the tag still answers 300, metadata-only
    assert(ds.countRows(Some("v300")) == 300)
  }

  test("fastForward publishes an audit branch; rejects diverged branches") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = java.nio.file.Files.createTempDirectory("graft_ff_").toString + "/tbl"
    val ds = core.SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.limit(100))                                      // snap 1 (main)
    ds.addBranch("audit")
    ds.append(orders.limit(50).withColumn("o_orderkey",
      col("o_orderkey") + 1000000L), branch = "audit")                // snap 2 (audit)
    // main is an ancestor of audit → fast-forward succeeds, metadata-only
    assert(ds.readAll().count() == 100)
    ds.fastForward("audit")
    assert(ds.readAll().count() == 150)
    // already at the target → silent idempotent no-op (a retried WAP
    // publish or an unchanged-audit publish must not fail)
    ds.fastForward("audit")
    assert(ds.readAll().count() == 150)
    // diverge: a new commit on main makes audit a non-descendant
    ds.append(orders.limit(30).withColumn("o_orderkey",
      col("o_orderkey") + 2000000L))                                  // snap 3 (main)
    intercept[IllegalArgumentException](ds.fastForward("audit"))
    assert(ds.readAll().count() == 180)
  }
}

class CurrentBranchSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("set_current_branch redirects default reads and writes") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = java.nio.file.Files.createTempDirectory("graft_cb_").toString + "/tbl"
    val ds = core.SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"))
    ds.append(orders.limit(100))
    ds.addBranch("exp")
    ds.setCurrentBranch("exp")
    ds.append(orders.limit(200).withColumn("o_orderkey", col("o_orderkey") + 1000000L))
    assert(ds.readAll().count() == 300) // exp sees both
    ds.setCurrentBranch("main")
    assert(ds.readAll().count() == 100) // main untouched
    intercept[IllegalArgumentException](ds.setCurrentBranch("nope"))

    // the current branch cannot be removed out from under the reader
    ds.setCurrentBranch("exp")
    intercept[IllegalArgumentException](ds.removeBranch("exp"))
    ds.setCurrentBranch("main")
    ds.removeBranch("exp")
    intercept[IllegalArgumentException](ds.setCurrentBranch("exp"))
  }
}
