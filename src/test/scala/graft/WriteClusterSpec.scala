package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** CLUSTER-ON-WRITE (`write_cluster_by`): every append-path write lands
  * its batch range-sorted as an internally-disjoint tier, so point
  * reads prune without a clusterBy rewrite, and incremental clustering
  * finds clean tiers by construction. */
class WriteClusterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshLoc(): String =
    Files.createTempDirectory("graft_wclus_").toString + "/tbl"

  test("each append lands as a disjoint sorted tier; point reads prune immediately") {
    val orders = Tables.read(spark, sfDir, "orders")
    val ds = SpaceDataset.create(spark, freshLoc(), orders.schema, Seq("o_orderkey"),
      statsFields = Seq("o_totalprice"), writeClusterBy = Seq("o_totalprice"))
    // two scattered arrivals — each must land sorted by price
    ds.append(orders.filter(col("o_orderkey") % 2 === 0).repartition(4))
    ds.append(orders.filter(col("o_orderkey") % 2 =!= 0).repartition(4))
    assert(ds.readAll().collect().toSet == orders.collect().toSet)

    // a price point-range read touches at most one file PER TIER with
    // NO clusterBy ever run
    val total = ds.plan().files.size
    val kept = ds.plan(Some(col("o_totalprice") > 500000.0)).files.size
    assert(kept <= 2, s"top-range read kept $kept of $total files")

    // the tiers are clean: with the self-merge trigger parked, an
    // incremental pass has nothing to rewrite
    spark.conf.set("spark.graft.cluster.mergeFraction", "1e9")
    try assert(ds.clusterBy(Seq("o_totalprice"), targetFileRows = 100000L,
      incremental = true).isEmpty)
    finally spark.conf.unset("spark.graft.cluster.mergeFraction")
    // at the default fraction the SAME state self-merges: two equal
    // tiers mean delta == backbone > 0.5 × backbone, so the pass folds
    // them into one backbone and a point read then touches ≤1 file
    assert(ds.clusterBy(Seq("o_totalprice"), targetFileRows = 100000L,
      incremental = true).isDefined)
    assert(ds.plan(Some(col("o_totalprice") > 500000.0)).files.size <= 1)
  }

  test("write-clustered MV refresh: term point reads prune without any rewrite") {
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val src = SpaceDataset.create(spark, freshLoc(), docs.schema, Seq("doc_id"))
    src.append(docs.filter(col("doc_id") % 2 === 0))
    val mv = graft.views.View.ofDataset(src)
      .mapTransform(classOf[graft.operators.TokenPostingsTransform].getName,
        Map("textCol" -> "text", "idCol" -> "doc_id"))
      .materialize(spark, freshLoc(), Seq("term", "doc_id"),
        writeClusterBy = Seq("term"))
    src.append(docs.filter(col("doc_id") % 2 =!= 0))
    mv.refresh()

    val total = mv.dataset.plan().files.size
    val kept = mv.dataset.plan(Some(col("term") === "the")).files.size
    assert(kept <= 2, s"term point read kept $kept of $total posting files")
    // contents equal an unclustered rebuild
    val flat = graft.operators.TextIndex.postings(docs, "text", "doc_id")
    val got = mv.dataset.readAll().select("term", "doc_id", "tf")
    assert(got.exceptAll(flat.select("term", "doc_id", "tf")).isEmpty)
    assert(flat.select("term", "doc_id", "tf").exceptAll(got).isEmpty)
  }

  test("CoW delete and upsert on a write-clustered table stay exact") {
    val orders = Tables.read(spark, sfDir, "orders")
    val ds = SpaceDataset.create(spark, freshLoc(), orders.schema, Seq("o_orderkey"),
      statsFields = Seq("o_totalprice"), writeClusterBy = Seq("o_totalprice"))
    ds.append(orders)
    ds.delete(col("o_totalprice") > 400000.0)
    val bumped = orders.filter(col("o_orderkey") % 7 === 0)
      .filter(col("o_totalprice") <= 400000.0)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    ds.upsert(bumped)
    val exp = orders.filter(col("o_totalprice") <= 400000.0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    assert(ds.readAll().exceptAll(exp).isEmpty && exp.exceptAll(ds.readAll()).isEmpty)
    // an incremental pass afterwards repairs whatever the rewrites
    // scattered, without a full-table rewrite
    val total = ds.plan().files.size
    val res = ds.clusterBy(Seq("o_totalprice"), targetFileRows = 100000L,
      incremental = true)
    res.foreach(r => assert(r.rewrittenFiles <= total))
    val kept = ds.plan(Some(col("o_totalprice") > 390000.0)).files.size
    assert(kept <= 2, s"top-range read kept $kept files after repair")
  }

  test("fused upsert on a write-clustered table: one data manifest, tier-shaped groups") {
    // VERDICT r15 #2: the one-pass delete+append used to skip
    // write-clustered layouts — exactly the layouts the flagship MVs
    // use. The fused write must keep the manifest economy (at most
    // carryover + ONE data manifest) AND land both file groups as
    // range-disjoint sorted tiers.
    val orders = Tables.read(spark, sfDir, "orders")
    val ds = SpaceDataset.create(spark, freshLoc(), orders.schema, Seq("o_orderkey"),
      statsFields = Seq("o_totalprice"), writeClusterBy = Seq("o_totalprice"))
    ds.append(orders.repartition(4))
    def manifests: Set[String] = ds.storage
      .snapshotOrFail(ds.storage.metadata.currentSnapshotId)
      .manifestFiles.indexManifestFiles.toSet
    val before = manifests

    // tiny advisory (keyed into the scoped-conf clone) → several range
    // partitions per group, so the disjointness claim is non-vacuous
    spark.conf.set("spark.graft.writeCluster.advisoryBytes", "4096")
    val incoming = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    try ds.upsert(incoming)
    finally spark.conf.unset("spark.graft.writeCluster.advisoryBytes")

    val added = manifests -- before
    assert(added.size <= 2,
      s"write-clustered upsert must fuse: at most carryover + ONE data " +
        s"manifest, got ${added.size}")
    val cl = ds.storage.changeLog(ds.storage.metadata.currentSnapshotId).get
    assert(cl.addedRows.nonEmpty && cl.addedRows.forall(_.allRows),
      "fused adds land in their own all-adds files")
    assert(cl.addedRows.map(_.file).toSet
      .intersect(cl.deletedRows.map(_.file).toSet).isEmpty)

    // content exact
    val exp = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 2)
        .otherwise(col("o_totalprice")))
    assert(ds.readAll().exceptAll(exp).isEmpty && exp.exceptAll(ds.readAll()).isEmpty)

    // tier shape: within EACH group (adds vs survivors) the files'
    // o_totalprice ranges are pairwise disjoint — the same sorted-tier
    // contract the clustered append path gives
    val schema = ManifestIO.manifestSchema(ds.storage)
    val f = ManifestIO.fieldAtPath(ds.storage.schema, "o_totalprice").get
    val statsCol = ManifestIO.statsColName(graft.format.FieldIds.fieldId(f))
    val rows = ManifestIO.readIndexManifestRowsDriver(ds.storage,
      spark.sparkContext.hadoopConfiguration, added.toSeq).map(_._2)
    val fIdx = schema.fieldIndex(ManifestIO.FileCol)
    val sIdx = schema.fieldIndex(statsCol)
    val addFiles = cl.addedRows.map(_.file).toSet
    val newFiles = rows.filter(r => !r.isNullAt(sIdx))
      .map(r => (r.getString(fIdx),
        r.getStruct(sIdx).getDouble(0), r.getStruct(sIdx).getDouble(1)))
    def disjoint(group: Seq[(String, Double, Double)]): Unit = {
      val sorted = group.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((fa, _, maxA), (fb, minB, _)) =>
          assert(maxA <= minB, s"overlapping tier files: $fa [..$maxA] vs $fb [$minB..]")
        case _ =>
      }
    }
    val (addGroup, survGroup) = newFiles.partition(t => addFiles.contains(t._1))
    assert(addGroup.size >= 2 || survGroup.size >= 2,
      "advisory too coarse: need multiple files in a group to test disjointness")
    disjoint(addGroup)
    disjoint(survGroup)
  }

  test("compact is TIER-AWARE: small tiers merge into one SORTED tier, point reads stay pruned") {
    // pre-fix behavior: compact's shuffle-free coalesce interleaved the
    // sorted tiers, silently un-sorting every compacted range — one
    // routine compact degraded all subsequent point reads until an
    // operator noticed. Six trickle appends = six small sorted tiers;
    // compaction must bin-pack them into ONE sorted tier.
    val orders = Tables.read(spark, sfDir, "orders")
    val ds = SpaceDataset.create(spark, freshLoc(), orders.schema, Seq("o_orderkey"),
      statsFields = Seq("o_totalprice"), writeClusterBy = Seq("o_totalprice"))
    for (m <- 0 until 6)
      ds.append(orders.filter(col("o_orderkey") % 6 === m).repartition(2))
    val before = ds.readAll().collect().toSet
    val filesBefore = ds.plan().files.size

    val res = ds.compact(targetFileRows = orders.count() * 2)
    assert(res.isDefined, "six small tiers must compact")
    assert(ds.readAll().collect().toSet == before, "compact changed content")

    // the compacted tier is still range-sorted: a point-range read
    // touches ≤2 files (compacted tier + at most one leftover tier)
    val kept = ds.plan(Some(col("o_totalprice") > 500000.0)).files.size
    assert(kept <= 2,
      s"compact un-sorted the tiers: top-range read kept $kept of " +
        s"${ds.plan().files.size} files (was $filesBefore before compact)")
    // and the layout is clean enough that incremental clustering no-ops
    assert(ds.clusterBy(Seq("o_totalprice"), targetFileRows = orders.count() * 2,
      incremental = true).isEmpty)
  }

  test("write_cluster_by validates: bucketing exclusive, columns must exist") {
    val schema = Seq.empty[(Long, String)].toDF("id", "g").schema
    intercept[IllegalArgumentException](SpaceDataset.create(spark, freshLoc(),
      schema, Seq("id"), writeClusterBy = Seq("nope")))
    intercept[IllegalArgumentException](SpaceDataset.create(spark, freshLoc(),
      schema, Seq("id"), bucketColumns = Seq("id"), numBuckets = 4,
      writeClusterBy = Seq("g")))
  }

  test("SQL DDL property round-trips and the writes cluster") {
    val root = Files.createTempDirectory("graft_wclussql_").toString
    spark.conf.set("spark.sql.catalog.graft_wc",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_wc.location", root)
    spark.sql("CREATE TABLE graft_wc.t (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('primary_keys'='id', 'stats_fields'='v', " +
      "'write_cluster_by'='v')")
    spark.sql("INSERT INTO graft_wc.t SELECT id, (id * 7919) % 100000 * 1.0 " +
      "FROM range(0, 50000)")
    val props = spark.sql("SHOW TBLPROPERTIES graft_wc.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write_cluster_by").contains("v"))
    val ds = SpaceDataset.load(spark, s"$root/t")
    val total = ds.plan().files.size
    val kept = ds.plan(Some(col("v") === 77.0)).files.size
    assert(kept <= 1, s"point read kept $kept of $total files")
  }
}
