package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Hash-bucketed tables: write-path co-location invariant, the
  * storage-partitioned join (zero shuffle between co-bucketed tables),
  * and the maintenance guards that protect the layout. */
class BucketSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed writes co-locate rows; CoW delete preserves the layout") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_bk_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"),
      bucketColumns = Seq("o_custkey"), numBuckets = 4)
    ds.append(orders.filter(col("o_orderkey") % 2 === 0))
    ds.append(orders.filter(col("o_orderkey") % 2 =!= 0))

    def checkLayout(): Unit = ds.indexFiles().foreach { f =>
      val b = graft.format.StoragePaths.bucketOf(f)
      assert(b.isDefined, s"unbucketed file $f")
      val hashed = spark.read.parquet(ds.storage.absolute(f))
        .select(pmod(hash(col("o_custkey")), lit(4))).distinct()
        .collect().map(_.getInt(0)).toSet
      assert(hashed.subsetOf(Set(b.get)), s"rows of $f not in bucket $b: $hashed")
    }
    checkLayout()
    assert(ds.readAll().count() == orders.count())

    // per-bucket compaction: the two appends left 2 small files per
    // bucket; they merge WITHIN the bucket — layout and content
    // invariants hold, one file per bucket remains
    val before = ds.readAll().collect().toSet
    assert(ds.indexFiles().size == 8)
    val res = ds.compact(targetFileRows = 1000000L)
    assert(res.isDefined, "bucketed compaction must fire on small files")
    checkLayout()
    assert(ds.indexFiles().size == 4, s"expected one file per bucket, got ${ds.indexFiles()}")
    assert(ds.readAll().collect().toSet == before)

    // the CoW rewrite flows through AppendOp → re-bucketed output
    ds.delete(col("o_totalprice") > 300000.0)
    checkLayout()

    // clustering still refuses: a global sort would break the layout
    intercept[IllegalArgumentException] { ds.clusterBy(Seq("o_totalprice"), 1000L) }
  }

  test("co-bucketed tables join with ZERO shuffle (storage-partitioned join)") {
    val orders = Tables.read(spark, sfDir, "orders")
    val customer = Tables.read(spark, sfDir, "customer")
    val root = Files.createTempDirectory("graft_spj_").toString
    spark.conf.set("spark.sql.catalog.gspjt",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspjt.location", root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")

    spark.sql("CREATE TABLE gspjt.o (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_totalprice DOUBLE) TBLPROPERTIES ('primary_keys'='o_orderkey', " +
      "'bucket_columns'='o_custkey', 'num_buckets'='8')")
    spark.sql("CREATE TABLE gspjt.c (c_custkey BIGINT, c_name STRING) " +
      "TBLPROPERTIES ('primary_keys'='c_custkey', " +
      "'bucket_columns'='c_custkey', 'num_buckets'='8')")
    orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("append").insertInto("gspjt.o")
    customer.select("c_custkey", "c_name").write.mode("append").insertInto("gspjt.c")

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        "SELECT o_orderkey, c_name, o_totalprice FROM gspjt.o " +
          "JOIN gspjt.c ON o_custkey = c_custkey")
      val rows = j.collect()
      // correctness vs a plain DataFrame join
      val expected = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice").collect()
      assert(rows.map(_.toString).sorted.toSeq == expected.map(_.toString).sorted.toSeq)

      // the join subtree must be exchange-free (flatten through AQE
      // query-stage wrappers, which are leaves to TreeNode.collect)
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: flatten(q.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      val all = flatten(j.queryExecution.executedPlan)
      val joinIdx = all.indexWhere {
        case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
        case _ => false
      }
      assert(joinIdx >= 0, s"no shuffle-family join found:\n${all.head.treeString}")
      val underJoin = flatten(all(joinIdx))
      assert(!underJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"storage-partitioned join still shuffled:\n${all.head.treeString}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }

  test("bucket pruning: point lookups on the bucket column read one bucket's files") {
    val orders = Tables.read(spark, sfDir, "orders")
    val loc = Files.createTempDirectory("graft_bkp_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"),
      bucketColumns = Seq("o_custkey"), numBuckets = 8)
    // two appends, arrival order — min/max stats are useless here
    ds.append(orders.filter(col("o_orderkey") % 2 === 0))
    ds.append(orders.filter(col("o_orderkey") % 2 =!= 0))
    val someKey = orders.select("o_custkey").first().getLong(0)

    // equality on the bucket column: only that bucket's files survive
    val p = ds.plan(Some(col("o_custkey") === lit(someKey)))
    val expectedBucket = core.BucketPruning.bucketId(
      someKey, org.apache.spark.sql.types.LongType, 8)
    assert(p.files.nonEmpty)
    assert(p.files.forall(f =>
      graft.format.StoragePaths.bucketOf(f).contains(expectedBucket)),
      s"kept files outside bucket $expectedBucket: ${p.files}")
    assert(p.prunedFiles > 0)
    // soundness: same rows as the unpruned filter
    val got = ds.read(filter = Some(col("o_custkey") === lit(someKey))).count()
    val expected = orders.filter(col("o_custkey") === lit(someKey)).count()
    assert(got == expected && got > 0)

    // IN-list reaches the union of its buckets
    val keys = orders.select("o_custkey").distinct().limit(3)
      .collect().map(_.getLong(0)).toSeq
    val pin = ds.plan(Some(col("o_custkey").isin(keys: _*)))
    val reach = keys.map(k =>
      core.BucketPruning.bucketId(k, org.apache.spark.sql.types.LongType, 8)).toSet
    assert(pin.files.forall(f =>
      graft.format.StoragePaths.bucketOf(f).exists(reach.contains)))

    // type-mismatched literal (int vs bigint column) must NOT prune
    val pMis = ds.plan(Some(col("o_custkey") === lit(someKey.toInt)))
    // Spark may upcast the literal before we see it; either way the
    // result must stay sound
    val gotMis = ds.read(filter = Some(col("o_custkey") === lit(someKey.toInt))).count()
    assert(gotMis == expected, s"plan kept ${pMis.files.size} files but lost rows")

    // OR with a non-bucket predicate keeps everything
    val pOr = ds.plan(Some(col("o_custkey") === lit(someKey) ||
      col("o_totalprice") > 1.0))
    assert(pOr.prunedFiles == 0)

    // the SQL/catalyst path prunes identically (relation-backed read)
    val viaSql = ds.readAll().filter(col("o_custkey") === lit(someKey)).count()
    assert(viaSql == expected)
  }

  test("multi-column buckets: SQL scans plan, joins stay correct, fully-pinned lookups prune") {
    import org.apache.spark.sql.types.{LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val orders = Tables.read(spark, sfDir, "orders")

    // --- API path: pruning fires only when EVERY bucket column is pinned
    val loc = Files.createTempDirectory("graft_mbk_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, orders.schema, Seq("o_orderkey"),
      bucketColumns = Seq("o_custkey", "o_orderstatus"), numBuckets = 8)
    ds.append(orders.filter(col("o_orderkey") % 2 === 0))
    ds.append(orders.filter(col("o_orderkey") % 2 =!= 0))

    val row = orders.select("o_custkey", "o_orderstatus").first()
    val (k, st) = (row.getLong(0), row.getString(1))
    val both = col("o_custkey") === lit(k) && col("o_orderstatus") === lit(st)
    val p = ds.plan(Some(both))
    val expectedBucket = core.BucketPruning.bucketId(
      Seq((k, LongType), (UTF8String.fromString(st), StringType)), 8)
    assert(p.prunedFiles > 0, "fully-pinned 2-col lookup must prune")
    assert(p.files.nonEmpty && p.files.forall(f =>
      graft.format.StoragePaths.bucketOf(f).contains(expectedBucket)),
      s"kept files outside bucket $expectedBucket: ${p.files}")
    // soundness: pruned read returns exactly the filter's rows
    val got = ds.read(filter = Some(both)).count()
    val expected = orders.filter(both).count()
    assert(got == expected && got > 0)

    // one pinned column of two is NOT enough (any bucket reachable)
    assert(ds.plan(Some(col("o_custkey") === lit(k))).prunedFiles == 0)
    // contradictory pins are unsatisfiable: every file pruned, zero rows
    val conflict = col("o_custkey") === lit(k) && col("o_custkey") === lit(k + 1) &&
      col("o_orderstatus") === lit(st)
    val pc = ds.plan(Some(conflict))
    assert(pc.files.isEmpty)
    assert(ds.read(filter = Some(conflict)).count() == 0)

    // soundness fuzz across key tuples: pruned count == plain filter count
    orders.select("o_custkey", "o_orderstatus").distinct().limit(12).collect()
      .foreach { r =>
        val c = col("o_custkey") === lit(r.getLong(0)) &&
          col("o_orderstatus") === lit(r.getString(1))
        assert(ds.read(filter = Some(c)).count() == orders.filter(c).count())
      }

    // --- SQL path: a LEGACY (single-hash) multi-column-bucketed scan
    // must PLAN (the bucket() function binds N columns — it used to die
    // in bind()), and joins stay CORRECT. Zero-exchange SPJ needs the
    // per-column layout ('num_buckets'='4,4' → one single-leaf
    // transform per column; Spark folds the numBuckets literal for
    // single-reference bucket transforms only) — covered by the
    // per-column test below; the chained single-hash layout keeps
    // exchange-ful joins and fully-pinned pruning.
    val root = Files.createTempDirectory("graft_mspj_").toString
    spark.conf.set("spark.sql.catalog.gmbk",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmbk.location", root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.sql("CREATE TABLE gmbk.a (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) TBLPROPERTIES " +
      "('primary_keys'='o_orderkey', 'bucket_columns'='o_custkey,o_orderstatus', " +
      "'num_buckets'='8')")
    spark.sql("CREATE TABLE gmbk.b (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus STRING) TBLPROPERTIES " +
      "('primary_keys'='o_orderkey', 'bucket_columns'='o_custkey,o_orderstatus', " +
      "'num_buckets'='8')")
    orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("append").insertInto("gmbk.a")
    orders.select("o_orderkey", "o_custkey", "o_orderstatus")
      .write.mode("append").insertInto("gmbk.b")

    // plain scan of a multi-col bucketed table must not die at plan time
    assert(spark.sql("SELECT count(*) AS n FROM gmbk.a").collect()(0).getLong(0)
      == orders.count())

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        "SELECT a.o_orderkey, a.o_totalprice FROM gmbk.a a JOIN gmbk.b b " +
          "ON a.o_custkey = b.o_custkey AND a.o_orderstatus = b.o_orderstatus")
      val plain = orders.as("x").join(orders.as("y"),
        Seq("o_custkey", "o_orderstatus")).count()
      assert(j.count() == plain, "2-col bucketed join lost rows")
      // SQL equality on both bucket columns prunes through Catalyst too
      val one = spark.sql("SELECT count(*) AS n FROM gmbk.a WHERE " +
        s"o_custkey = $k AND o_orderstatus = '$st'").collect()(0).getLong(0)
      assert(one == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.unset("spark.sql.catalog.gmbk")
      spark.conf.unset("spark.sql.catalog.gmbk.location")
    }
  }

  test("per-column bucket counts: multi-key SPJ is exchange-free; subset pins prune") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_pcspj_").toString
    spark.conf.set("spark.sql.catalog.gpc",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpc.location", root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      spark.sql("CREATE TABLE gpc.a (k1 BIGINT, k2 STRING, v DOUBLE) TBLPROPERTIES " +
        "('primary_keys'='k1', 'bucket_columns'='k1,k2', 'num_buckets'='4,4')")
      spark.sql("CREATE TABLE gpc.b (k1 BIGINT, k2 STRING, w DOUBLE) TBLPROPERTIES " +
        "('primary_keys'='k1', 'bucket_columns'='k1,k2', 'num_buckets'='4,4')")
      (1L to 500L).map(i => (i, "s" + (i % 7), i * 1.0)).toDF("k1", "k2", "v")
        .write.mode("append").insertInto("gpc.a")
      (1L to 400L).map(i => (i, "s" + (i % 7), i * 2.0)).toDF("k1", "k2", "w")
        .write.mode("append").insertInto("gpc.b")

      val ds = SpaceDataset.load(spark, s"$root/a")
      assert(ds.storage.metadata.bucketCounts == List(4, 4))
      assert(ds.storage.metadata.numBuckets == 16)

      // partial pin prunes ONE dimension; full pin prunes both
      val p1 = ds.plan(Some(col("k2") === "s3"))
      assert(p1.files.nonEmpty && p1.files.size <= p1.totalFiles / 4,
        s"k2 pin must keep <= 1/4 of files (kept ${p1.files.size}/${p1.totalFiles})")
      val p2 = ds.plan(Some(col("k1") === 77L && col("k2") === "s0"))
      assert(p2.files.size <= p2.totalFiles / 8)
      // soundness: pruned reads equal plain filters
      assert(ds.read(filter = Some(col("k2") === "s3")).count() ==
        (1L to 500L).count(i => "s" + (i % 7) == "s3"))
      assert(ds.read(filter = Some(col("k1") === 77L && col("k2") === "s0")).count() ==
        (if ("s" + (77 % 7) == "s0") 1 else 0))

      // two-key join over co-bucketed tuple layouts: ZERO exchanges
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.sql("SELECT a.k1, a.v, b.w FROM gpc.a a JOIN gpc.b b " +
          "ON a.k1 = b.k1 AND a.k2 = b.k2")
        assert(j.count() == 400L)
        def flatten(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            p +: flatten(q.plan)
          case _ => p +: p.children.flatMap(flatten)
        }
        val all = flatten(j.queryExecution.executedPlan)
        val joinIdx = all.indexWhere {
          case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
          case _ => false
        }
        assert(joinIdx >= 0, s"no shuffle-family join:\n${all.head.treeString}")
        assert(!flatten(all(joinIdx)).exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"multi-column SPJ still shuffled:\n${all.head.treeString}")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)

      // DML keeps the tuple layout: delete + upsert, then reads and
      // pruning still line up and compaction regroups within buckets
      val api = SpaceDataset.load(spark, s"$root/a")
      api.delete(col("k1") <= 50L)
      api.upsert((1L to 20L).map(i => (i, "s" + (i % 7), -i * 1.0)).toDF("k1", "k2", "v"))
      assert(api.readAll().count() == 470L)
      assert(api.read(filter = Some(col("k2") === "s3")).count() ==
        api.readAll().filter(col("k2") === "s3").collect().length)
      api.compact(targetFileRows = 100000L)
      val files = api.plan(None).files
      assert(files.forall(f => graft.format.StoragePaths.bucketOf(f).isDefined),
        "compacted files must keep bucket ids")
      assert(api.readAll().count() == 470L)
    } finally {
      spark.conf.unset("spark.sql.catalog.gpc")
      spark.conf.unset("spark.sql.catalog.gpc.location")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("double bucket columns: ±0.0 probes reach the bucket the write normalized to") {
    import spark.implicits._
    // Spark's NormalizeFloatingNumbers folds -0.0 into +0.0 in
    // repartition keys, so every zero row lands in ONE bucket; a probe
    // hashing raw -0.0 bits would prune that bucket away and silently
    // lose the rows (the API plan() path sees the raw literal — the
    // optimizer's zero rewrite only guards the Catalyst path)
    val loc = java.nio.file.Files.createTempDirectory("graft_bzero_").toString + "/tbl"
    val rows = (0 until 200).map(i => (i.toLong, if (i % 10 == 0) -0.0d else i * 1.5d))
    val ds = SpaceDataset.create(spark, loc, rows.toDF("id", "v").schema, Seq("id"),
      bucketColumns = Seq("v"), numBuckets = 8)
    ds.append(rows.toDF("id", "v"))
    for (probe <- Seq(0.0d, -0.0d)) {
      val got = ds.read(filter = Some(col("v") === probe))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == (0 until 200 by 10).map(_.toLong).toSet,
        s"probe $probe lost zero rows: ${got.size}")
    }
    // non-zero probes still prune to one bucket's files
    val p = ds.plan(Some(col("v") === 1.5d))
    assert(p.prunedFiles > 0, "bucket pruning must still engage for non-zero doubles")
  }

  test("rebucket lifecycle: new counts, SPJ exchange-free, time travel guarded") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_rbk_").toString
    spark.conf.set("spark.sql.catalog.grb",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grb.location", root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      spark.sql("CREATE TABLE grb.a (k1 BIGINT, k2 STRING, v DOUBLE) TBLPROPERTIES " +
        "('primary_keys'='k1', 'bucket_columns'='k1,k2', 'num_buckets'='2,2')")
      spark.sql("CREATE TABLE grb.b (k1 BIGINT, k2 STRING, w DOUBLE) TBLPROPERTIES " +
        "('primary_keys'='k1', 'bucket_columns'='k1,k2', 'num_buckets'='2,2')")
      (1L to 500L).map(i => (i, "s" + (i % 7), i * 1.0)).toDF("k1", "k2", "v")
        .write.mode("append").insertInto("grb.a")
      (1L to 400L).map(i => (i, "s" + (i % 7), i * 2.0)).toDF("k1", "k2", "w")
        .write.mode("append").insertInto("grb.b")

      val a = SpaceDataset.load(spark, s"$root/a")
      val preRebucket = a.storage.metadata.currentSnapshotId
      val preCount = a.readAll().count()
      val preFiltered = a.readAll().filter(col("k2") === "s3").count()

      // API path on a, SQL procedure path on b
      val r = a.rebucket(Seq(4, 4))
      assert(r.newCounts == Seq(4, 4) && r.rows == preCount)
      val sqlRes = spark.sql(
        "CALL grb.system.rebucket(table => 'b', counts => '4,4')").collect()
      assert(sqlRes(0).getAs[Int]("num_buckets") == 16)

      val meta = a.storage.metadata
      assert(meta.bucketCounts == List(4, 4) && meta.numBuckets == 16)
      assert(meta.bucketLayoutSince == meta.currentSnapshotId,
        "the layout watermark must be the rebucket commit itself")
      // the rewrite is a full replacement: every current file carries a
      // flat id in [0,16) whose rows hash to its tuple under NEW counts
      a.indexFiles().foreach { f =>
        val flat = graft.format.StoragePaths.bucketOf(f).get
        val Seq(b1, b2) = AppendOp.tupleOfFlat(flat, Seq(4, 4))
        val tuples = spark.read.parquet(f)
          .select(pmod(hash(col("k1")), lit(4)), pmod(hash(col("k2")), lit(4)))
          .distinct().collect().map(x => (x.getInt(0), x.getInt(1))).toSet
        assert(tuples.subsetOf(Set((b1, b2))), s"$f rows not in tuple ($b1,$b2): $tuples")
      }
      assert(a.readAll().count() == preCount)
      // pruning engages at the NEW counts
      val p = a.plan(Some(col("k2") === "s3"))
      assert(p.files.nonEmpty && p.files.size <= p.totalFiles / 4,
        s"k2 pin must keep <= 1/4 at 4x4 (kept ${p.files.size}/${p.totalFiles})")
      assert(a.read(filter = Some(col("k2") === "s3")).count() == preFiltered)

      // SPJ at the new counts: two-key join with ZERO exchanges
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.sql("SELECT a.k1, a.v, b.w FROM grb.a a JOIN grb.b b " +
          "ON a.k1 = b.k1 AND a.k2 = b.k2")
        assert(j.count() == 400L)
        def flatten(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case x: AdaptiveSparkPlanExec => p +: flatten(x.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            p +: flatten(q.plan)
          case _ => p +: p.children.flatMap(flatten)
        }
        val all = flatten(j.queryExecution.executedPlan)
        val joinIdx = all.indexWhere {
          case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
          case _ => false
        }
        assert(joinIdx >= 0, s"no shuffle-family join:\n${all.head.treeString}")
        assert(!flatten(all(joinIdx)).exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"post-rebucket SPJ still shuffled:\n${all.head.treeString}")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)

      // CDC-silent: diff across the rebucket reports nothing
      assert(a.diff(preRebucket.toString,
        a.storage.metadata.currentSnapshotId.toString).isEmpty)
      // time travel BELOW the watermark: old files hashed under 2x2 —
      // bucket pruning by the new counts must disengage, reads stay exact
      assert(a.read(version = Some(preRebucket.toString)).count() == preCount)
      assert(a.read(filter = Some(col("k2") === "s3"),
        version = Some(preRebucket.toString)).count() == preFiltered)
      // k2 carries no stats and no bloom, so only bucket pruning can
      // drop files for this probe. The retired 2x2 layout lives in
      // history, and the pre-rebucket snapshot is PURE (committed while
      // 2x2 was current) — pruning engages under the OLD counts, never
      // a 4x4 misinterpretation: the kept set must still contain every
      // matching row
      val oldPlan = a.plan(Some(col("k2") === "s0"),
        version = Some(preRebucket.toString))
      assert(oldPlan.files.size < oldPlan.totalFiles,
        "pure old-epoch snapshots must prune under their RETIRED layout")
      // ground truth OUTSIDE the pruned path: full collect, filter in Scala
      val oldTruth = a.read(version = Some(preRebucket.toString)).collect()
        .count(_.getAs[String]("k2") == "s0")
      assert(a.read(filter = Some(col("k2") === "s0"),
        version = Some(preRebucket.toString)).count() == oldTruth && oldTruth > 0)
      assert(spark.sql(s"SELECT count(*) FROM grb.a VERSION AS OF $preRebucket " +
        "WHERE k2 = 's3'").collect()(0).getLong(0) == preFiltered)

      // subsequent DML lands in (and preserves) the new layout
      a.upsert((1L to 20L).map(i => (i, "s" + (i % 7), -i * 1.0)).toDF("k1", "k2", "v"))
      assert(a.readAll().count() == preCount)
      assert(a.read(filter = Some(col("k2") === "s3")).count() ==
        a.readAll().filter(col("k2") === "s3").collect().length)

      // invalid shapes refuse loudly
      intercept[IllegalArgumentException](a.rebucket(Seq(4, 4))) // unchanged
      intercept[IllegalArgumentException](a.rebucket(Seq(4)))    // arity
      val unbucketed = SpaceDataset.create(spark,
        Files.createTempDirectory("graft_rbk2_").toString + "/tbl",
        (1L to 3L).toDF("k1").schema, Seq("k1"))
      intercept[IllegalArgumentException](unbucketed.rebucket(Seq(4)))
      intercept[IllegalArgumentException](
        unbucketed.rebucket(Seq(4), columns = Some(Seq("nope"))))
    } finally {
      spark.conf.unset("spark.sql.catalog.grb")
      spark.conf.unset("spark.sql.catalog.grb.location")
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  test("rebucket ADOPTS bucketing on an unbucketed table; history stays guarded") {
    import spark.implicits._
    val loc = Files.createTempDirectory("graft_rbka_").toString + "/tbl"
    val rows = (1L to 400L).map(i => (i, "s" + (i % 5), i * 1.0)).toDF("k1", "k2", "v")
    val ds = SpaceDataset.create(spark, loc, rows.schema, Seq("k1"))
    ds.append(rows.filter(col("k1") <= 200L).repartition(3))
    ds.append(rows.filter(col("k1") > 200L).repartition(3))
    val preSnap = ds.storage.metadata.currentSnapshotId
    val preFiltered = ds.readAll().filter(col("k2") === "s2").count()

    // the table grew into needing SPJ/point-lookups: adopt a layout
    val r = ds.rebucket(Seq(4, 4), columns = Some(Seq("k1", "k2")))
    assert(r.rows == 400L)
    val meta = ds.storage.metadata
    assert(meta.bucketColumns == List("k1", "k2") && meta.numBuckets == 16 &&
      meta.bucketCounts == List(4, 4))
    assert(meta.bucketLayoutSince == meta.currentSnapshotId)
    // every current file carries a flat id and rows match their tuple
    ds.indexFiles().foreach { f =>
      val flat = graft.format.StoragePaths.bucketOf(f)
      assert(flat.isDefined, s"adopted layout left an unbucketed file $f")
      val Seq(b1, b2) = AppendOp.tupleOfFlat(flat.get, Seq(4, 4))
      val tuples = spark.read.parquet(f)
        .select(pmod(hash(col("k1")), lit(4)), pmod(hash(col("k2")), lit(4)))
        .distinct().collect().map(x => (x.getInt(0), x.getInt(1))).toSet
      assert(tuples.subsetOf(Set((b1, b2))))
    }
    assert(ds.readAll().count() == 400L)
    // pruning engages on the adopted layout; content stays exact
    val p = ds.plan(Some(col("k2") === "s2"))
    assert(p.files.nonEmpty && p.files.size <= p.totalFiles / 4)
    assert(ds.read(filter = Some(col("k2") === "s2")).count() == preFiltered)
    // history below the watermark: pre-adoption files have NO bucket ids
    // — reads stay exact and bucket pruning keeps everything
    assert(ds.read(version = Some(preSnap.toString)).count() == 400L)
    val oldPlan = ds.plan(Some(col("k2") === "s2"), version = Some(preSnap.toString))
    assert(oldPlan.files.size == oldPlan.totalFiles)
    // subsequent appends land bucketed
    ds.append(Seq((401L, "s1", 1.0)).toDF("k1", "k2", "v"))
    assert(ds.indexFiles().forall(f =>
      graft.format.StoragePaths.bucketOf(f).isDefined))
    assert(ds.readAll().count() == 401L)
  }

  test("bucketed tables refuse zero-copy ingest; bucket column must exist") {
    val orders = Tables.read(spark, sfDir, "orders")
    intercept[IllegalArgumentException] {
      SpaceDataset.create(spark,
        Files.createTempDirectory("graft_bk2_").toString + "/tbl",
        orders.schema, Seq("o_orderkey"),
        bucketColumns = Seq("nope"), numBuckets = 4)
    }
    val ds = SpaceDataset.create(spark,
      Files.createTempDirectory("graft_bk3_").toString + "/tbl",
      orders.schema, Seq("o_orderkey"),
      bucketColumns = Seq("o_custkey"), numBuckets = 4)
    intercept[IllegalArgumentException] {
      core.ParquetLoader.loadParquet(spark, ds, Seq("/tmp/nope.parquet"))
    }
    // dropping the bucket column would break every subsequent write
    intercept[IllegalArgumentException] { ds.dropColumn("o_custkey") }
    // renaming it is fine: bucketColumns stay physical; writes unchanged
    ds.renameColumn("o_custkey", "customer")
    ds.append(orders.limit(10).withColumnRenamed("o_custkey", "customer"))
    assert(ds.readAll().count() == 10)
  }

  test("narrower frame types bucket under the STORED type (alignment before hashing)") {
    import spark.implicits._
    // murmur3-of-int ≠ murmur3-of-long for the same value, so an int
    // frame appended to a bigint bucket column MUST be upcast before
    // bucket ids are computed — otherwise files land under ids that
    // bucket pruning / SPJ never probe (ADVICE r12 high).
    val rows = (1L to 400L).map(i => (i, "s" + (i % 5), i * 1.0)).toDF("k1", "k2", "v")
    val narrow = rows
      .withColumn("k1", col("k1").cast("int"))
      .withColumn("v", col("v").cast("float"))

    // single-hash layout on the bigint column
    val ds1 = SpaceDataset.create(spark,
      Files.createTempDirectory("graft_bkal_").toString + "/tbl",
      rows.schema, Seq("k1"), bucketColumns = Seq("k1"), numBuckets = 4)
    ds1.append(narrow)
    ds1.indexFiles().foreach { f =>
      val b = graft.format.StoragePaths.bucketOf(f)
      assert(b.isDefined, s"unbucketed file $f")
      val stored = spark.read.parquet(ds1.storage.absolute(f))
      assert(stored.schema("k1").dataType ==
        org.apache.spark.sql.types.LongType, "file must store the table type")
      val hashed = stored.select(pmod(hash(col("k1")), lit(4)))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(hashed.subsetOf(Set(b.get)),
        s"rows of $f hashed under the frame type, not the stored type: $hashed vs $b")
    }
    // point lookups prune to the right bucket AND find the rows
    val p1 = ds1.plan(Some(col("k1") === 37L))
    assert(p1.files.size < p1.totalFiles, "bucket pruning must engage")
    assert(ds1.read(filter = Some(col("k1") === 37L)).count() == 1L)

    // per-column tuple layout: same invariant through perColumnBucketExprs
    val ds2 = SpaceDataset.create(spark,
      Files.createTempDirectory("graft_bkal2_").toString + "/tbl",
      rows.schema, Seq("k1"), bucketColumns = Seq("k1", "k2"),
      numBuckets = 16, bucketCounts = Seq(4, 4))
    ds2.append(narrow)
    ds2.indexFiles().foreach { f =>
      val flat = graft.format.StoragePaths.bucketOf(f)
      assert(flat.isDefined, s"unbucketed file $f")
      val Seq(b1, b2) = AppendOp.tupleOfFlat(flat.get, Seq(4, 4))
      val tuples = spark.read.parquet(ds2.storage.absolute(f))
        .select(pmod(hash(col("k1")), lit(4)), pmod(hash(col("k2")), lit(4)))
        .distinct().collect().map(x => (x.getInt(0), x.getInt(1))).toSet
      assert(tuples.subsetOf(Set((b1, b2))),
        s"tuple-layout rows of $f hashed under the frame type: $tuples vs ($b1,$b2)")
    }
    assert(ds2.read(filter = Some(col("k1") === 37L && col("k2") === "s2")).count() == 1L)
    assert(ds2.readAll().count() == 400L)
  }

  test("layout epochs: side-branch commits after a rebucket never claim the new layout") {
    import spark.implicits._
    // bucket on a NON-PK string column: PK stats/blooms can't prune an
    // `s`-filter, so file survival under it isolates the BUCKET layer
    val rows = (1L to 400L).map(i => (i, "g" + (i % 20), i * 1.0)).toDF("k1", "s", "v")
    val ds = SpaceDataset.create(spark,
      Files.createTempDirectory("graft_rbkg_").toString + "/tbl",
      rows.schema, Seq("k1"), bucketColumns = Seq("s"),
      numBuckets = 4, bucketCounts = Seq(4))
    ds.append(rows.filter(col("k1") <= 200L))
    // layout metadata is table-wide: off-main rebuckets refuse
    intercept[IllegalArgumentException](ds.rebucket(Seq(8), branch = "dev"))

    // fork a side branch BEFORE the rebucket, then rebucket main
    ds.storage.addBranch("dev")
    ds.storage.addTag("v1")
    val r = ds.rebucket(Seq(8))
    assert(r.newCounts == Seq(8))
    val meta = ds.storage.metadata
    assert(meta.currentBucketLayoutId == meta.currentSnapshotId &&
      meta.currentSnapshot.bucketLayoutId == meta.currentBucketLayoutId,
      "the rebucket commit must start (and carry) the new epoch")
    assert(ds.readAll().count() == 200L)
    // main descendants inherit the epoch — layout claims keep engaging
    ds.append(rows.filter(col("k1") > 200L))
    assert(ds.storage.metadata.currentSnapshot.bucketLayoutId ==
      ds.storage.metadata.currentBucketLayoutId)
    val pMain = ds.plan(Some(col("s") === "g7"))
    assert(pMain.files.size < pMain.totalFiles, "post-rebucket main must prune")

    // THE HAZARD (ADVICE r12 medium): a commit on the pre-fork branch
    // lands ABOVE the watermark by raw id, but its snapshot still
    // references old-layout files — the per-snapshot epoch (inherited
    // from the pre-rebucket parent, not stamped current) disengages
    // bucket pruning there, where the raw-id watermark alone would
    // have pruned wrongly
    ds.append(rows.filter(col("k1") > 200L), branch = "dev")
    val devHead = ds.storage.branchHead("dev")
    assert(devHead > ds.storage.metadata.bucketLayoutSince,
      "precondition: the branch commit id must exceed the watermark")
    assert(ds.storage.metadata.snapshot(devHead).get.bucketLayoutId !=
      ds.storage.metadata.currentBucketLayoutId,
      "the branch snapshot must stay on the pre-rebucket epoch")
    val pDev = ds.plan(Some(col("s") === "g7"), version = Some("dev"))
    assert(pDev.files.size == pDev.totalFiles,
      "bucket pruning must keep EVERYTHING on the old-epoch branch")
    assert(ds.read(filter = Some(col("s") === "g7"),
      version = Some("dev")).count() == 20L)
    // pre-rebucket tag: PURE old-epoch snapshot — prunes under the
    // RETIRED 4-bucket layout (recorded in bucketLayoutHistory), and
    // the read stays exact against a collect-side ground truth
    val pTag = ds.plan(Some(col("s") === "g7"), version = Some("v1"))
    assert(pTag.files.size < pTag.totalFiles,
      "pure old-epoch tag must prune under its retired layout")
    val tagTruth = ds.read(version = Some("v1")).collect()
      .count(_.getAs[String]("s") == "g7")
    assert(ds.read(filter = Some(col("s") === "g7"),
      version = Some("v1")).count() == tagTruth && tagTruth > 0)
  }

  test("layout history: chained rebuckets keep per-epoch claims; a widen disengages") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, (i % 16).toInt, i * 1.0)).toDF("k1", "n", "v")
    val ds = SpaceDataset.create(spark,
      Files.createTempDirectory("graft_rbkh_").toString + "/tbl",
      rows.schema, Seq("k1"), bucketColumns = Seq("n"),
      numBuckets = 4, bucketCounts = Seq(4))
    ds.append(rows)
    ds.storage.addTag("e0") // epoch 0: 4 buckets on n (int)
    ds.rebucket(Seq(8))
    ds.storage.addTag("e1") // epoch 1: 8 buckets on n
    ds.rebucket(Seq(4), columns = Some(Seq("k1"))) // epoch 2: re-keyed to k1
    assert(ds.storage.metadata.bucketLayoutHistory.size == 2,
      "both retired layouts must be recorded")

    // generic numeric read: post-widen, old snapshots serve n as LONG
    def truth(tag: String): Int = ds.read(version = Some(tag)).collect()
      .count(_.getAs[Number]("n").longValue == 7L)
    // each retired epoch prunes under ITS OWN counts and stays exact
    Seq("e0", "e1").foreach { tag =>
      val p = ds.plan(Some(col("n") === 7), version = Some(tag))
      assert(p.files.size < p.totalFiles, s"$tag must prune under its retired layout")
      assert(ds.read(filter = Some(col("n") === 7),
        version = Some(tag)).count() == truth(tag) && truth(tag) > 0)
    }
    // current epoch prunes on the NEW key
    val pNow = ds.plan(Some(col("k1") === 37L))
    assert(pNow.files.size < pNow.totalFiles)

    // widen the re-keyed-AWAY column: legal now (it is no longer a
    // bucket column), but murmur3-of-long ≠ murmur3-of-int — the
    // recorded column type no longer matches, so the historical claims
    // DISENGAGE (keep-all) instead of probing wrong hashes
    ds.widenColumn("n", org.apache.spark.sql.types.LongType)
    Seq("e0", "e1").foreach { tag =>
      val p = ds.plan(Some(col("n") === 7L), version = Some(tag))
      assert(p.files.size == p.totalFiles,
        s"$tag claims must disengage after the bucket column widened")
      assert(ds.read(filter = Some(col("n") === 7L),
        version = Some(tag)).count() == truth(tag))
    }
  }
}
