package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** The SQL maintenance surface: `CALL <cat>.system.<proc>(...)` through
  * Spark 4's DSv2 ProcedureCatalog, covering every maintenance op the
  * Scala API has (compact / cluster_by / zorder / expire_snapshots /
  * gc / rollback), with named args and declared defaults. */
class ProcedureSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_proc_").toString
    spark.conf.set("spark.sql.catalog.graft_proc",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_proc.location", r)
    r
  }

  private def orders = Tables.read(spark, sfDir, "orders")

  test("compact procedure bin-packs small files and reports the rewrite") {
    root
    spark.sql("CREATE TABLE graft_proc.pc (o_orderkey BIGINT, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('primary_keys'='o_orderkey')")
    // four trickle appends -> four small files
    (0 until 4).foreach { i =>
      orders.filter(col("o_orderkey") % 4 === i)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("append").insertInto("graft_proc.pc")
    }
    val before = spark.sql("SELECT count(*) FROM graft_proc.pc").collect()(0).getLong(0)
    val res = spark.sql(
      "CALL graft_proc.system.compact(table => 'pc', target_file_rows => 1000000)")
      .collect()
    assert(res.length == 1)
    assert(res(0).getAs[Int]("rewritten_files") >= 4)
    assert(res(0).getAs[Int]("output_files") < res(0).getAs[Int]("rewritten_files"))
    assert(spark.sql("SELECT count(*) FROM graft_proc.pc").collect()(0).getLong(0) == before)
  }

  test("rewrite_manifests procedure packs the manifest list through SQL") {
    root
    spark.sql("CREATE TABLE graft_proc.rm (o_orderkey BIGINT, o_totalprice DOUBLE) " +
      "TBLPROPERTIES ('primary_keys'='o_orderkey')")
    (0 until 5).foreach { i =>
      orders.filter(col("o_orderkey") % 5 === i)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("append").insertInto("graft_proc.rm")
    }
    val before = spark.sql("SELECT count(*) FROM graft_proc.rm").collect()(0).getLong(0)
    val res = spark.sql(
      "CALL graft_proc.system.rewrite_manifests(table => 'rm')").collect()
    assert(res.length == 1)
    assert(res(0).getAs[Int]("rewritten_manifests") >= 5)
    assert(res(0).getAs[Int]("output_manifests") <
      res(0).getAs[Int]("rewritten_manifests"))
    assert(spark.sql("SELECT count(*) FROM graft_proc.rm")
      .collect()(0).getLong(0) == before)
  }

  test("cluster_by/zorder procedures rewrite; expire+gc reclaim; rollback resets") {
    root
    spark.sql("CREATE TABLE graft_proc.m (id BIGINT, a BIGINT, b BIGINT) " +
      "TBLPROPERTIES ('primary_keys'='id', 'stats_fields'='a,b')")
    spark.sql("INSERT INTO graft_proc.m SELECT id, id % 97, id % 89 " +
      "FROM range(0, 20000)")                                             // snap 1
    spark.sql("INSERT INTO graft_proc.m SELECT id, id % 97, id % 89 " +
      "FROM range(20000, 40000)")                                         // snap 2

    val cb = spark.sql("CALL graft_proc.system.cluster_by(table => 'm', " +
      "columns => 'a', target_file_rows => 5000)").collect()
    assert(cb.length == 1 && cb(0).getAs[Int]("output_files") >= 4)       // snap 3

    // incremental pass right after a full clustering: clean tiers, no-op
    val inc = spark.sql("CALL graft_proc.system.cluster_by(table => 'm', " +
      "columns => 'a', target_file_rows => 5000, incremental => true)").collect()
    assert(inc.isEmpty, s"expected a no-op, got ${inc.mkString(", ")}")

    val zo = spark.sql("CALL graft_proc.system.zorder(table => 'm', " +
      "columns => 'a,b', target_file_rows => 5000)").collect()
    assert(zo.length == 1 && zo(0).getAs[Long]("rows") == 40000L)         // snap 4

    // rollback to before the zorder rewrite (procedure output = new head;
    // branch defaults to 'main' via the declared parameter default)
    val rb = spark.sql(
      "CALL graft_proc.system.rollback(table => 'm', version => '3')").collect()
    assert(rb.length == 1 && rb(0).getAs[Long]("current_snapshot_id") == 3L)
    assert(spark.sql("SELECT count(*) FROM graft_proc.m").collect()(0).getLong(0) == 40000L)

    // expire everything but the head (keep_last 0: the abandoned zorder
    // snapshot is the most RECENT by time, so the default keep_last=1
    // would protect exactly it), then GC: the zorder output files and
    // pre-cluster files become unreachable
    val expired = spark.sql("CALL graft_proc.system.expire_snapshots(" +
      "table => 'm', older_than_ms => -1000, keep_last => 0)").collect()
    assert(expired.map(_.getAs[Long]("expired_snapshot_id")).toSet.contains(4L))
    val gone = spark.sql(
      "CALL graft_proc.system.gc(table => 'm', min_age_ms => 0)").collect()
    assert(gone.nonEmpty, "gc must delete the abandoned rewrite's files")
    assert(spark.sql("SELECT count(*) FROM graft_proc.m").collect()(0).getLong(0) == 40000L)
  }

  test("refresh_mv procedure advances a materialized view over source commits") {
    root
    spark.sql("CREATE TABLE graft_proc.src (id BIGINT, x DOUBLE) " +
      "TBLPROPERTIES ('primary_keys'='id')")
    spark.sql("INSERT INTO graft_proc.src SELECT id, id * 1.0 FROM range(0, 100)")
    val v = graft.views.View.ofTable(s"$root/src").filterExpr("x >= 50.0")
    v.materialize(spark, s"$root/mv", Seq("id")) // initial refresh included
    assert(spark.sql("SELECT count(*) FROM graft_proc.mv").collect()(0).getLong(0) == 50L)

    spark.sql("INSERT INTO graft_proc.src SELECT id, id * 1.0 FROM range(100, 150)")
    val r = spark.sql("CALL graft_proc.system.refresh_mv(table => 'mv')").collect()
    assert(r.length == 1 && r(0).getAs[Int]("commits") == 1,
      s"one source commit -> one MV commit, got ${r.mkString}")
    assert(spark.sql("SELECT count(*) FROM graft_proc.mv").collect()(0).getLong(0) == 100L)
    // idempotent when already current
    val r2 = spark.sql("CALL graft_proc.system.refresh_mv(table => 'mv')").collect()
    assert(r2(0).getAs[Int]("commits") == 0)
  }

  test("refresh_mv procedure dispatches to aggregate views by plan kind") {
    root
    spark.sql("CREATE TABLE graft_proc.aggsrc (id BIGINT, g STRING, v DOUBLE) " +
      "TBLPROPERTIES ('primary_keys'='id')")
    spark.sql("INSERT INTO graft_proc.aggsrc " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 1.0 " +
      "FROM range(0, 100)")
    val src = SpaceDataset.load(spark, s"$root/aggsrc")
    val av = graft.views.AggregateView.create(spark, s"$root/aggmv", src,
      Seq("g"), Seq(graft.views.AggSpec.sum("v", "sum_v"),
        graft.views.AggSpec.countAll("n")))
    av.refresh()

    spark.sql("INSERT INTO graft_proc.aggsrc SELECT id, 'even', id * 1.0 " +
      "FROM range(100, 200, 2)")
    spark.sql("DELETE FROM graft_proc.aggsrc WHERE id < 10")
    val r = spark.sql("CALL graft_proc.system.refresh_mv(table => 'aggmv')").collect()
    assert(r.length == 1 && r(0).getAs[Int]("commits") == 2,
      s"two source commits -> two state commits, got ${r.mkString}")
    av.dataset.refresh() // the procedure committed through its own instance
    val even = av.read().filter(col("g") === "even").collect()(0)
    // even ids 10..98 plus 100..198 step 2: counts and sums recompute
    val expN = 45L + 50L
    val expSum = (10L until 100L by 2).sum + (100L until 200L by 2).sum
    assert(even.getAs[Long]("n") == expN)
    assert(math.abs(even.getAs[Double]("sum_v") - expSum.toDouble) < 1e-6)
  }

  test("create_agg_view procedure builds the view from SQL; .view serves final values") {
    root
    spark.sql("CREATE TABLE graft_proc.cavsrc (id BIGINT, g STRING, v DOUBLE) " +
      "TBLPROPERTIES ('primary_keys'='id')")
    spark.sql("INSERT INTO graft_proc.cavsrc " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 1.0 " +
      "FROM range(0, 100)")
    val created = spark.sql("CALL graft_proc.system.create_agg_view(" +
      "table => 'cavsrc', view => 'cavmv', group_by => 'g', " +
      "aggs => 'count_all::n,sum:v:sum_v,min:v:min_v,max:v:max_v')").collect()
    assert(created.length == 1)
    assert(created(0).getAs[Int]("reservoir_k") > 0, "min/max aggs carry reservoirs")
    spark.sql("CALL graft_proc.system.refresh_mv(table => 'cavmv')").collect()

    // `.view` is the FINAL-values read (the table itself holds state)
    val rows = spark.sql(
      "SELECT g, n, sum_v, min_v, max_v FROM graft_proc.cavmv.view ORDER BY g")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("even", "odd"))
    val even = rows(0)
    assert(even.getLong(1) == 50L && even.getDouble(3) == 0.0 && even.getDouble(4) == 98.0)
    assert(math.abs(even.getDouble(2) - (0L until 100L by 2).sum.toDouble) < 1e-6)

    // maintenance stays incremental through the SQL surface
    spark.sql("DELETE FROM graft_proc.cavsrc WHERE id = 98") // even max deleted
    spark.sql("CALL graft_proc.system.refresh_mv(table => 'cavmv')").collect()
    val even2 = spark.sql(
      "SELECT max_v FROM graft_proc.cavmv.view WHERE g = 'even'").collect()(0)
    assert(even2.getDouble(0) == 96.0, "reservoir must absorb the extremum delete")

    // a malformed agg spec fails loudly
    val e = intercept[Exception](spark.sql("CALL graft_proc.system.create_agg_view(" +
      "table => 'cavsrc', view => 'cavbad', group_by => 'g', aggs => 'sum_v')").collect())
    assert(e.getMessage.contains("kind:input:as"), e.getMessage)

    // FILTERED view from SQL: the optional `where` predicate rides the
    // plan and maintains symmetrically through appends and deletes
    spark.sql("CALL graft_proc.system.create_agg_view(" +
      "table => 'cavsrc', view => 'cavmvf', group_by => 'g', " +
      "aggs => 'count_all::nf,sum:v:sum_vf', where => 'v >= 50')").collect()
    spark.sql("CALL graft_proc.system.refresh_mv(table => 'cavmvf')").collect()
    // id 98 was deleted above and 97 is odd: even qualifying = 50..96 even
    val f = spark.sql(
      "SELECT nf, sum_vf FROM graft_proc.cavmvf.view WHERE g = 'even'").collect()(0)
    assert(f.getLong(0) == (50 to 96 by 2).size.toLong)
    assert(math.abs(f.getDouble(1) - (50 to 96 by 2).sum.toDouble) < 1e-6)
  }

  test("rewrite_records procedure reclaims payload space through SQL") {
    root
    // record tables take DATA mutations through the API (SQL writes
    // would need payload stitching); maintenance still runs via CALL
    import org.apache.spark.sql.types._
    import spark.implicits._
    val ds = SpaceDataset.create(spark, s"$root/rr", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("body", BinaryType))), Seq("id"), recordFields = Seq("body"))
    ds.append((0L until 200L).map(i => (i, s"b-$i".getBytes("UTF-8")))
      .toDF("id", "body").coalesce(1))
    ds.delete(col("id") % 5 =!= 0)
    val r = spark.sql("CALL graft_proc.system.rewrite_records(table => 'rr')").collect()
    assert(r.length == 1 && r(0).getAs[Int]("picked_record_files") >= 1 &&
      r(0).getAs[Long]("rows") == 40L, s"unexpected ${r.mkString}")
    assert(ds.readAll().count() == 40L)
  }

  test("SHOW PROCEDURES lists the system namespace; DESCRIBE names parameters") {
    root
    val shown = spark.sql("SHOW PROCEDURES IN graft_proc.system").collect()
      .map(_.toSeq.mkString("|"))
    assert(shown.exists(_.contains("compact")) && shown.length >= 6,
      s"SHOW PROCEDURES must list all six: ${shown.mkString(", ")}")
    val desc = spark.sql("DESCRIBE PROCEDURE graft_proc.system.expire_snapshots")
      .collect().map(_.toSeq.mkString("|")).mkString("\n")
    assert(desc.contains("expire_snapshots"))
  }

  test("create_tag/create_branch/drop_ref manage refs from SQL; tags time-travel") {
    root
    spark.sql("CREATE TABLE graft_proc.refs (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary_keys'='id')")
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.mode("append").insertInto("graft_proc.refs")
    // tag the 2-row state, then append more
    val tagged = spark.sql(
      "CALL graft_proc.system.create_tag(table => 'refs', name => 'v2rows')")
      .collect()(0).getLong(0)
    assert(tagged > 0)
    Seq((3L, 30L)).toDF("id", "v").write.mode("append").insertInto("graft_proc.refs")
    assert(spark.sql("SELECT count(*) FROM graft_proc.refs").collect()(0).getLong(0) == 3)
    // SQL time travel to the SQL-created tag
    assert(spark.sql("SELECT count(*) FROM graft_proc.refs VERSION AS OF 'v2rows'")
      .collect()(0).getLong(0) == 2)
    // branch from the tag; head sits at the tagged snapshot
    val bHead = spark.sql(
      "CALL graft_proc.system.create_branch(table => 'refs', name => 'dev', " +
        "version => 'v2rows')").collect()(0).getLong(0)
    assert(bHead == tagged)
    assert(spark.sql("SELECT count(*) FROM graft_proc.refs VERSION AS OF 'dev'")
      .collect()(0).getLong(0) == 2)
    // versions metadata table shows both refs
    val refNames = spark.sql(
      "SELECT explode(refs) AS r FROM graft_proc.refs.versions")
      .collect().map(_.getString(0)).toSet
    assert(refNames.exists(_.contains("v2rows")) && refNames.exists(_.contains("dev")),
      s"got $refNames")
    // drop both; protections still hold for main
    spark.sql("CALL graft_proc.system.drop_ref(table => 'refs', name => 'dev')")
    spark.sql("CALL graft_proc.system.drop_ref(table => 'refs', name => 'v2rows')")
    val gone = intercept[Exception](spark.sql(
      "SELECT count(*) FROM graft_proc.refs VERSION AS OF 'v2rows'").collect())
    assert(gone.getMessage.contains("v2rows"))
    val mainProtected = intercept[Exception](spark.sql(
      "CALL graft_proc.system.drop_ref(table => 'refs', name => 'main')").collect())
    assert(mainProtected.getMessage.toLowerCase.contains("main") ||
      mainProtected.getMessage.contains("not found"))
  }

  test("fast_forward publishes an audited branch through SQL") {
    root
    spark.sql("CREATE TABLE graft_proc.wap (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary_keys'='id')")
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.mode("append").insertInto("graft_proc.wap")
    spark.sql("CALL graft_proc.system.create_branch(table => 'wap', name => 'audit')")
    // stage on the audit branch via the API (SQL writes target main)
    val ds = core.SpaceDataset.load(spark, root + "/wap")
    ds.append(Seq((3L, 30L)).toDF("id", "v"), branch = "audit")
    assert(spark.sql("SELECT count(*) FROM graft_proc.wap").collect()(0).getLong(0) == 2)
    val head = spark.sql(
      "CALL graft_proc.system.fast_forward(table => 'wap', to_branch => 'audit')")
      .collect()(0).getLong(0)
    assert(head > 0)
    assert(spark.sql("SELECT count(*) FROM graft_proc.wap").collect()(0).getLong(0) == 3)
    // re-publishing with no new audited commits is an idempotent no-op
    val again = spark.sql(
      "CALL graft_proc.system.fast_forward(table => 'wap', to_branch => 'audit')")
      .collect()(0).getLong(0)
    assert(again == head, s"retried publish moved the head: $head -> $again")
    assert(spark.sql("SELECT count(*) FROM graft_proc.wap").collect()(0).getLong(0) == 3)
  }

  test("unknown procedure and bad table fail with clear errors") {
    root
    val e1 = intercept[Exception](spark.sql("CALL graft_proc.system.nope()").collect())
    assert(e1.getMessage.contains("nope") || e1.getMessage.contains("PROCEDURE"))
    val e2 = intercept[Exception](spark.sql(
      "CALL graft_proc.system.compact(table => 'missing', target_file_rows => 10)").collect())
    assert(e2.getMessage.toLowerCase.contains("missing") ||
      e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
  }
}
