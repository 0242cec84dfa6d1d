package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.views._

/** Incrementally-maintained GROUP BY views (AggregateView): state must
  * equal a from-scratch recompute after every refresh, deletes must
  * stay arithmetic unless they hit a stored extremum, and the refresh
  * must be delta-sized (watermark no-ops, one commit per snapshot). */
class AggregateViewSpec extends AnyFunSuite {
  import TestSpark._

  private def freshLoc(p: String): String =
    Files.createTempDirectory(s"graft_$p").toString + "/tbl"

  private def lineitem = Tables.read(spark, sfDir, "lineitem")

  private def sourceTable(): SpaceDataset = {
    val li = lineitem.filter(col("l_orderkey") <= 2000L)
    val ds = SpaceDataset.create(spark, freshLoc("aggsrc"), li.schema,
      Seq("l_orderkey", "l_linenumber"))
    ds.append(li)
    ds
  }

  private def specs = Seq(
    AggSpec.countAll("n_rows"),
    AggSpec.sum("l_quantity", "sum_qty"),
    AggSpec.avg("l_quantity", "avg_qty"),
    AggSpec.min("l_quantity", "min_qty"),
    AggSpec.max("l_quantity", "max_qty"),
    AggSpec.count("l_comment_is_null_free", "n_c"))

  /** Compare with doubles rounded (the driver's oracle gate rounds to
    * 6 decimals too): incremental +/− reorders float additions, so
    * sums legitimately differ in the last ulp from a fresh recompute. */
  private def assertSame(got: DataFrame, exp: DataFrame): Unit = {
    assert(got.schema.fieldNames.sorted.sameElements(exp.schema.fieldNames.sorted))
    def rounded(df: DataFrame): DataFrame =
      df.select(df.schema.fields.toSeq.map { f =>
        if (f.dataType == org.apache.spark.sql.types.DoubleType) round(col(f.name), 4).as(f.name)
        else col(f.name)
      }: _*)
    val g = rounded(got.select(exp.columns.map(col): _*))
    val e = rounded(exp)
    assert(g.exceptAll(e).isEmpty && e.exceptAll(g).isEmpty)
  }

  test("agg plan JSON roundtrips; unknown node rejected by both loaders") {
    val p = AggPlan("/tmp/x", List("a", "b"),
      List(AggSpec.sum("v", "s"), AggSpec.countAll("n")))
    assert(AggPlan.fromJson(p.json) == p)
    intercept[IllegalArgumentException](AggPlan.fromJson("""{"type":"read"}"""))
    // a ViewPlan loader must refuse an aggregate plan by name
    intercept[IllegalArgumentException](ViewPlan.fromJson(p.json))
  }

  test("initial refresh equals full recompute; watermark no-ops a second refresh") {
    val src0 = lineitem.filter(col("l_orderkey") <= 2000L)
      .withColumn("l_comment_is_null_free",
        when(col("l_orderkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("l_returnflag")))
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), src0.schema,
      Seq("l_orderkey", "l_linenumber"))
    src.append(src0)
    val av = AggregateView.create(spark, freshLoc("aggmv"), src,
      Seq("l_returnflag", "l_linestatus"), specs)
    assert(av.refresh() == 1)
    assertSame(av.read(), src.readAll().groupBy("l_returnflag", "l_linestatus").agg(
      count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"),
      avg("l_quantity").as("avg_qty"), min("l_quantity").as("min_qty"),
      max("l_quantity").as("max_qty"), count(col("l_comment_is_null_free")).as("n_c")))
    assert(av.refresh() == 0) // already at source head
  }

  test("append-only maintenance is pure arithmetic (no recompute)") {
    // seed HALF the keyspace so the follow-up append carries real rows
    // (sf0.001 orderkeys top out ~1500; an out-of-range append is a
    // zero-row snapshot, which refresh now skips as CDC-silent)
    val seed = lineitem.filter(col("l_orderkey") <= 1000L)
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), seed.schema,
      Seq("l_orderkey", "l_linenumber"))
    src.append(seed)
    val av = AggregateView.create(spark, freshLoc("aggmv"), src,
      Seq("l_returnflag"), Seq(
        AggSpec.sum("l_quantity", "sum_qty"), AggSpec.min("l_quantity", "min_qty"),
        AggSpec.max("l_quantity", "max_qty"), AggSpec.countAll("n_rows")))
    av.refresh()
    src.append(lineitem.filter(col("l_orderkey") > 1000L && col("l_orderkey") <= 2000L))
    assert(av.refresh() == 1)
    assert(av.lastRecomputedGroups == 0L)
    assertSame(av.read(), src.readAll().groupBy("l_returnflag").agg(
      sum("l_quantity").as("sum_qty"), min("l_quantity").as("min_qty"),
      max("l_quantity").as("max_qty"), count(lit(1)).as("n_rows")))
  }

  test("bulk commit touching most groups refreshes without broadcast hints") {
    val seed = lineitem.filter(col("l_orderkey") <= 700L)
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), seed.schema,
      Seq("l_orderkey", "l_linenumber"))
    src.append(seed)
    val av = AggregateView.create(spark, freshLoc("aggmv"), src,
      Seq("l_orderkey"), // high-cardinality grouping: a bulk append touches MOST groups
      Seq(AggSpec.sum("l_quantity", "sum_qty"), AggSpec.countAll("n_rows")))
    assert(av.refresh() == 1)
    // bound far below the bulk delta: the affected-state join must NOT
    // be force-broadcast (a high-cardinality MV's touched state would
    // otherwise bypass autoBroadcastJoinThreshold — ADVICE r14 medium)
    spark.conf.set(ViewMaintenance.BroadcastMaxRowsKey, "100")
    try {
      src.append(lineitem.filter(col("l_orderkey") > 700L)) // ~3k rows, ~800 groups
      val gatedBefore = ViewMaintenance.broadcastsGated
      assert(av.refresh() == 1)
      assert(ViewMaintenance.broadcastsGated > gatedBefore,
        "the bulk delta's state joins must be planned without broadcast hints")
      assertSame(av.read(), src.readAll().groupBy("l_orderkey").agg(
        sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows")))
    } finally spark.conf.unset(ViewMaintenance.BroadcastMaxRowsKey)
  }

  test("coalesced refresh: one commit, state equals per-snapshot twin; silent snapshots skipped") {
    // PK-unique slices: upsert rejects the synthetic lineitem's
    // duplicate (okey, linenumber) pairs by design
    val uniq = lineitem.dropDuplicates("l_orderkey", "l_linenumber")
    val seed = uniq.filter(col("l_orderkey") <= 700L)
    val src = SpaceDataset.create(spark, freshLoc("aggcsrc"), seed.schema,
      Seq("l_orderkey", "l_linenumber"))
    src.append(seed)
    val view = AggregateView.create(spark, freshLoc("aggseq"), src,
      Seq("l_returnflag"), specs.take(5)) // count/sum/avg/min/max
    val twin = AggregateView.create(spark, freshLoc("aggcoal"), src,
      Seq("l_returnflag"), specs.take(5))
    view.refresh(); twin.refresh()

    // backlog: append + delete + upsert + CDC-silent compact
    src.append(uniq.filter(col("l_orderkey") > 700L && col("l_orderkey") <= 1100L))
    src.delete(col("l_suppkey") % 4 === 1)
    src.upsert(uniq.filter(col("l_orderkey") <= 80L && col("l_suppkey") % 4 =!= 1)
      .withColumn("l_quantity", col("l_quantity") + 5.0))
    src.compact(targetFileRows = 1000000L)
    assert(view.refresh() == 3, "per-snapshot: silent compact mints no commit")
    assert(twin.refresh(None, coalesce = true) == 1)
    assertSame(twin.read(), view.read())
    assertSame(twin.read(), src.readAll().groupBy("l_returnflag").agg(
      count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"),
      avg("l_quantity").as("avg_qty"), min("l_quantity").as("min_qty"),
      max("l_quantity").as("max_qty")))
    assert(view.refresh() == 0 && twin.refresh(None, coalesce = true) == 0)
  }

  test("interior and extremum deletes stay arithmetic; only a DRAINED reservoir recomputes") {
    val rows = spark.createDataFrame(Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 5.0), (5L, "b", 50.0))).toDF("id", "g", "v")
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), rows.schema, Seq("id"))
    src.append(rows)
    val av = AggregateView.create(spark, freshLoc("aggmv"), src, Seq("g"), Seq(
      AggSpec.min("v", "min_v"), AggSpec.max("v", "max_v"),
      AggSpec.sum("v", "sum_v"), AggSpec.countAll("n")))
    av.refresh()

    // id=2 (v=20, strictly inside a's [10,30]) — invertible, no reread
    src.delete(col("id") === 2L)
    av.refresh()
    assert(av.lastRecomputedGroups == 0L)
    assertSame(av.read(), src.readAll().groupBy("g").agg(
      min("v").as("min_v"), max("v").as("max_v"),
      sum("v").as("sum_v"), count(lit(1)).as("n")))

    // id=3 (v=30 == a's max): pre-reservoir this forced a group
    // recompute; the extremum reservoir tracks the runner-up, so it
    // stays pure arithmetic
    src.delete(col("id") === 3L)
    av.refresh()
    assert(av.lastRecomputedGroups == 0L,
      s"reservoir should absorb an extremum delete, got ${av.lastRecomputedGroups}")
    assertSame(av.read(), src.readAll().groupBy("g").agg(
      min("v").as("min_v"), max("v").as("max_v"),
      sum("v").as("sum_v"), count(lit(1)).as("n")))
  }

  test("deleting past the reservoir width drains it and recomputes exactly that group") {
    // group "deep" has 40 distinct values — beyond the k=16 reservoir —
    // and loses its 20 smallest in one delete: the min reservoir drains
    // (all 16 tracked values gone, more beyond the bound), so exactly
    // this group recomputes; group "other" stays arithmetic
    val rows = (0 until 40).map(i => (i.toLong, "deep", i.toDouble)) ++
      Seq((100L, "other", 1.0), (101L, "other", 2.0))
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"),
      spark.createDataFrame(rows).toDF("id", "g", "v").schema, Seq("id"))
    src.append(spark.createDataFrame(rows).toDF("id", "g", "v"))
    val av = AggregateView.create(spark, freshLoc("aggmv"), src, Seq("g"), Seq(
      AggSpec.min("v", "min_v"), AggSpec.max("v", "max_v"), AggSpec.countAll("n")))
    av.refresh()
    assert(av.plan.reservoirK > 0, "new views must carry reservoirs")

    src.delete(col("g") === "deep" && col("id") < 20L)
    av.refresh()
    assert(av.lastRecomputedGroups == 1L,
      s"drained min reservoir must recompute its one group, got ${av.lastRecomputedGroups}")
    assertSame(av.read(), src.readAll().groupBy("g").agg(
      min("v").as("min_v"), max("v").as("max_v"), count(lit(1)).as("n")))

    // the rebuilt reservoir absorbs the next extremum delete again
    src.delete(col("g") === "deep" && col("id") === 20L)
    av.refresh()
    assert(av.lastRecomputedGroups == 0L)
    assertSame(av.read(), src.readAll().groupBy("g").agg(
      min("v").as("min_v"), max("v").as("max_v"), count(lit(1)).as("n")))
  }

  test("broad delete hitting every group's extremum recomputes every group — once") {
    // the s_mv_agg shape: a wide predicate delete that clips each
    // group's min. The O(delta) claim must stay MEASURED: the refresh
    // recomputes exactly the extremum-hit groups (all of them here),
    // not zero and not more than the group count
    val rows = (0 until 400).map(i => (i.toLong, s"g${i % 4}", i.toDouble))
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"),
      spark.createDataFrame(rows).toDF("id", "g", "v").schema, Seq("id"))
    src.append(spark.createDataFrame(rows).toDF("id", "g", "v"))
    val av = AggregateView.create(spark, freshLoc("aggmv"), src, Seq("g"), Seq(
      AggSpec.min("v", "min_v"), AggSpec.max("v", "max_v"),
      AggSpec.sum("v", "sum_v"), AggSpec.countAll("n")))
    av.refresh()

    // every group's smallest ids go — each group's stored min is hit
    src.delete(col("id") < 100L)
    av.refresh()
    assert(av.lastRecomputedGroups == 4L,
      s"expected all 4 extremum-hit groups recomputed, got ${av.lastRecomputedGroups}")
    assertSame(av.read(), src.readAll().groupBy("g").agg(
      min("v").as("min_v"), max("v").as("max_v"),
      sum("v").as("sum_v"), count(lit(1)).as("n")))

    // a second, strictly-interior broad delete stays fully arithmetic
    src.delete(col("id") >= 150L && col("id") < 250L)
    av.refresh()
    assert(av.lastRecomputedGroups == 0L,
      s"interior broad delete must not recompute, got ${av.lastRecomputedGroups}")
    assertSame(av.read(), src.readAll().groupBy("g").agg(
      min("v").as("min_v"), max("v").as("max_v"),
      sum("v").as("sum_v"), count(lit(1)).as("n")))
  }

  test("group emptied by deletes disappears; reappears on new rows") {
    val rows = spark.createDataFrame(Seq(
      (1L, "a", 1.0), (2L, "b", 2.0))).toDF("id", "g", "v")
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), rows.schema, Seq("id"))
    src.append(rows)
    val av = AggregateView.create(spark, freshLoc("aggmv"), src, Seq("g"),
      Seq(AggSpec.sum("v", "sum_v"), AggSpec.countAll("n")))
    av.refresh()
    src.delete(col("g") === "a")
    av.refresh()
    assert(av.read().filter(col("g") === "a").count() == 0L)
    assert(av.read().count() == 1L)
    src.append(spark.createDataFrame(Seq((3L, "a", 7.0))).toDF("id", "g", "v"))
    av.refresh()
    assertSame(av.read(), src.readAll().groupBy("g")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n")))
  }

  test("all-null aggregate inputs follow SQL semantics (NULL sum/avg/min/max, 0 count)") {
    val rows = spark.createDataFrame(Seq(
      (1L, "a", Some(3.0)), (2L, "a", None: Option[Double]), (3L, "b", None: Option[Double])))
      .toDF("id", "g", "v")
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), rows.schema, Seq("id"))
    src.append(rows)
    val av = AggregateView.create(spark, freshLoc("aggmv"), src, Seq("g"), Seq(
      AggSpec.sum("v", "sum_v"), AggSpec.avg("v", "avg_v"), AggSpec.min("v", "min_v"),
      AggSpec.max("v", "max_v"), AggSpec.count("v", "n_v"), AggSpec.countAll("n")))
    av.refresh()
    val b = av.read().filter(col("g") === "b").collect()(0)
    assert(b.isNullAt(b.fieldIndex("sum_v")) && b.isNullAt(b.fieldIndex("avg_v")) &&
      b.isNullAt(b.fieldIndex("min_v")) && b.isNullAt(b.fieldIndex("max_v")))
    assert(b.getLong(b.fieldIndex("n_v")) == 0L && b.getLong(b.fieldIndex("n")) == 1L)

    // deleting the only non-null value of group a must null its aggs
    // (extremum delete path: the stored min/max die with the row)
    src.delete(col("id") === 1L)
    av.refresh()
    val a = av.read().filter(col("g") === "a").collect()(0)
    assert(a.isNullAt(a.fieldIndex("sum_v")) && a.isNullAt(a.fieldIndex("min_v")))
    assert(a.getLong(a.fieldIndex("n")) == 1L)
  }

  test("upsert (delete+add of same PK in one snapshot) maintains correctly") {
    // orders: PK-unique source (testdata lineitem has duplicate
    // (l_orderkey, l_linenumber) pairs, so upsert rejects it by design)
    val o = Tables.read(spark, sfDir, "orders").filter(col("o_orderkey") <= 2000L)
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), o.schema, Seq("o_orderkey"))
    src.append(o)
    val av = AggregateView.create(spark, freshLoc("aggmv"), src,
      Seq("o_orderstatus"), Seq(AggSpec.sum("o_totalprice", "sum_price"),
        AggSpec.countAll("n_rows"), AggSpec.max("o_totalprice", "max_price")))
    av.refresh()
    // bump prices of a slice via upsert: same PKs, new values
    val bumped = src.readAll().filter(col("o_orderkey") <= 300L)
      .withColumn("o_totalprice", col("o_totalprice") + 1000000.0)
    src.upsert(bumped)
    assert(av.refresh() == 1)
    assertSame(av.read(), src.readAll().groupBy("o_orderstatus").agg(
      sum("o_totalprice").as("sum_price"), count(lit(1)).as("n_rows"),
      max("o_totalprice").as("max_price")))
  }

  test("expired source history between refreshes: the view REBUILDS instead of failing") {
    val rows = spark.createDataFrame(Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))).toDF("id", "g", "v")
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), rows.schema, Seq("id"))
    src.append(rows)
    val av = AggregateView.create(spark, freshLoc("aggmv"), src, Seq("g"), Seq(
      AggSpec.sum("v", "sum_v"), AggSpec.min("v", "min_v"), AggSpec.countAll("n")))
    assert(av.refresh() == 1)

    // two more source commits, then expire EVERYTHING between the
    // watermark and the head — the CDC walk is now impossible
    src.append(spark.createDataFrame(Seq((4L, "b", 50.0))).toDF("id", "g", "v"))
    src.delete(col("id") === 1L)
    src.expireSnapshots(olderThanMs = -1000L, keepLast = 1)
    src.garbageCollect(minAgeMs = 0L)

    assert(av.refresh() == 1, "expired history must trigger a one-commit rebuild")
    assertSame(av.read(), src.readAll().groupBy("g").agg(
      sum("v").as("sum_v"), min("v").as("min_v"), count(lit(1)).as("n")))
    // and the rebuilt watermark resumes INCREMENTAL maintenance
    src.append(spark.createDataFrame(Seq((5L, "a", 7.0))).toDF("id", "g", "v"))
    assert(av.refresh() == 1)
    assert(av.lastRecomputedGroups == 0L)
    assertSame(av.read(), src.readAll().groupBy("g").agg(
      sum("v").as("sum_v"), min("v").as("min_v"), count(lit(1)).as("n")))
  }

  test("NULL group-by key is rejected with a clear error") {
    val rows = spark.createDataFrame(Seq(
      (1L, Some("a"), 1.0), (2L, None: Option[String], 2.0))).toDF("id", "g", "v")
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), rows.schema, Seq("id"))
    src.append(rows)
    val av = AggregateView.create(spark, freshLoc("aggmv"), src, Seq("g"),
      Seq(AggSpec.countAll("n")))
    val e = intercept[IllegalArgumentException](av.refresh())
    assert(e.getMessage.contains("NULL group-by key"))
  }

  test("streaming refresh follows source commits and survives restart without re-applying") {
    val rows = spark.createDataFrame(Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))).toDF("id", "g", "v")
    val root = Files.createTempDirectory("graft_aggstream_").toString
    val src = SpaceDataset.create(spark, s"$root/src", rows.schema, Seq("id"))
    src.append(rows)
    val av = AggregateView.create(spark, s"$root/aggmv", src, Seq("g"),
      Seq(AggSpec.sum("v", "sum_v"), AggSpec.countAll("n")))

    val q1 = av.refreshStream(s"$root/ckpt")
    try {
      q1.processAllAvailable()
      src.append(spark.createDataFrame(Seq((4L, "b", 15.0))).toDF("id", "g", "v"))
      src.delete(col("id") === 1L)
      q1.processAllAvailable()
    } finally q1.stop()
    av.dataset.refresh()
    assert(av.read().orderBy("g").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq(("a", 20.0, 1L), ("b", 20.0, 2L)))
    val watermark = av.refreshedTo
    val commits = av.dataset.storage.versions.length

    // restart from the same checkpoint with no new source commits:
    // replayed/empty batches must not commit new state snapshots
    val q2 = av.refreshStream(s"$root/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    av.dataset.refresh()
    assert(av.refreshedTo == watermark)
    assert(av.dataset.storage.versions.length == commits)
  }

  test("load() rebinds from the persisted plan; refresh resumes from watermark") {
    val seed = lineitem.filter(col("l_orderkey") <= 1000L)
    val src = SpaceDataset.create(spark, freshLoc("aggsrc"), seed.schema,
      Seq("l_orderkey", "l_linenumber"))
    src.append(seed)
    val loc = freshLoc("aggmv")
    val av = AggregateView.create(spark, loc, src, Seq("l_linestatus"),
      Seq(AggSpec.sum("l_extendedprice", "sum_price"), AggSpec.countAll("n")))
    av.refresh()
    src.append(lineitem.filter(col("l_orderkey") > 1000L && col("l_orderkey") <= 2000L))

    val re = AggregateView.load(spark, loc)
    assert(re.plan.groupBy == List("l_linestatus"))
    assert(re.refresh() == 1)
    assertSame(re.read(), src.readAll().groupBy("l_linestatus").agg(
      sum("l_extendedprice").as("sum_price"), count(lit(1)).as("n")))
    // MaterializedView.load must refuse the aggregate plan by name
    intercept[IllegalArgumentException](MaterializedView.load(spark, loc))
  }

  test("filtered view: symmetric add/delete filtering, boundary-crossing updates, SQL") {
    val rows = spark.createDataFrame(Seq(
      (1L, "a", 10.0), (2L, "a", 30.0), (3L, "b", 40.0), (4L, "b", 5.0)))
      .toDF("id", "g", "v")
    val src = SpaceDataset.create(spark, freshLoc("fsrc"), rows.schema, Seq("id"))
    src.append(rows)
    val av = AggregateView.create(spark, freshLoc("fview"), src, Seq("g"),
      Seq(AggSpec.countAll("n"), AggSpec.sum("v", "sum_v"),
        AggSpec.min("v", "min_v")), filter = Some("v > 20"))
    assert(av.refresh() == 1)
    def expect() = src.readAll().filter(col("v") > 20).groupBy("g").agg(
      count(lit(1)).as("n"), sum("v").as("sum_v"), min("v").as("min_v"))
    assertSame(av.read(), expect())

    // appends/deletes maintain through the filter incrementally
    src.append(spark.createDataFrame(Seq((5L, "a", 50.0), (6L, "c", 21.0),
      (7L, "c", 15.0))).toDF("id", "g", "v"))
    src.delete(col("id") === 2L)
    assert(av.refresh() == 2)
    assertSame(av.read(), expect())

    // an update moving a row ACROSS the filter boundary retracts it;
    // one moving INTO the filter admits it
    src.update(col("id") === 5L, Map("v" -> lit(3.0)))   // leaves the view
    src.update(col("id") === 7L, Map("v" -> lit(99.0)))  // enters the view
    assert(av.refresh() == 2)
    assertSame(av.read(), expect())
    // group "a" lost its only qualifying row -> no state row for it
    assert(av.read().filter(col("g") === "a").count() == 0)

    // a group fully below the filter never exists; reload round-trips
    // the plan's filter
    val re = AggregateView.load(spark, av.dataset.location)
    assert(re.plan.filter.contains("v > 20"))
    assert(re.refresh() == 0)

    // nondeterministic filters rejected at create
    intercept[IllegalArgumentException] {
      AggregateView.create(spark, freshLoc("fbad"), src, Seq("g"),
        Seq(AggSpec.countAll("n")), filter = Some("rand() > 0.5"))
    }
    // malformed filters fail at create, not first refresh
    intercept[Exception] {
      AggregateView.create(spark, freshLoc("fbad2"), src, Seq("g"),
        Seq(AggSpec.countAll("n")), filter = Some("no_such_col > 1"))
    }
  }

  test("refresh to a target BELOW the watermark is a caller error, not a rebuild") {
    val rows = spark.createDataFrame(Seq(
      (1L, "a", 10.0), (2L, "b", 20.0))).toDF("id", "g", "v")
    val src = SpaceDataset.create(spark, freshLoc("aggsrc_below"), rows.schema, Seq("id"))
    src.append(rows)
    val oldHead = src.storage.metadata.currentSnapshotId
    val av = AggregateView.create(spark, freshLoc("aggmv_below"), src, Seq("g"),
      Seq(AggSpec.sum("v", "sum_v")))
    src.append(spark.createDataFrame(Seq((3L, "a", 5.0))).toDF("id", "g", "v"))
    assert(av.refresh() >= 1) // watermark past oldHead
    // oldHead still exists: asking for it must surface, not full-rebuild
    val e = intercept[IllegalArgumentException](
      av.refresh(targetVersion = Some(oldHead.toString)))
    assert(!e.isInstanceOf[graft.core.ExpiredHistoryException])
  }

  test("widening a view-consumed source column fails the NEXT refresh loudly") {
    val rows = spark.createDataFrame(Seq(
      (1L, "a", 10), (2L, "b", 20), (3L, "a", 7))).toDF("id", "g", "v")
    val src = SpaceDataset.create(spark, freshLoc("aggsrc_widen"), rows.schema, Seq("id"))
    src.append(rows)
    val av = AggregateView.create(spark, freshLoc("aggmv_widen"), src, Seq("g"),
      Seq(AggSpec.sum("v", "sum_v"), AggSpec.min("v", "min_v")))
    assert(av.refresh() == 1)
    // widening an UNCONSUMED column is harmless to the view
    src.addColumn("w", org.apache.spark.sql.types.IntegerType)
    src.widenColumn("w", org.apache.spark.sql.types.LongType)
    src.append(spark.createDataFrame(Seq((4L, "b", 3))).toDF("id", "g", "v")
      .withColumn("w", lit(null).cast("bigint")))
    assert(av.refresh() >= 1)
    // int→double on the summed/min'd column changes the partial types:
    // the state merge's casts would TRUNCATE silently — refresh must
    // refuse with recreate guidance instead (ADVICE r11)
    src.widenColumn("v", org.apache.spark.sql.types.DoubleType)
    src.append(spark.createDataFrame(Seq((5L, "a", 2.5)))
      .toDF("id", "g", "v").withColumn("w", lit(null).cast("bigint")))
    val e = intercept[IllegalStateException](av.refresh())
    assert(e.getMessage.contains("type-widened") && e.getMessage.contains("recreate"))
    // the state table is untouched by the failed refresh
    assert(av.read().collect().length == 2)
  }

  test("refresh self-compacts the state table past the file threshold") {
    // every refresh commit mints small state files; past the threshold
    // the refresh bin-packs its OWN table (CDC-silent), so a per-minute
    // streaming refresh can't accrete thousands of files
    spark.conf.set(ViewMaintenance.AutoCompactFilesKey, "3")
    try {
      val rows = spark.createDataFrame(
        (1L to 40L).map(i => (i, "g" + (i % 4), i.toInt))).toDF("id", "g", "v")
      val src = SpaceDataset.create(spark, freshLoc("aggsrc_ac"), rows.schema, Seq("id"))
      src.append(rows.filter(col("id") <= 10L))
      val av = AggregateView.create(spark, freshLoc("aggmv_ac"), src, Seq("g"),
        Seq(AggSpec.countAll("n"), AggSpec.sum("v", "sum_v")))
      av.refresh()
      (1L to 3L).foreach { k =>
        src.append(rows.filter(col("id") > k * 10L && col("id") <= (k + 1) * 10L))
        av.refresh()
      }
      // 4 refresh commits would have left >= 4 files; self-compaction
      // folded them (threshold 3)
      val files = av.dataset.indexFiles().size
      assert(files < 3, s"state table holds $files files; auto-compact must fire")
      // values stay exact through the maintenance
      val exp = rows.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      val got = av.read().select("g", "n", "sum_v")
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
      // disabled: no compaction, files accrue
      spark.conf.set(ViewMaintenance.AutoCompactFilesKey, "0")
      val before = av.dataset.indexFiles().size
      src.delete(col("id") % 7 === 1)
      av.refresh()
      assert(av.dataset.indexFiles().size >= before,
        "autoCompactFiles=0 must disable self-compaction")
    } finally spark.conf.unset(ViewMaintenance.AutoCompactFilesKey)
  }
}
