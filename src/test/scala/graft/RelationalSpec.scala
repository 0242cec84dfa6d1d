package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  for (name <- operators.Relational.queries.keys.toSeq.sorted) {
    test(s"$name runs and returns rows") {
      val df = operators.Relational.queries(name)(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has a matching oracle") {
    assert(operators.Relational.oracleSql.keySet == operators.Relational.queries.keySet)
  }

  test("q2 pushes filters and prunes columns at the parquet scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = operators.Relational.queries("q2_filter_project")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
    // ReadSchema must not include unprojected columns like l_returnflag
    assert(!scan.requiredSchema.fieldNames.contains("l_returnflag"),
      scan.requiredSchema.treeString)
  }

  test("q12 broadcasts the small dimension tables") {
    val df = operators.Relational.queries("q12_star_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q26 range join matches the naive interval join and avoids nested-loop") {
    import org.apache.spark.sql.functions._
    val df = operators.Relational.queries("q26_range_join")(spark, sfDir)
    // equi-join on the bucket key, never a nested-loop/cartesian plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // ground truth: the raw O(n·m) predicate join on the same inputs
    val ev = Tables.read(spark, sfDir, "events")
    val points = ev.select(col("event_id"),
      functions.EventTime.epochSeconds(ev.schema, "ts").as("es"))
    val windows = spark.range(0, 200).toDF("w_id")
      .select(col("w_id"), (lit(1704067200L) + col("w_id") * 12960L).as("w_start"))
      .withColumn("w_end", col("w_start") + (pmod(col("w_id"), lit(5L)) + 1L) * 3600L)
    val naive = points.join(windows,
        col("es") >= col("w_start") && col("es") < col("w_end"))
      .select(col("event_id"), col("w_id"))
    assert(df.exceptAll(naive).isEmpty && naive.exceptAll(df).isEmpty)
    assert(df.count() > 0)
  }

  test("range join fails loudly when one range explodes past the bucket cap") {
    import org.apache.spark.sql.functions._
    val points = spark.range(0, 10).toDF("p")
    val ranges = spark.range(0, 1).toDF("rid")
      .withColumn("s", lit(0L)).withColumn("e", lit(1000000L))
    val joined = operators.RangeJoin.rangeJoin(
      points, "p", ranges, "s", "e", bucketWidth = 1L, maxBucketsPerRange = 1000L)
    val ex = intercept[Exception](joined.count())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +: messages(e.getCause))
    assert(messages(ex).exists(_.contains("spans more than 1000 buckets")),
      messages(ex).mkString(" | "))
    // within the cap, the same call works
    val ok = operators.RangeJoin.rangeJoin(
      points, "p", ranges, "s", "e", bucketWidth = 10000L, maxBucketsPerRange = 1000L)
    assert(ok.count() == 10)
  }

  test("range join fuzz: random widths/domains (incl. negative + empty ranges) match naive") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val width = 1L + rnd.nextInt(50)
      val domain = 500
      val nPoints = 300
      val nRanges = 80
      val points = spark.range(0, nPoints).toDF("pid")
        .withColumn("p", pmod(xxhash64(col("pid"), lit(trial)), lit(2L * domain)) - domain)
      // ~1/8 of ranges deliberately inverted/empty — they must match nothing
      val ranges = spark.range(0, nRanges).toDF("rid")
        .withColumn("s", pmod(xxhash64(col("rid"), lit(trial + 100)), lit(2L * domain)) - domain)
        .withColumn("len", pmod(xxhash64(col("rid"), lit(trial + 200)), lit(120L)) - 15L)
        .withColumn("e", col("s") + col("len"))
      val got = operators.RangeJoin.rangeJoin(points, "p", ranges, "s", "e", width)
        .select(col("pid"), col("rid"))
      val naive = points.join(ranges, col("p") >= col("s") && col("p") < col("e"))
        .select(col("pid"), col("rid"))
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"trial $trial width $width mismatched")
    }
  }
}
