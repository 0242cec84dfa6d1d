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
}
