package graft

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** ±0.0 parquet-pushdown soundness (FloatingZeroRewrite).
  *
  * Upstream behavior being guarded: parquet-mr's row-group filters use
  * the type-defined TOTAL order (-0.0 < +0.0) and boxed dictionary
  * equality, while Spark SQL evaluates -0.0 = 0.0 as true — so vanilla
  * pushed predicates silently drop row groups whose zeros carry the
  * "wrong" sign bit. Each file below holds ONE value class, so a
  * wrongly-dropped row group is a visibly missing id range. */
class FloatingZeroSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val A = (0 until 100).map(_.toLong) // v = -0.0
  private val B = (100 until 200).map(_.toLong) // v = +0.0
  private val C = (200 until 300).map(_.toLong) // v = -5.5
  private val D = (300 until 400).map(_.toLong) // v = 7.25
  private val E = (400 until 500).map(_.toLong) // v = NaN
  private val F = (500 until 600).map(_.toLong) // v = null

  private lazy val ds: SpaceDataset = {
    val loc = Files.createTempDirectory("graft_fzero_").toString + "/tbl"
    val schema = Seq((0L, Option(0.0d))).toDF("id", "v").schema
    val d = SpaceDataset.create(spark, loc, schema, Seq("id"))
    def app(ids: Seq[Long], v: Option[Double]): Unit =
      d.append(ids.map(i => (i, v)).toDF("id", "v").repartition(1))
    app(A, Some(-0.0d)); app(B, Some(0.0d)); app(C, Some(-5.5d))
    app(D, Some(7.25d)); app(E, Some(Double.NaN)); app(F, None)
    d
  }

  private def idsVia(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  /** Assert BOTH read paths (read(filter=…) and readAll().filter) agree
    * with the expected id set. */
  private def check(pred: Column, expected: Seq[Long], clue: String): Unit = {
    assert(idsVia(ds.read(filter = Some(pred))) == expected.toSet,
      s"$clue via read(filter)")
    assert(idsVia(ds.readAll().filter(pred)) == expected.toSet,
      s"$clue via readAll().filter")
  }

  test("equality to zero reaches both zero sign bits, all paths") {
    check(col("v") === 0.0d, A ++ B, "v = 0.0")
    check(col("v") === -0.0d, A ++ B, "v = -0.0")
    check(lit(0.0d) === col("v"), A ++ B, "0.0 = v")
    check(col("v") <=> 0.0d, A ++ B, "v <=> 0.0")
    check(!(col("v") <=> 0.0d), C ++ D ++ E ++ F, "NOT(v <=> 0.0)")
    check(col("v") =!= 0.0d, C ++ D ++ E, "v != 0.0 (null stays dropped)")
  }

  test("inclusive zero bounds keep the opposite-sign-bit row groups") {
    check(col("v") >= 0.0d, A ++ B ++ D ++ E, "v >= 0.0 (NaN above all)")
    check(col("v") <= -0.0d, A ++ B ++ C, "v <= -0.0")
    check(lit(0.0d) <= col("v"), A ++ B ++ D ++ E, "0.0 <= v")
    check(lit(-0.0d) >= col("v"), A ++ B ++ C, "-0.0 >= v")
    // strict bounds were already sound — semantics unchanged
    check(col("v") < 0.0d, C, "v < 0.0")
    check(col("v") > 0.0d, D ++ E, "v > 0.0")
  }

  test("IN lists with a zero candidate, both In and InSet forms") {
    check(col("v").isin(0.0d, 7.25d), A ++ B ++ D, "v IN (0.0, 7.25)")
    // > 10 literals force OptimizeIn's InSet conversion
    val big = Seq(0.0d, 7.25d, 1d, 2d, 3d, 4d, 5d, 6d, 8d, 9d, 10d, 11d)
    check(col("v").isin(big.map(Double.box): _*), A ++ B ++ D, "12-element IN")
  }

  test("NaN point probe follows Spark's NaN = NaN") {
    check(col("v") === lit(Double.NaN), E, "v = NaN")
  }

  test("float32 columns: zero probes rewrite through the cast-unwrap path") {
    // a FloatType column probed with a DOUBLE literal goes through
    // Cast(vf as double) = 0.0, which UnwrapCastInBinaryComparison
    // turns back into a float comparison — the rewrite must fire on
    // the float literal form too
    val loc = Files.createTempDirectory("graft_fzero32_").toString + "/tbl"
    val schema = Seq((0L, 0.0f)).toDF("id", "vf").schema
    val d = SpaceDataset.create(spark, loc, schema, Seq("id"))
    d.append((0 until 50).map(i => (i.toLong, -0.0f)).toDF("id", "vf").repartition(1))
    d.append((50 until 100).map(i => (i.toLong, 0.0f)).toDF("id", "vf").repartition(1))
    d.append((100 until 150).map(i => (i.toLong, 2.5f)).toDF("id", "vf").repartition(1))
    def ids(pred: Column): Set[Long] =
      idsVia(d.readAll().filter(pred)) // later-filter path: optimizer rule only
    assert(ids(col("vf") === 0.0f) == (0L until 100L).toSet, "float literal")
    assert(ids(col("vf") === 0.0d) == (0L until 100L).toSet, "double literal via cast")
    assert(ids(col("vf") >= lit(0.0f)) == (0L until 100L).toSet ++ (100L until 150L), ">= 0.0f")
    assert(idsVia(d.read(filter = Some(col("vf") === 0.0f))) == (0L until 100L).toSet,
      "read(filter) path")
  }

  test("the optimizer rule rewrites the pushed condition (plan-visible)") {
    val df = ds.readAll().filter(col("v") === 0.0d)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains(">= -0.0"), s"zero equality not rewritten:\n$opt")
    // SQL path through a temp view optimizes identically
    ds.readAll().createOrReplaceTempView("fzero_t")
    assert(idsVia(spark.sql("SELECT id FROM fzero_t WHERE v = 0.0")) == (A ++ B).toSet)
  }
}
