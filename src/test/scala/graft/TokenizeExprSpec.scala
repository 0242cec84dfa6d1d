package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}

/** The native tokenizer ([[org.apache.spark.sql.graftshim.TokenizeExpr]] /
  * [[org.apache.spark.sql.graftshim.TokenCountExpr]]) replaced the
  * `filter(split(c, "\\s+"), _ != "")` HOF form on every text hot path
  * (round-16 optimization). Its contract is BYTE-IDENTICAL output, so
  * this spec pins equivalence against the old expression tree over an
  * adversarial corpus plus the real documents table. */
class TokenizeExprSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** The pre-r16 expression tree, verbatim. */
  private def oldTokens(c: org.apache.spark.sql.Column) =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  private val adversarial = Seq(
    "", " ", "   ", "a", " a", "a ", " a ", "a b", "a  b", "\ta\nb\r c\f",
    " verticaltab ", "multi  \t\n  space", "ünïcödé tökens",
    "emoji 😀 works", "trailing\n", "\t\t", "一 二　三", // U+3000 is NOT Java \s
    "dash-joined stays one", "a b") // NBSP is not Java \s either

  test("native tokens == filter(split) on adversarial strings") {
    val df = adversarial.toDF("text")
    val got = df.select(TF.tokens(col("text"))).collect().map(_.getSeq[String](0))
    val exp = df.select(oldTokens(col("text"))).collect().map(_.getSeq[String](0))
    got.zip(exp).zip(adversarial).foreach { case ((g, e), s) =>
      assert(g == e, s"tokens mismatch on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("native tokenCount == size(filter(split)) incl. NULL semantics") {
    val df = (adversarial :+ null).toDF("text")
    val got = df.select(TF.tokenCount(col("text"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0))
    val exp = df.select(size(oldTokens(col("text")))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == exp.toSeq)
  }

  test("native tokens == filter(split) on the documents corpus") {
    val docs = Tables.read(spark, sfDir, "documents")
    val diff = docs.select(TF.tokens(col("text")).as("a"), oldTokens(col("text")).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.isEmpty, diff.limit(3).collect().mkString("\n"))
  }

  test("tokenize participates in whole-stage codegen (no HOF fallback)") {
    // parquet-backed source: a local Seq folds into a LocalTableScan
    // before codegen ever sees the expression
    val df = Tables.read(spark, sfDir, "documents")
      .select(TF.tokens(col("text")).as("ts"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_tokenize"), plan)
    assert(!plan.contains("ArrayFilter") && !plan.contains("lambdafunction"), plan)
  }
}
