package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.operators.{Semantics, TextIndex, TokenPostingsTransform}
import graft.views._

/** Inverted text index as an incrementally-maintained EXPAND MV: the
  * postings table must track the source through appends AND deletes
  * (source deletes sweep every derived posting row), refresh must be
  * delta-only, the BM25-from-index path must equal the corpus-scan
  * BM25 bit-for-bit, and the term-clustered layout must make a query's
  * term point read prune posting files. */
class TextIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def freshLoc(p: String): String =
    Files.createTempDirectory(s"graft_$p").toString + "/tbl"

  private def docs = Tables.read(spark, sfDir, "documents")
    .select(col("doc_id"), col("lang"), col("text"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("dl"))

  private def sameRows(a: DataFrame, b: DataFrame, hint: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$hint: mismatch\nleft-only: ${a.exceptAll(b).limit(5).collect().mkString(", ")}\n" +
        s"right-only: ${b.exceptAll(a).limit(5).collect().mkString(", ")}")
  }

  private def build(): (SpaceDataset, MaterializedView, AggregateView) = {
    val src = SpaceDataset.create(spark, freshLoc("tisrc"), docs.schema, Seq("doc_id"))
    src.append(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
    val mv = View.ofDataset(src)
      .mapTransform(classOf[TokenPostingsTransform].getName,
        Map("textCol" -> "text", "idCol" -> "doc_id"))
      .materialize(spark, freshLoc("timv"), Seq("term", "doc_id"))
    val stats = AggregateView.create(spark, freshLoc("tist"), src, Seq("lang"),
      Seq(AggSpec.countAll("n"), AggSpec.count("dl", "n_dl"), AggSpec.sum("dl", "sum_dl")))
    (src, mv, stats)
  }

  private def postingsOf(src: SpaceDataset): DataFrame =
    TextIndex.postings(src.readAll(), "text", "doc_id")
      .select("doc_id", "term", "tf", "dl")

  test("postings MV tracks appends delta-only and deletes sweep derived rows") {
    val (src, mv, _) = build()
    sameRows(mv.dataset.readAll().select("doc_id", "term", "tf", "dl"),
      postingsOf(src), "initial materialize")

    // delta append: the MV commit must add exactly the delta's postings
    val before = mv.dataset.storage.metadata.currentSnapshotId
    src.append(docs.filter(pmod(col("doc_id"), lit(5)) === 0))
    assert(mv.refresh() == 1)
    val after = mv.dataset.storage.metadata.currentSnapshotId
    val added = mv.dataset.diff(before.toString, after.toString)
      .filter(_.changeType == ChangeType.Add).map(_.data.count()).sum
    val deltaPostings = TextIndex.postings(
      docs.filter(pmod(col("doc_id"), lit(5)) === 0), "text", "doc_id").count()
    assert(added == deltaPostings, s"refresh added $added rows, delta has $deltaPostings")
    sameRows(mv.dataset.readAll().select("doc_id", "term", "tf", "dl"),
      postingsOf(src), "after delta refresh")

    // source delete: every posting of a deleted doc must vanish, even
    // though the MV's PK (term, doc_id) is wider than the delete key
    src.delete(pmod(col("doc_id"), lit(7)) === 3)
    assert(mv.refresh() == 1)
    assert(mv.dataset.readAll()
      .filter(pmod(col("doc_id"), lit(7)) === 3).count() == 0L)
    sameRows(mv.dataset.readAll().select("doc_id", "term", "tf", "dl"),
      postingsOf(src), "after source delete")
  }

  test("BM25 from the maintained index equals the corpus-scan BM25") {
    val (src, mv, stats) = build()
    src.append(docs.filter(pmod(col("doc_id"), lit(5)) === 0))
    src.delete(pmod(col("doc_id"), lit(11)) === 4)
    mv.refresh()
    stats.refresh()

    val st = stats.read()
      .agg(sum(col("n")), sum(col("n_dl")), sum(col("sum_dl"))).collect()(0)
    val nDocs = st.getLong(0)
    val avgdl = st.getLong(2).toDouble / st.getLong(1)
    // maintained scalars must equal a from-scratch recompute
    val cur = src.readAll()
    assert(nDocs == cur.count())
    val exp = cur.agg(avg(col("dl"))).collect()(0).getDouble(0)
    assert(avgdl == exp, s"avgdl $avgdl != recomputed $exp")

    val tf = mv.dataset.read(
        filter = Some(col("term").isin(Semantics.QueryTerms: _*)))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    val fromIndex = TextIndex.bm25FromPostings(tf, "doc_id", nDocs, avgdl)
    val fromScan = Semantics.bm25(cur, "text", "doc_id", Semantics.QueryTerms)
    sameRows(fromIndex, fromScan, "bm25 index vs scan")
  }

  test("term-clustered postings prune a query's point read to its term files") {
    val (src, mv, _) = build()
    mv.dataset.clusterBy(Seq("term"),
      targetFileRows = math.max(64L, mv.dataset.countRows() / 16))
    val all = mv.dataset.plan().files.size
    val hit = mv.dataset.plan(
      Some(col("term").isin(Semantics.QueryTerms: _*))).files.size
    assert(all >= 8, s"need a multi-file index, got $all")
    assert(hit < all / 2, s"term point read kept $hit of $all files")
  }
}
