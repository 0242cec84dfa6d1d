package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Semantics

/** Semantics ops: BM25 retrieval scoring, SemDeDup-style semantic
  * dedup, deterministic shuffle-export layout. */
class SemanticsSpec extends AnyFunSuite {
  import TestSpark._

  for (name <- Semantics.queries.keys.toSeq.sorted) {
    test(s"$name runs and returns rows") {
      val df = Semantics.queries(name)(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has a matching oracle") {
    assert(Semantics.oracleSql.keySet == Semantics.queries.keySet)
  }

  test("bm25 gives higher scores to higher term frequency at equal length") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta beta beta gamma gamma delta delta"),
      (2L, "alpha beta gamma gamma delta delta delta delta"),
      (3L, "delta delta delta delta delta delta delta delta"))
      .toDF("doc_id", "text")
    val scores = Semantics.bm25(docs, "text", "doc_id", Seq("beta"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 has tf(beta)=3, doc 2 tf=1, doc 3 tf=0 (absent from output)
    assert(scores(1L) > scores(2L), scores.toString)
    assert(!scores.contains(3L))
  }

  test("semDedup drops planted copies and keeps all originals") {
    val df = Semantics.queries("v_semdedup")(spark, sfDir)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    val (planted, originals) = rows.partition(_._1 >= 100000L)
    assert(planted.nonEmpty)
    // every planted row is an exact copy of a lower-id original in the
    // same cluster → all dropped
    assert(planted.forall(!_._3), planted.filter(_._3).take(5).mkString(","))
    // originals are random vectors, mutually far → all kept
    assert(originals.forall(_._3), originals.filterNot(_._3).take(5).mkString(","))
    // a planted copy lands in the same cluster as its source
    val byId = rows.map(r => r._1 -> r._2).toMap
    planted.foreach { case (id, cl, _) => assert(byId(id - 100000L) == cl) }
  }

  test("shuffleExport is a permutation: contiguous positions per shard") {
    val df = Semantics.queries("d_shuffle_export")(spark, sfDir)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val ps = rs.map(_._3).sorted
      assert(ps.head == 1L && ps.last == ps.length.toLong,
        s"shard $shard positions not contiguous: ${ps.take(5).mkString(",")}")
    }
    // deterministic: a second run yields the identical layout
    val again = Semantics.queries("d_shuffle_export")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("hybridRrf fuses both lists; dual-list docs outrank single-list peers") {
    val df = Semantics.queries("v_hybrid_rrf")(spark, sfDir)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.length == 20)
    // output is rrf-sorted descending (ties broken by id upstream)
    assert(rows.map(_._4).sliding(2).forall(p => p.head >= p.last))
    // every fused score matches its rank reconstruction
    rows.foreach { case (id, rl, rv, rrf) =>
      val expect = (if (rl == 0) 0.0 else 1.0 / (60 + rl)) +
        (if (rv == 0) 0.0 else 1.0 / (60 + rv))
      assert(math.abs(rrf - expect) < 1e-6, s"doc $id rrf $rrf != $expect")
    }
    // at least one returned doc must have been fused from both lists
    assert(rows.exists(r => r._2 > 0 && r._3 > 0),
      "no doc appears on both ranked lists — fusion untested by data")
  }

  test("bm25Multi's q0 slice equals the single-query bm25 exactly") {
    val single = Semantics.queries("v_bm25")(spark, sfDir)
    val multi = Semantics.queries("v_bm25_multi")(spark, sfDir)
      .filter(col("q_id") === 0).drop("q_id")
    assert(single.count() > 0)
    assert(single.exceptAll(multi).isEmpty && multi.exceptAll(single).isEmpty)
  }

  test("bm25 edge cases: empty/whitespace docs and absent terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, ""),            // zero tokens — dl = 0 must not divide-by-zero
      (3L, "   "),         // whitespace-only
      (4L, "gamma delta"))
      .toDF("doc_id", "text")
    val hit = Semantics.bm25(docs, "text", "doc_id", Seq("beta"))
    assert(hit.collect().map(_.getLong(0)).toSet == Set(1L))
    // terms absent from the whole corpus → empty result, no crash
    assert(Semantics.bm25(docs, "text", "doc_id", Seq("zzz")).count() == 0)
  }

  test("semDedup keeps a zero vector and never pairs it (cosine 0)") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array.fill(4)(1.0f)),
      (1L, Array.fill(4)(0.0f)),          // zero vector
      (2L, Array.fill(4)(1.0f)))          // exact copy of 0
      .toDF("vec_id", "embedding")
    val out = Semantics.semDedup(vecs, "embedding", "vec_id",
      numClusters = 2, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(0L) && !out(2L), out.toString)   // copy dropped, source kept
    assert(out(1L), "zero vector must survive (cosine defined as 0)")
  }

  test("semdedup pair join is keyed on cluster (no cartesian product)") {
    val df = Semantics.queries("v_semdedup")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("bm25 broadcasts the per-term document frequencies") {
    val df = Semantics.queries("v_bm25")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("hybridRrfMulti's q0 slice equals the single-query hybridRrf exactly") {
    // q0's term set and query vector match the single-query fixture, and
    // document frequencies are per-TERM (query-set independent), so the
    // batch operator's q_id=0 slice must reproduce v_hybrid_rrf verbatim
    val single = Semantics.queries("v_hybrid_rrf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    val multi0 = Semantics.queries("v_hybrid_rrf_multi")(spark, sfDir)
      .filter(col("q_id") === 0L).drop("q_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    assert(single == multi0,
      s"only-in-single=${(single -- multi0).take(3)} only-in-multi=${(multi0 -- single).take(3)}")
  }
}
