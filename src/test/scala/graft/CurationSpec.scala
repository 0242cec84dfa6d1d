package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) =
    Curation.queries(name)(spark, sfDir)

  test("hash split is deterministic, total, and ~80/10/10") {
    val split = run("d_hash_split").cache()
    try {
      val total = split.count()
      assert(total == Tables.read(spark, sfDir, "documents").count())
      val bySplit = split.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySplit.keySet == Set("train", "valid", "test"))
      val trainFrac = bySplit("train").toDouble / total
      assert(trainFrac > 0.7 && trainFrac < 0.9, s"train frac $trainFrac")
      // determinism: re-running yields the identical assignment
      val again = run("d_hash_split")
      assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
    } finally { split.unpersist(); () }
  }

  test("decontamination flags benchmark members' own text verbatim") {
    // a training doc that IS a benchmark doc's text (planted copy) must
    // be flagged with every one of its shingles shared
    val docs = Tables.read(spark, sfDir, "documents")
    val out = run("d_decontaminate")
    // benchmark ids (doc_id % 97 == 0) are excluded from the output
    assert(out.filter(pmod(col("doc_id"), lit(97)) === 0).count() == 0)
    // contamination is exactly "shares ≥ 1 shingle"
    assert(out.filter(col("contaminated") && col("n_shared") === 0).count() == 0)
    assert(out.count() == docs.filter(pmod(col("doc_id"), lit(97)) =!= 0).count())
  }

  test("bloom-prefilter decontamination matches the exact variant bit-for-bit") {
    val exact = run("d_decontaminate")
    val bloom = run("d_decontaminate_bloom").cache()
    try {
      assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty,
        "bloom variant diverged from exact decontamination")
      // the sketch really is in the plan: corpus grams are prefiltered by
      // might_contain over a scalar-subquery-built bloom_filter_agg
      val plan = bloom.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"), s"no bloom prefilter in plan:\n$plan")
      assert(plan.contains("bloom_filter_agg"),
        s"no distributed sketch build in plan:\n$plan")
    } finally { bloom.unpersist(); () }
  }

  test("the decontamination bloom is sized from the data and actually filters") {
    graft.GraftExtensions.registerAll(spark)
    import graft.functions.{TextFunctions => TF}
    val g = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), explode(TF.wordShingleHashes(col("text"), 3)).as("gram"))
    val bench = g.filter(col("doc_id") % 97 === 0).select("gram").distinct().cache()
    val corpus = g.filter(col("doc_id") % 97 =!= 0).cache()
    try {
      val nBench = bench.count()
      val total = corpus.count()
      // the query's sizing rule, replayed: measured cardinality + floor
      bench.createOrReplaceTempView("graft_bloom_bench")
      corpus.createOrReplaceTempView("graft_bloom_corpus")
      val items = math.max(nBench + nBench / 10, 4096L)
      val passed = spark.sql(
        s"""SELECT count(*) FROM graft_bloom_corpus
           |WHERE graft_might_contain(
           |  (SELECT graft_bloom_agg(gram, CAST($items AS BIGINT))
           |   FROM graft_bloom_bench), gram)""".stripMargin).head().getLong(0)
      // a correctly-sized sketch must kill the vast majority of corpus
      // grams BEFORE the exact join — an undersized (saturated) one
      // passes ~everything, which is exactly the silent degradation the
      // data-derived sizing prevents
      assert(passed < total / 2,
        s"bloom passed $passed of $total corpus grams — saturated sketch")
      val truePos = corpus.join(bench, "gram").count()
      assert(passed >= truePos, "bloom dropped a true contamination gram")
    } finally { bench.unpersist(); corpus.unpersist(); () }
  }

  test("source mixing keeps all of src0 and applies deterministic rates") {
    val docs = Tables.read(spark, sfDir, "documents")
    val kept = run("d_source_mix").cache()
    try {
      // src0 rate is 1000/1000 → every src0 doc survives
      assert(kept.filter(col("source") === "src0").count() ==
        docs.filter(col("source") === "src0").count())
      // tail sources downsample to ~12.5%
      val tailSrc = docs.filter(col("source") === "src5").count()
      val tailKept = kept.filter(col("source") === "src5").count()
      assert(tailKept < tailSrc / 4, s"src5 kept $tailKept of $tailSrc")
      // deterministic: second run identical
      val again = run("d_source_mix")
      assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
    } finally { kept.unpersist(); () }
  }

  test("pack chunks lays out a contiguous token stream per source") {
    val packed = run("d_pack_chunks").cache()
    try {
      import spark.implicits._
      // per source: tok_start of doc k = tok_start + n_tok of doc k-1
      val rows = packed.orderBy("source", "doc_id")
        .select("source", "n_tok", "tok_start", "start_chunk", "end_chunk")
        .as[(String, Long, Long, Long, Long)].collect()
      rows.groupBy(_._1).foreach { case (_, rs) =>
        rs.sliding(2).foreach {
          case Array((_, n, start, _, _), (_, _, start2, _, _)) =>
            assert(start2 == start + n)
          case _ =>
        }
      }
      // chunk ids consistent with offsets
      rows.foreach { case (_, n, start, c0, c1) =>
        assert(c0 == start / 2048)
        if (n > 0) assert(c1 == (start + n - 1) / 2048 && c1 >= c0)
        else assert(c1 == c0)
      }
    } finally { packed.unpersist(); () }
  }

  test("pii scrub redacts planted emails and phones") {
    val out = run("d_pii_scrub").cache()
    try {
      val planted = out.filter(pmod(col("doc_id"), lit(10)) === 0)
      assert(planted.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
      assert(planted.filter(!col("scrubbed").contains("<EMAIL>") ||
        !col("scrubbed").contains("<PHONE>")).count() == 0)
      // nothing survives the scrubber
      assert(out.filter(col("scrubbed").rlike("@example\\.com|\\d{3}-\\d{3}-\\d{4}")).count() == 0)
      val clean = out.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      assert(clean.filter(col("n_emails") =!= 0 || col("n_phones") =!= 0).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("pack chunks: two-level prefix sum matches the naive window on a skewed source") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // one dominant source (90% of rows) + a tail source: the naive plan
    // runs the hot source as ONE task; the two-level plan must split it
    // across many sub-buckets while producing the identical layout
    val rows = (0L until 3000L).map(i =>
      (i, if (i % 10 == 0) "tail" else "hot", 1L + (i * 37) % 500)) ++
      Seq((9000001L, "solo", 7L)) // single-doc source: min == max edge
    val base = rows.toDF("doc_id", "source", "n_tok")

    val got = Curation.packChunks(base, subBuckets = 16)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = base
      .withColumn("tok_start", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("start_chunk", floor(col("tok_start") / 2048.0).cast("long"))
      .withColumn("end_chunk",
        when(col("n_tok") <= 0, col("start_chunk"))
          .otherwise(floor((col("tok_start") + col("n_tok") - 1) / 2048.0)).cast("long"))
    assert(got.count() == naive.count())
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "two-level packing must be byte-identical to the naive per-source window")

    // the hot source really is split: its window runs over many
    // (source, bucket) groups, not one per-source task
    val bucketsUsed = Curation.withRangeBuckets(base, 16)
      .filter(col("source") === "hot")
      .select("__bkt").distinct().count()
    assert(bucketsUsed > 8, s"skewed source must spread over sub-buckets, got $bucketsUsed")
    // a single-doc source degenerates to one bucket, not a crash
    assert(Curation.withRangeBuckets(base, 16).filter(col("source") === "solo")
      .select("__bkt").distinct().count() == 1)
  }

  test("repetition fractions are consistent and bounded") {
    val rep = run("d_repetition").cache()
    try {
      assert(rep.filter(col("dup_2gram_frac") < 0 || col("dup_2gram_frac") > 1).count() == 0)
      assert(rep.filter(col("top_2gram_frac") <= 0 || col("top_2gram_frac") > 1).count() == 0)
      assert(rep.filter(col("n_distinct_2grams") > col("n_2grams")).count() == 0)
      // a fully-repeated synthetic doc scores dup_frac near 1
      val one = Curation.queries("d_repetition")(spark, sfDir)
      assert(one.count() == Tables.read(spark, sfDir, "documents").count())
    } finally { rep.unpersist(); () }
  }

  test("segment dedup keeps first occurrences only and rebuilds docs in order") {
    import spark.implicits._
    // doc 1 and doc 2 share a 4-word segment; doc 3 repeats its own
    // segment twice; doc 4 is all-unique
    val df = Seq(
      (1L, "a b c d e f g h"),             // segs: "a b c d", "e f g h"
      (2L, "a b c d x y z w"),             // "a b c d" duplicates doc 1's
      (3L, "p q r s p q r s"),             // self-duplicate
      (4L, "unique words only here")
    ).toDF("doc_id", "text")
    val out = Curation.segmentDedup(df, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d e f g h")))     // canonical keeps all
    assert(out(2L) == ((2L, 1L, "x y z w")))             // dup segment removed
    assert(out(3L) == ((2L, 1L, "p q r s")))             // first of the pair kept
    assert(out(4L) == ((1L, 1L, "unique words only here")))

    // corpus run: totals consistent, cleaned never longer than input
    val corpus = run("d_segment_dedup").cache()
    try {
      assert(corpus.count() ==
        Tables.read(spark, sfDir, "documents").count())
      assert(corpus.filter(col("n_kept") > col("n_segs")).count() == 0)
      assert(corpus.filter(col("n_kept") < col("n_segs")).count() > 0,
        "duplicate segments must actually fire on the corpus")
      // idempotence of the keep rule: re-running on cleaned text can only
      // remove cross-doc dups that re-form, never resurrect removed text
      val again = run("d_segment_dedup")
      assert(corpus.exceptAll(again).isEmpty)
    } finally { corpus.unpersist(); () }
  }

  test("language rebalance keeps all of the rarest language and downsamples the rest") {
    val docs = Tables.read(spark, sfDir, "documents")
    val kept = run("d_lang_balance").cache()
    try {
      val counts = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rarest = counts.minBy(_._2)._1
      // rate for the rarest lang is exactly 1000 → everything survives
      assert(kept.filter(col("lang") === rarest).count() == counts(rarest))
      // dominant language is strictly downsampled
      val dominant = counts.maxBy(_._2)._1
      val domKept = kept.filter(col("lang") === dominant).count()
      assert(domKept < counts(dominant), s"$dominant kept $domKept")
      // keep-rates follow (min/cnt)^(1/2) within sampling noise: the
      // kept fraction tracks keep_permille/1000 per language
      val rates = kept.select("lang", "keep_permille").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      rates.foreach { case (l, pm) =>
        val frac = kept.filter(col("lang") === l).count().toDouble / counts(l)
        assert(math.abs(frac - pm / 1000.0) < 0.25, s"$l frac $frac vs $pm‰")
      }
      // deterministic
      val again = run("d_lang_balance")
      assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
    } finally { kept.unpersist(); () }
  }

  test("profile reports one exact row per column") {
    val docs = Tables.read(spark, sfDir, "documents")
    val prof = run("d_profile").cache()
    try {
      val n = docs.count()
      assert(prof.count() == docs.columns.length)
      val byCol = prof.collect().map(r => r.getString(0) -> r).toMap
      assert(byCol.keySet == docs.columns.toSet)
      byCol.values.foreach(r => assert(r.getLong(1) == n))
      // exact distincts match a direct computation
      assert(byCol("lang").getLong(3) ==
        docs.select("lang").distinct().count())
      assert(byCol("doc_id").getLong(3) == n) // unique key
      // numeric min/max render the numeric extremes, not lexicographic
      val ids = docs.agg(min("doc_id"), max("doc_id")).head()
      assert(byCol("doc_id").getString(4) == ids.getLong(0).toString)
      assert(byCol("doc_id").getString(5) == ids.getLong(1).toString)
      // the approx variant agrees on everything but n_distinct, and its
      // HLL distincts land within 10% of exact
      val ap = Curation.profile(docs, approx = true).collect()
        .map(r => r.getString(0) -> r).toMap
      ap.foreach { case (c, r) =>
        val exact = byCol(c).getLong(3).toDouble
        assert(math.abs(r.getLong(3) - exact) / exact < 0.1,
          s"$c approx ${r.getLong(3)} vs exact $exact")
        assert(r.getString(4) == byCol(c).getString(4))
      }
    } finally { prof.unpersist(); () }
  }

  test("profile counts nulls and distincts on a frame with gaps") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10)), (2L, None, Some(10)),
      (3L, Some("b"), None), (4L, Some("a"), Some(20)))
      .toDF("id", "s", "n")
    val p = Curation.profile(df).collect().map(r => r.getString(0) -> r).toMap
    assert(p("s").getLong(1) == 4 && p("s").getLong(2) == 3) // rows, non-null
    assert(p("s").getLong(3) == 2) // distinct excludes null
    assert(p("n").getLong(2) == 3 && p("n").getLong(3) == 2)
    assert(p("n").getString(4) == "10" && p("n").getString(5) == "20")
    // avg_len ignores nulls: ("a","b","a") → 1.0
    assert(p("s").getDouble(6) == 1.0)
  }

  test("stratified sample is exactly the per-stratum hash top-k") {
    val docs = Tables.read(spark, sfDir, "documents")
    val sample = run("d_stratified_sample").cache()
    try {
      // per stratum: exactly min(k, |stratum|) rows, ranks 1..k dense
      val counts = docs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = sample.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.keySet == counts.keySet)
      got.foreach { case (src, c) =>
        assert(c == math.min(20L, counts(src)), s"$src got $c of ${counts(src)}")
      }
      // the two-level shape equals the single-window ground truth
      // (same salted mix-hash, one row_number over the whole stratum)
      import org.apache.spark.sql.expressions.Window
      val b = pmod((col("doc_id") + 3000017L) * 2654435761L, lit(4294967296L))
      val truth = docs.select(col("doc_id"), col("source"))
        .withColumn("__h", pmod(b.bitwiseXOR(shiftright(b, 16)), lit(1000000L)))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("__h"), col("doc_id"))))
        .filter(col("rn") <= 20)
        .select(col("doc_id"), col("source"), col("rn"))
      assert(sample.exceptAll(truth).isEmpty && truth.exceptAll(sample).isEmpty)
      // deterministic across runs
      val again = run("d_stratified_sample")
      assert(sample.exceptAll(again).isEmpty && again.exceptAll(sample).isEmpty)
    } finally { sample.unpersist(); () }
  }

  test("stratified sample caps at stratum size when k exceeds it") {
    val session = spark
    import session.implicits._
    // strata of size 3 and 30 with k=20: the small one returns all 3
    val df = ((1L to 3L).map(i => (i, "tiny")) ++
      (10L to 39L).map(i => (i, "big"))).toDF("doc_id", "source")
    val out = Curation.stratifiedSample(df, "source", "doc_id", 20)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("tiny" -> 3L, "big" -> 20L))
    // ranks are dense 1..n within each stratum
    val tinyRanks = out.filter(col("source") === "tiny")
      .select("rn").collect().map(_.getInt(0)).sorted.toSeq
    assert(tinyRanks == Seq(1, 2, 3))
  }

  test("profile of an empty frame reports zero rows per column") {
    val empty = Tables.read(spark, sfDir, "documents").filter(lit(false))
    val p = Curation.profile(empty).collect().map(r => r.getString(0) -> r).toMap
    assert(p.size == 5)
    p.values.foreach { r =>
      assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
      assert(r.isNullAt(4) && r.isNullAt(5)) // min/max undefined
    }
  }

  test("e2e pipeline output is consistent with its stage operators") {
    val out = run("d_e2e_pipeline").cache()
    try {
      val ids = out.select("doc_id")
      // survivors are a strict subset of the corpus that each stage allows
      val contaminated = run("d_decontaminate")
        .filter(col("contaminated")).select("doc_id")
      assert(ids.join(contaminated, Seq("doc_id")).count() == 0,
        "a contaminated doc survived")
      val trainIds = run("d_hash_split")
        .filter(col("split") === "train").select("doc_id")
      assert(ids.exceptAll(ids.join(trainIds, Seq("doc_id"))).count() == 0,
        "a non-train doc survived")
      assert(ids.filter(pmod(col("doc_id"), lit(97)) === 0).count() == 0,
        "a benchmark doc survived")
      // packing invariant: per source, tok_start is the running sum
      val bad = out.withColumn("expected_start",
        coalesce(sum(col("n_tok")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")
            .orderBy("doc_id").rowsBetween(Long.MinValue, -1)), lit(0L)))
        .filter(col("tok_start") =!= col("expected_start"))
      assert(bad.count() == 0, "tok_start is not the per-source prefix sum")
      assert(out.count() > 0)
    } finally { out.unpersist(); () }
  }

  test("approx-percentile quality gate tracks the exact gate within the sketch band") {
    // the documented 100 TB path must be executable, not a comment:
    // same kernel, approx_percentile cutoff — the keep-set may differ
    // from exact only by boundary docs inside the sketch's rank-error
    // band around the cutoff
    val corpus = Tables.read(spark, sfDir, "documents")
    val exact = Curation.qualityTopQuantile(corpus, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = Curation.qualityTopQuantile(corpus, 0.2, approx = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val total = corpus.count().toDouble
    val diff = ((exact -- approx) ++ (approx -- exact)).size
    assert(exact.nonEmpty && approx.nonEmpty)
    assert(diff / total <= 0.05,
      s"approx keep-set differs from exact by $diff of $total docs")
  }

  test("chunkText windows overlap correctly and cover every token") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than one window
      (3L, ""),                                       // no tokens -> no chunks
      (4L, "   ")                                     // whitespace only -> none
    ).toDF("doc_id", "text")
    val out = Curation.chunkText(df, chunkSize = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: starts 0,2,4,6 (stop `overlap` short of the end — the last
    // window reaches the final token, no fully-contained chunk)
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(d1.head._4 == "t1 t2 t3 t4")
    assert(d1(1)._4 == "t3 t4 t5 t6", "2-token overlap lost")
    assert(d1.last._4 == "t7 t8 t9 t10" && d1.last._3 == 4L)
    // every token appears in at least one chunk
    val covered = d1.flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    // short doc: one whole-doc chunk; empty docs: none
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3L, "a b c")))
    assert(!out.exists(t => t._1 == 3L || t._1 == 4L))
  }

  test("every curation query has a matching oracle") {
    assert(Curation.oracleSql.keySet == Curation.queries.keySet)
  }
}
