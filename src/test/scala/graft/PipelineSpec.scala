package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Dedup, Similarity}

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Tables.read(spark, sfDir, "documents")
  private def embeddings = Tables.read(spark, sfDir, "embeddings")

  test("exact dedup keeps one survivor per duplicated text") {
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 1000L).as("doc_id"), col("text")))
    val survivors = Dedup.exactSurvivors(corpus, "text", "doc_id")
    assert(survivors.count() == docs.count())
    // every survivor is the min id (original)
    assert(survivors.filter(col("doc_id") >= 1000L).count() == 0)
  }

  test("minhash LSH finds all planted near-dups with no false positives below threshold") {
    val base = docs.select(col("doc_id"), col("text")).limit(200)
    val planted = base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 5000L).as("doc_id"),
        concat(col("text"), lit(" tail tok")).as("text"))
    val corpus = base.unionByName(planted)
    val pairs = Dedup.minhashPairs(corpus, "text", "doc_id",
      numHashes = 32, bands = 16, threshold = 0.6).collect()
    val plantedFound = pairs.count(r => r.getLong(1) == r.getLong(0) + 5000L)
    assert(plantedFound >= 48, s"found $plantedFound/50 planted pairs") // recall ≥ 96%
    // verify step guarantees no pair below threshold survives
    assert(pairs.forall(_.getDouble(2) >= 0.6))
  }

  test("incremental dedup flags batch docs near-duplicating the corpus") {
    val corpus = docs.select(col("doc_id"), col("text")).limit(200)
    // batch: 50 perturbed corpus docs + 50 untouched NEW docs (ids shifted
    // out of the corpus range, texts distinct) — only the former may match
    val perturbed = corpus.filter(col("doc_id") < 50)
      .select((col("doc_id") + 5000L).as("doc_id"),
        concat(col("text"), lit(" tail tok")).as("text"))
    val fresh = docs.select(col("doc_id"), col("text"))
      .filter(col("doc_id") >= 300 && col("doc_id") < 350)
      .select((col("doc_id") + 9000L).as("doc_id"), col("text"))
    val batch = perturbed.unionByName(fresh)
    val hits = Dedup.minhashAgainstIndex(corpus, batch, "text", "doc_id",
      numHashes = 32, bands = 16, threshold = 0.6).collect()
    val plantedFound = hits.count(r =>
      r.getLong(0) == r.getLong(1) + 5000L) // (batch_id, corpus_id, j)
    assert(plantedFound >= 48, s"found $plantedFound/50 planted matches")
    // fresh docs are not in the corpus — nothing above threshold
    assert(!hits.exists(_.getLong(0) >= 9300L),
      "a fresh doc matched the corpus")
    assert(hits.forall(_.getDouble(2) >= 0.6))
  }

  test("stored-index incremental dedup equals the in-flight variant") {
    val inflight = operators.Pipeline.queries("d_dedup_incr")(spark, sfDir)
    val stored = operators.StorageOps.queries("s_dedup_index")(spark, sfDir)
    assert(inflight.exceptAll(stored).isEmpty && stored.exceptAll(inflight).isEmpty)
    assert(stored.count() > 0)
  }

  test("simhash finds exact copies at hamming 0") {
    val base = docs.select(col("doc_id"), col("text")).limit(100)
    val copies = base.filter(col("doc_id") < 20)
      .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
    val pairs = Dedup.simhashPairs(base.unionByName(copies), "text", "doc_id")
      .collect()
    val exact = pairs.filter(r => r.getLong(1) == r.getLong(0) + 5000L)
    assert(exact.length == 20)
    assert(exact.forall(_.getInt(2) == 0)) // identical text → hamming 0
  }

  test("embedding LSH pairs: planted copies found at cosine ~1") {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val copies = e.filter(col("vec_id") < 30)
      .select((col("vec_id") + 50000L).as("vec_id"), col("embedding"))
    val pairs = Dedup.embeddingCosinePairs(e.unionByName(copies),
      "embedding", "vec_id", dim = 64, threshold = 0.999).collect()
    val planted = pairs.filter(r => r.getLong(1) == r.getLong(0) + 50000L)
    assert(planted.length == 30, s"${planted.length}/30 planted pairs")
  }

  test("IVF ANN reaches >= 70% recall of brute force at probeHamming=2") {
    val queries = embeddings.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(embeddings, queries, "embedding", "vec_id", 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(spark, embeddings, queries, "embedding", "vec_id",
      dim = 64, k = 10, sketchBits = 4, probeHamming = 2)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall $recall")
  }

  test("filtered ANN returns only candidates passing the predicate") {
    val res = operators.Pipeline.queries("v_ann_filtered")(spark, sfDir)
    val labels = embeddings.select(col("vec_id"), col("label"))
    val bad = res.join(labels, Seq("vec_id")).filter(col("label") =!= 1)
    assert(res.count() > 0)
    assert(bad.count() == 0, "a returned neighbor fails the label filter")
    // the predicate reaches the corpus parquet scan (filter BEFORE
    // scoring — at scale this is the pruned read, not a post-score
    // cut); AQE wraps the leaves, so assert on the rendered plan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(label,1)"), plan.take(3000))
  }

  test("PQ ADC beats chance by an order of magnitude; codebook self-codes") {
    val queries = embeddings.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(embeddings, queries, "embedding", "vec_id", 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(embeddings, queries, "embedding", "vec_id",
      dim = 64, k = 10, m = 8, codebookSize = 16)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // uniform-random 64-dim vectors + an untrained 16-anchor codebook is
    // PQ's worst case (measured ~0.3 recall@10); chance overlap is 10/N ≈
    // 2% — assert we stay an order of magnitude above chance
    assert(recall >= 0.15, s"PQ recall $recall")
    // a codebook vector's sub-vectors ARE anchors → it codes to itself
    import org.apache.spark.sql.graftshim.NearestCentroidsExpr
    val codebook = embeddings.orderBy(col("vec_id")).limit(16)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    val anchors0 = codebook.map(_.slice(0, 8))
    val selfCodes = embeddings.filter(col("vec_id") < 16)
      .select(col("vec_id"), NearestCentroidsExpr(
        slice(col("embedding").cast("array<double>"), 1, 8), anchors0, 1)(0).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 16).foreach(i => assert(selfCodes(i.toLong) == i, s"vec $i codes to ${selfCodes(i.toLong)}"))
  }

  test("empty docs: native shingle pipeline stays isomorphic to the string one") {
    import spark.implicits._
    import graft.functions.{TextFunctions => TFn}
    val df = Seq((1L, ""), (2L, "   "), (3L, "one two")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
      size(TFn.wordShingleHashes(col("text"), 3)).as("n_native"),
      size(TFn.wordShingles(col("text"), 3)).as("n_string"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // zero tokens yield ONE empty shingle in BOTH pipelines (empty docs
    // are identical to each other: Jaccard 1, like the DuckDB oracle)
    assert(rows(1L) == ((1, 1)), rows.toString)
    assert(rows(2L) == ((1, 1)), rows.toString)
    assert(rows(3L) == ((1, 1)), rows.toString)
    val j = df.filter(col("doc_id") <= 2)
      .select(TFn.wordShingleHashes(col("text"), 3).as("g"))
      .collect().map(_.getSeq[Long](0))
    assert(j(0) == j(1), "two empty docs must share the one empty shingle")
  }

  test("mis-sized vectors fail loudly in centroid/sketch kernels") {
    import spark.implicits._
    val bad = Seq((1L, Array(0.5, 0.5))).toDF("vec_id", "embedding")
    val centroids = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val e = intercept[Exception] {
      bad.select(org.apache.spark.sql.graftshim.NearestCentroidsExpr(
        col("embedding"), centroids, 1)).collect()
    }
    def root(t: Throwable): String =
      if (t.getCause == null) String.valueOf(t.getMessage)
      else root(t.getCause)
    assert(root(e).contains("centroids expect 3"), root(e))
  }

  test("k-means training is bit-deterministic across partitionings") {
    // the property that makes v_ann_ivf_kmeans oracle-able: Lloyd means
    // accumulate in scaled-long fixed point (exact, associative), so
    // partition count / merge order cannot perturb a single bit
    val a = Similarity.trainCentroids(
      embeddings.repartition(7), "embedding", "vec_id", 64, 16, 3)
    val b = Similarity.trainCentroids(
      embeddings.repartition(31), "embedding", "vec_id", 64, 16, 3)
    assert(a == b, "trained centroids differ across partitionings")
  }

  test("k-means IVF reaches >= 70% recall of brute force at nProbe=8/16") {
    val queries = embeddings.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(embeddings, queries, "embedding", "vec_id", 10)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfKmeansTopK(embeddings, queries, "embedding", "vec_id",
      dim = 64, k = 10, numCentroids = 16, nProbe = 8)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"k-means IVF recall $recall")
    // training is deterministic: same seed, same centroids
    val c1 = Similarity.trainCentroids(embeddings, "embedding", "vec_id", 64, 8, numIters = 2)
    val c2 = Similarity.trainCentroids(embeddings, "embedding", "vec_id", 64, 8, numIters = 2)
    assert(c1 == c2)

    // the training sample is a hash-threshold FILTER, not a global sort:
    // no TakeOrderedAndProject anywhere in its plan, and the cutoff
    // delivers a bounded-but-sufficient sample
    val sample = Similarity.thresholdSample(embeddings, "embedding", "vec_id",
      sampleSize = 100, minRows = 8, seed = 42L)
    try {
      val plan = sample.queryExecution.executedPlan.toString
      assert(!plan.contains("TakeOrdered"), s"sampling plan sorts globally:\n$plan")
      val n = sample.count()
      assert(n >= 50 && n <= 300, s"cutoff calibration off: $n rows for target 100")
    } finally { sample.unpersist(); () }
  }

  test("surprisal: rare tokens score high, every doc is scored, bounds hold") {
    val out = operators.Pipeline.queries("d_surprisal")(spark, sfDir).cache()
    try {
      val n = docs.count()
      assert(out.count() == n)
      // surprisal of any token is in (0, log2(totalTokens)]: max when a
      // token occurs once, near 0 for a token that is most of the corpus
      val totalToks = docs.select(explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("t")).count()
      val bound = math.log(totalToks.toDouble) / math.log(2.0) + 1e-6
      assert(out.filter(col("max_surprisal") <= 0 ||
        col("max_surprisal") > bound).count() == 0)
      // median ≤ max always
      assert(out.filter(col("median_surprisal") > col("max_surprisal")).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("int8 quantization bounds codes and reconstruction error") {
    val q = Similarity.quantizeInt8(embeddings, "embedding", "vec_id").cache()
    try {
      assert(q.count() == embeddings.count())
      assert(q.filter(col("max_code") > 127).count() == 0)
      // symmetric rounding quantization: error ≤ scale/2, up to the
      // 1e-6 output-rounding granularity of both audit columns
      assert(q.filter(col("max_abs_err") > col("scale") * 0.5 + 1e-5).count() == 0)
      assert(q.filter(col("scale") <= 0).count() == 0)
    } finally { q.unpersist(); () }
    // all-zero vector → scale 0, codes 0, error 0 (no div-by-zero)
    val session = spark
    import session.implicits._
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val r = Similarity.quantizeInt8(z, "embedding", "vec_id").head()
    assert(r.getDouble(2) == 0.0 && r.getLong(3) == 0L && r.getDouble(4) == 0.0)
  }

  test("text functions: token counts, quality in range, fingerprint order-sensitive") {
    val stats = docs.select(
      TF.tokenCount(col("text")).as("n"),
      TF.qualityScore(col("text")).as("q"),
      TF.fingerprint(col("text")).as("fp"))
    val rows = stats.collect()
    assert(rows.forall(r => r.getInt(0) > 0))
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))

    import spark.implicits._
    val fp = Seq("a b c", "c b a").toDF("text")
      .select(TF.fingerprint(col("text"))).collect()
    assert(fp(0).getLong(0) != fp(1).getLong(0), "fingerprint must be order-sensitive")

    val sh = Seq("t1 t2 t3 t4 t5").toDF("text")
      .select(TF.wordShingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(sh == Seq("t1 t2 t3", "t2 t3 t4", "t3 t4 t5"))
  }

  test("dedupClusters collapses chains and labels singletons as their own survivor") {
    import spark.implicits._
    // chain 1~2~3 (no 1~3 pair) plus disjoint pair 10~11 and singletons 20, 21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val universe = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val expected = Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false),
      (20L, 20L, true), (21L, 21L, true))
    // driver union-find path (pair graph under the threshold)…
    val got = Dedup.dedupClusters(pairs, universe, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expected)
    // …and the distributed min-label loop must agree (threshold forced to 0)
    val gotDist = Dedup.dedupClusters(pairs, universe, "doc_id", maxDriverEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(gotDist == expected)
  }

  test("cosine matches hand computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b")
    val got = df.select(VF.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }
}
