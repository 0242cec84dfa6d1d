package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{LangId, TextFunctions => TF}

/** Training-data-pipeline operators over the documents/embeddings
  * tables: dedup family, similarity search, text analysis. Where DuckDB
  * can recompute the semantics exactly (list/lambda SQL), the query gets
  * an oracle; probabilistic candidate generation (LSH banding) is
  * deterministic given the fixed seeds, and the exact-verify step makes
  * the LSH queries oracle-comparable too (the oracle computes the exact
  * pair set; the LSH pipeline finds it with recall ~1 at these
  * thresholds — validated across scale factors).
  */
object Pipeline {

  private def t(s: SparkSession, d: String, n: String) = Tables.read(s, d, n)

  /** documents ∪ perturbed copies of doc_id < 100 (near-dups with a
    * 3-token tail) ∪ exact copies — the planted-duplicate corpus used by
    * the dedup queries, reproducible in SQL. */
  private def dedupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    docs
      .unionByName(docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" graft dedup tail")).as("text")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: min-id survivor per distinct text over a corpus with
    // planted exact copies
    "d_dedup_exact" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(
        docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.exactKeepMinId(corpus, "text", "doc_id")
        .select(col("doc_id"), col("n_copies"))
    }),

    // MinHash+LSH near-dup pairs, exact-Jaccard verified. 16 bands × 2
    // rows puts the S-curve knee near 0.25: recall at the 0.6 threshold
    // is ≥ 0.999 while word-shingle collisions of unrelated docs are
    // rare enough that verify stays cheap.
    "d_dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(dedupCorpus(s, d), "text", "doc_id",
        numHashes = 32, bands = 16, shingleSize = 3, threshold = 0.6)),

    // full dedup pipeline: minhash pairs → connected components →
    // min-id survivor per cluster (chains a~b~c collapse to one doc)
    "d_dedup_clusters" -> ((s, d) => {
      val corpus = dedupCorpus(s, d)
      val pairs = Dedup.minhashPairs(corpus, "text", "doc_id",
        numHashes = 32, bands = 16, shingleSize = 3, threshold = 0.6)
        .select(col("id_a"), col("id_b"))
      Dedup.dedupClusters(pairs, corpus, "doc_id")
    }),

    // SimHash near-dup pairs (Hamming ≤ 3 over 64-bit sketches);
    // sketch values are engine-specific → golden-table oracle
    // (GoldenOracles.simhashSql)
    "d_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(dedupCorpus(s, d), "text", "doc_id", maxHamming = 3)),

    // incremental ingest-time dedup: a new batch (perturbed copies of
    // doc_id < 100) checked against the standing corpus via the
    // banded-minhash index — batch band keys broadcast, corpus never
    // reshuffled (see Dedup.minhashAgainstIndex for the 100 TB shape)
    "d_dedup_incr" -> ((s, d) => {
      val corpus = t(s, d, "documents").select(col("doc_id"), col("text"))
      val batch = corpus.filter(col("doc_id") < 100)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" graft dedup tail")).as("text"))
      Dedup.minhashAgainstIndex(corpus, batch, "text", "doc_id",
        numHashes = 32, bands = 16, shingleSize = 3, threshold = 0.6)
    }),

    // exact n-gram Jaccard pairs under a blocking key
    "d_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), "text", "doc_id",
        blockCol = "source", n = 2, threshold = 0.55)),

    // embedding near-dup: hyperplane-LSH candidates + exact cosine verify
    // over a corpus with planted exact copies. 4 bands × 16 bits: at the
    // 0.999 threshold a true pair's per-band collision probability is
    // (1-θ/π)^16 ≥ 0.79 (θ ≤ 2.6°), so 4-band recall ≥ 0.998 — while a
    // 16-bit band key spreads a random corpus over 65k buckets, keeping
    // candidate generation ~|corpus| instead of the ~|corpus|²/buckets
    // blowup an 8-bit key produces on unclustered vectors.
    "d_dedup_embedding" -> ((s, d) => {
      val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(
        e.filter(col("vec_id") < 100)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
      Dedup.embeddingCosinePairs(corpus, "embedding", "vec_id",
        dim = 64, threshold = 0.999, bands = 4, bitsPerBand = 16)
    }),

    // exact brute-force ANN top-10 for 5 query vectors (the baseline the
    // IVF path is measured against)
    "v_ann_brute" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5),
        "embedding", "vec_id", k = 10)
    }),

    // IVF/multi-probe ANN (scale path; probabilistic → rows-only check,
    // recall vs brute force asserted in PipelineSpec). These embeddings
    // are uniform-random (no cluster structure), the hardest case for
    // LSH cells: 4 sketch bits + Hamming-2 multiprobe trades scan
    // fraction (~11/16 of cells) for recall; clustered real embeddings
    // support more bits at the same recall.
    "v_ann_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.ivfTopK(s, e, e.filter(col("vec_id") < 5),
        "embedding", "vec_id", dim = 64, k = 10,
        sketchBits = 4, probeHamming = 2)
    }),

    // TRUE IVF: k-means-trained coarse quantizer, nProbe nearest cells
    // probed per query (probabilistic → rows-only; recall vs brute force
    // asserted in PipelineSpec). Uniform-random embeddings are again the
    // hard case — trained centroids tile the sphere, half the cells
    // probed buys high recall; clustered real embeddings need far fewer.
    "v_ann_ivf_kmeans" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.ivfKmeansTopK(e, e.filter(col("vec_id") < 5),
        "embedding", "vec_id", dim = 64, k = 10,
        numCentroids = 16, nProbe = 8)
    }),

    // per-vector int8 quantization audit: scale, peak code, max
    // reconstruction error — pure projection, exact DuckDB oracle
    // (floor(x+0.5) tie-break is engine-portable, unlike round())
    "v_quantize" -> ((s, d) =>
      Similarity.quantizeInt8(t(s, d, "embeddings"), "embedding", "vec_id")),

    // FILTERED ANN: exact top-k restricted to a metadata predicate
    // (label = 1) — the "filtered vector search" shape every serving
    // stack needs. The filter applies BEFORE scoring, so it pushes into
    // the corpus scan (pruned parquet read at scale), and ranking runs
    // on the reduced candidate set — never score-then-filter, which
    // returns fewer than k survivors
    "v_ann_filtered" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("label") === 1),
        e.filter(col("vec_id") < 5), "embedding", "vec_id", k = 10)
    }),

    // product-quantization ANN: 8 subspaces × 16 fixed anchors (the
    // lowest-id vectors — deterministic, so the DuckDB oracle replays
    // encode + ADC scoring exactly), top-10 by asymmetric dot product
    "v_pq" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.pqTopK(e, e.filter(col("vec_id") < 5),
        "embedding", "vec_id", dim = 64, k = 10, m = 8, codebookSize = 16)
    }),

    // text statistics: portable token/diversity/BPE-ish counts
    "d_text_stats" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(TF.tokens(col("text")))).as("n_distinct"),
        round(TF.distinctTokenRatio(col("text")), 4).as("distinct_ratio"),
        TF.approxBpeTokenCount(col("text")).as("bpe_tokens"),
        round(TF.avgTokenLen(col("text")), 4).as("avg_token_len"))),

    // composite quality score (formula replicated in the oracle)
    "d_quality" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), TF.qualityScore(col("text")).as("quality"))),

    // heuristic language id: marker-profile argmax + CJK ratio — the
    // whole heuristic replicates in DuckDB lambda SQL, so it gets a
    // full oracle (string output, no float-compare hazard)
    "d_lang_id" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), col("lang"), LangId.langId(col("text")).as("lang_pred"))),

    // rolling-hash document fingerprint (engine-specific values →
    // golden-table oracle joined back to documents)
    "d_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), TF.fingerprint(col("text")).as("fp"))),

    // vocabulary building: top-100 tokens by corpus frequency. The only
    // unbounded shuffle is the token groupBy with map-side partial
    // counts — at 100 TB it carries one row per DISTINCT token per
    // partition, not per occurrence. The top-k is `orderBy().limit()`,
    // which Spark plans as TakeOrderedAndProject (per-partition partial
    // top-k, then a k-row merge) — NOT a global single-task sort; the
    // rank window then runs over the bounded 100-row frame only.
    "d_token_freq" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = t(s, d, "documents")
        .select(explode(TF.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      val top = counts.orderBy(col("freq").desc, col("token").asc).limit(100)
      val w = Window.orderBy(col("freq").desc, col("token").asc)
      top.withColumn("rank", row_number().over(w))
        .select(col("token"), col("freq"), col("rank"))
    }),

    // unigram-surprisal quality signals: each token scored by its corpus
    // rarity (−log2 p̂), each doc summarized by ORDER STATISTICS (max and
    // exact median) — deliberately not a float SUM, whose partial-agg
    // order differs across engines and would break the hash-exact
    // oracle. Scale: the corpus-model side is the word-count plan
    // (map-side combined, one row per distinct token); scoring is a join
    // of the exploded corpus against that model — broadcast when the
    // vocabulary fits, shuffle-by-token otherwise — then one groupBy(doc).
    // This is the cheap half of a perplexity filter; swap the unigram
    // model for KenLM scores and the plan shape is unchanged.
    "d_surprisal" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      // ONE action, ONE corpus scan: per-(doc, token) occurrence counts
      // first — the scoring join and the corpus model BOTH build on this
      // frame, so its shuffle is planned once and reused (ReusedExchange)
      // instead of re-exploding the corpus per branch; the token-keyed
      // join then ships one row per DISTINCT (doc, token), never per
      // occurrence (common-token skew stays off the wire), and the
      // corpus total joins in as a broadcast scalar, not a collected
      // driver constant (no separate count job). Order statistics go
      // frequency-weighted (`percentile(surp, 0.5, m)`) — identical
      // values to the per-occurrence form.
      val occ = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("m"))
      val model = occ.groupBy(col("token")).agg(sum(col("m")).as("cnt"))
      val total = model.agg(sum(col("cnt")).as("__total"))
      occ.join(model, Seq("token"))
        .crossJoin(broadcast(total))
        .withColumn("surp",
          -log2(col("cnt").cast("double") / col("__total").cast("double")))
        .groupBy(col("doc_id"))
        .agg(sum(col("m")).as("n_tokens"),
          round(max(col("surp")), 4).as("max_surprisal"),
          round(expr("percentile(surp, 0.5, m)"), 4).as("median_surprisal"))
    }))

  // DuckDB lambda/list SQL mirroring the Spark semantics exactly.
  private[graft] val tokensSql = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"

  private[graft] def shinglesSql(n: Int): String = {
    val sliceEnd = s"i + ${n - 1}"
    s"""CASE WHEN len(ts) <= $n THEN [array_to_string(ts, ' ')]
       |     ELSE list_transform(range(1, len(ts) - ${n - 2}),
       |            i -> array_to_string(ts[i:$sliceEnd], ' ')) END""".stripMargin
  }

  /** DuckDB list literal of a language's marker tokens. */
  private def profileList(lang: String): String =
    graft.functions.LangId.Profiles(lang).map(t => s"'$t'").mkString("[", ", ", "]")

  val oracleSql: Map[String, String] = Map(
    "d_dedup_simhash" -> GoldenOracles.simhashSql,
    "d_fingerprint" -> GoldenOracles.fingerprintSql,
    "v_ann_ivf" -> GoldenOracles.ivfSql,
    "v_ann_ivf_kmeans" -> GoldenOracles.kmeansSql,
    "d_lang_id" -> {
      // mirror LangId.langId exactly: tokens of lower(text); per-language
      // hit ratio; fold-argmax over sorted languages (strict >, earliest
      // wins ties); CJK-ratio override; 'unknown' when nothing fires
      val langs = graft.functions.LangId.Profiles.keys.toSeq.sorted
      val scoreCols = langs.map(l =>
        s"""CASE WHEN len(ts) = 0 THEN 0.0
           |  ELSE CAST(len(list_filter(ts, t -> list_contains(${profileList(l)}, t)))
           |    AS DOUBLE) / len(ts) END AS s_$l""".stripMargin).mkString(",\n")
      val folded = langs.tail.zipWithIndex.foldLeft(
        (s"'${langs.head}'", s"s_${langs.head}")) { case ((bl, bs), (l, _)) =>
        (s"CASE WHEN s_$l > $bs THEN '$l' ELSE $bl END",
          s"CASE WHEN s_$l > $bs THEN s_$l ELSE $bs END")
      }
      s"""WITH toks AS (
         |  SELECT doc_id, lang, text,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS ts
         |  FROM documents),
         |scored AS (
         |  SELECT doc_id, lang, text,
         |$scoreCols
         |  FROM toks),
         |cjk AS (
         |  SELECT *, CASE WHEN length(text) = 0 THEN 0.0
         |    ELSE CAST(length(text) -
         |      length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g'))
         |      AS DOUBLE) / length(text) END AS cjk_ratio
         |  FROM scored)
         |SELECT doc_id, lang,
         |  CASE WHEN cjk_ratio > 0.3 THEN 'zh'
         |       WHEN ${folded._2} > 0.0 THEN ${folded._1}
         |       ELSE 'unknown' END AS lang_pred
         |FROM cjk""".stripMargin
    },
    "d_token_freq" ->
      s"""WITH toks AS (SELECT $tokensSql AS ts FROM documents),
         |c AS (SELECT token, count(*) AS freq
         |      FROM (SELECT unnest(ts) AS token FROM toks) GROUP BY 1),
         |r AS (SELECT token, freq,
         |        row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
         |      FROM c)
         |SELECT token, freq, rank FROM r WHERE rank <= 100""".stripMargin,
    "d_surprisal" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($tokensSql) AS token FROM documents),
         |model AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
         |total AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM toks),
         |scored AS (
         |  SELECT k.doc_id,
         |    -log2(CAST(m.cnt AS DOUBLE) / (SELECT t FROM total)) AS surp
         |  FROM toks k JOIN model m USING (token))
         |SELECT doc_id, count(*) AS n_tokens,
         |  round(max(surp), 4) AS max_surprisal,
         |  round(quantile_cont(surp, 0.5), 4) AS median_surprisal
         |FROM scored GROUP BY doc_id""".stripMargin,
    "d_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM corpus GROUP BY text""".stripMargin,
    "d_dedup_minhash" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' graft dedup tail'
         |  FROM documents WHERE doc_id < 100),
         |toks AS (SELECT doc_id, $tokensSql AS ts FROM corpus),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS g FROM toks),
         |d AS (SELECT doc_id, list_distinct(g) AS g FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
         |      len(list_distinct(list_concat(a.g, b.g))) AS j
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(j, 4) AS jaccard
         |FROM pairs WHERE j >= 0.6""".stripMargin,
    "d_dedup_incr" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |batch AS (
         |  SELECT doc_id + 1000000 AS doc_id, text || ' graft dedup tail' AS text
         |  FROM documents WHERE doc_id < 100),
         |sc AS (SELECT doc_id, list_distinct(${shinglesSql(3)}) AS g
         |       FROM (SELECT doc_id, $tokensSql AS ts FROM corpus)),
         |sb AS (SELECT doc_id, list_distinct(${shinglesSql(3)}) AS g
         |       FROM (SELECT doc_id, $tokensSql AS ts FROM batch)),
         |pairs AS (
         |  SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
         |    CAST(len(list_intersect(b.g, c.g)) AS DOUBLE) /
         |      len(list_distinct(list_concat(b.g, c.g))) AS j
         |  FROM sb b CROSS JOIN sc c)
         |SELECT batch_id, corpus_id, round(j, 4) AS jaccard
         |FROM pairs WHERE j >= 0.6""".stripMargin,
    "d_dedup_clusters" ->
      s"""WITH RECURSIVE corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text || ' graft dedup tail'
         |  FROM documents WHERE doc_id < 100),
         |toks AS (SELECT doc_id, $tokensSql AS ts FROM corpus),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS g FROM toks),
         |d AS (SELECT doc_id, list_distinct(g) AS g FROM sh),
         |-- EXACT shared-shingle blocking before the Jaccard verify: a
         |-- pair at Jaccard >= 0.6 > 0 must share a shingle, so the
         |-- candidate join loses nothing — and turns the O(n^2)
         |-- all-pairs scan (~30 min in DuckDB at sf0.1) into seconds
         |shing AS (SELECT doc_id, unnest(g) AS s FROM d),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM shing x JOIN shing y ON x.s = y.s AND x.doc_id < y.doc_id),
         |pairs AS (
         |  SELECT c.id_a, c.id_b
         |  FROM cand c
         |  JOIN d a ON a.doc_id = c.id_a
         |  JOIN d b ON b.doc_id = c.id_b
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
         |    len(list_distinct(list_concat(a.g, b.g))) >= 0.6),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM corpus
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
         |SELECT a AS doc_id, min(b) AS cluster_id,
         |  (a = min(b)) AS survivor
         |FROM reach GROUP BY a""".stripMargin,
    "d_ngram_jaccard" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, $tokensSql AS ts FROM documents),
         |sh AS (SELECT doc_id, source, ${shinglesSql(2)} AS g FROM toks),
         |d AS (SELECT doc_id, source, list_distinct(g) AS g FROM sh),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
         |      len(list_distinct(list_concat(a.g, b.g))) AS j
         |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(j, 4) AS jaccard
         |FROM pairs WHERE j >= 0.55""".stripMargin,
    "d_dedup_embedding" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 100),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[])) AS c
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(c, 4) AS cosine
        |FROM pairs WHERE c >= 0.999""".stripMargin,
    "v_quantize" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |m AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) AS mm FROM e)
        |SELECT vec_id, len(v) AS n_dims, round(mm / 127.0, 6) AS scale,
        |  CASE WHEN mm = 0 THEN 0 ELSE CAST(list_max(list_transform(v,
        |    x -> abs(floor(x / (mm / 127.0) + 0.5)))) AS BIGINT) END
        |    AS max_code,
        |  CASE WHEN mm = 0 THEN 0.0 ELSE round(list_max(list_transform(v,
        |    x -> abs(x - floor(x / (mm / 127.0) + 0.5) * (mm / 127.0)))), 6)
        |    END AS max_abs_err
        |FROM m""".stripMargin,
    "v_pq" ->
      """WITH corpus AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |subsp AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
        |cb AS (SELECT vec_id AS cid, v AS cv FROM corpus WHERE vec_id < 16),
        |anch AS (SELECT cid, s, cv[(s*8+1):(s*8+8)] AS av FROM cb CROSS JOIN subsp),
        |subv AS (SELECT vec_id, s, v[(s*8+1):(s*8+8)] AS sv
        |         FROM corpus CROSS JOIN subsp),
        |codes AS (
        |  SELECT vec_id, s, cid FROM (
        |    SELECT subv.vec_id, subv.s, anch.cid,
        |      row_number() OVER (PARTITION BY subv.vec_id, subv.s
        |        ORDER BY list_distance(subv.sv, anch.av) ASC, anch.cid ASC) AS rn
        |    FROM subv JOIN anch USING (s)) WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM corpus WHERE vec_id < 5),
        |contrib AS (
        |  SELECT q.q_id, codes.vec_id,
        |    list_sum(list(
        |      list_inner_product(q.qv[(codes.s*8+1):(codes.s*8+8)], anch.av)
        |      ORDER BY codes.s)) AS approx
        |  FROM q CROSS JOIN codes
        |  JOIN anch ON anch.s = codes.s AND anch.cid = codes.cid
        |  WHERE codes.vec_id != q.q_id
        |  GROUP BY 1, 2)
        |SELECT q_id, vec_id, round(approx, 4) AS approx_dot, rank FROM (
        |  SELECT q_id, vec_id, approx,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY approx DESC, vec_id ASC) AS rank
        |  FROM contrib) WHERE rank <= 10""".stripMargin,
    "v_ann_filtered" ->
      """SELECT q_id, vec_id, round(s, 4) AS score, rank FROM (
        |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                           CAST(q.embedding AS DOUBLE[])) AS s,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                 CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id ASC) AS rank
        |  FROM (SELECT * FROM embeddings WHERE label = 1) e
        |  JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
        |    ON e.vec_id != q.vec_id
        |) WHERE rank <= 10""".stripMargin,
    "v_ann_brute" ->
      """SELECT q_id, vec_id, round(s, 4) AS score, rank FROM (
        |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                           CAST(q.embedding AS DOUBLE[])) AS s,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                 CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id ASC) AS rank
        |  FROM embeddings e
        |  JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
        |    ON e.vec_id != q.vec_id
        |) WHERE rank <= 10""".stripMargin,
    "d_text_stats" ->
      s"""WITH toks AS (SELECT doc_id, $tokensSql AS ts FROM documents)
         |SELECT doc_id,
         |  len(ts) AS n_tokens,
         |  len(list_distinct(ts)) AS n_distinct,
         |  round(CASE WHEN len(ts) = 0 THEN 0.0
         |    ELSE CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) END, 4)
         |    AS distinct_ratio,
         |  CAST(coalesce(list_sum(list_transform(ts,
         |    t -> greatest(1, CAST(ceil(length(t) / 4.0) AS INT)))), 0) AS INT)
         |    AS bpe_tokens,
         |  round(CASE WHEN len(ts) = 0 THEN 0.0
         |    ELSE CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
         |      / len(ts) END, 4) AS avg_token_len
         |FROM toks""".stripMargin,
    "d_quality" ->
      s"""WITH toks AS (SELECT doc_id, text, $tokensSql AS ts FROM documents),
         |m AS (SELECT doc_id, text,
         |  len(ts) AS n,
         |  CASE WHEN len(ts) = 0 THEN 0.0
         |    ELSE CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) END AS diversity,
         |  CASE WHEN length(text) = 0 THEN 0.0
         |    ELSE CAST(length(text) -
         |      length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
         |      / length(text) END AS punct,
         |  CASE WHEN length(text) = 0 THEN 0.0
         |    ELSE CAST(length(text) -
         |      length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |      / length(text) END AS digit,
         |  CASE WHEN len(ts) = 0 THEN 0.0
         |    ELSE CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
         |      / len(ts) END AS avg_len
         |  FROM toks)
         |SELECT doc_id,
         |  round(least(1.0, n / 50.0)
         |    * (0.5 + diversity * 0.5)
         |    * greatest(0.0, 1.0 - punct * 5 - digit * 5)
         |    * (CASE WHEN avg_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END),
         |    4) AS quality
         |FROM m""".stripMargin)
}
