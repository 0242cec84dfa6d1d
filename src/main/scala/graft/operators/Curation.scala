package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, Tables}
import graft.functions.{TextFunctions => TF}

/** Corpus-curation operators — the steps between "raw crawl" and
  * "training mix" that a large-scale LLM data pipeline runs after dedup
  * (the reference stops at storage + transforms; these are the
  * Spark-native extension alongside [[Dedup]]/[[Similarity]]):
  *
  *  - test-set decontamination (shared-shingle flagging)
  *  - repetition analysis (duplicate / most-frequent n-gram fractions,
  *    the Gopher-style quality signals)
  *  - deterministic hash split (train/valid/test without a coin flip)
  *  - weighted source mixing (domain up/down-sampling)
  *  - concat-and-chunk sequence packing (context-window layout)
  *  - PII scrubbing (regex redaction with counts)
  *  - exact duplicate-segment removal (Lee et al. 2021 / CCNet style)
  *  - temperature-based language rebalancing
  *
  * Everything is a pure Column pipeline (codegen'd, no UDF) except where
  * a groupBy is the semantics. Every query has a DuckDB oracle: the
  * deterministic mixing hash is plain 64-bit arithmetic expressible in
  * ANSI SQL, so even the sampling ops are hash-verified.
  */
object Curation {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.read(s, d, "documents")

  /** Bloom estimated-items for decontamination: the measured benchmark
    * cardinality with a floor (approx_count_distinct carries ~2% error
    * and a pathologically tiny estimate must not shrink the sketch into
    * an all-pass sieve) and 10% headroom for the estimator's low side. */
  private[operators] def bloomItems(nDistinct: Long): Long =
    math.max(nDistinct + nDistinct / 10, 4096L)

  /** Portable multiplicative mix → bucket in [0, buckets): Knuth
    * multiplicative hashing with an xorshift finalizer, kept inside
    * non-overflowing int64 arithmetic (ANSI-safe, and reproducible in
    * any SQL engine — unlike xxhash64, which only Spark has). Production
    * splits on arbitrary keys would use `xxhash64(key, salt)`; the
    * arithmetic here is the same idea with a portable kernel. */
  private[graft] def mixBucket(id: Column, buckets: Int): Column = {
    // fold into [0, 2^31) FIRST so the multiply stays inside int64 for
    // every int64 input — the raw id * M overflows past |id| ≈ 3.4e9
    // (ArithmeticException under ANSI, engine-divergent wrapping
    // otherwise), exactly the multi-billion-id corpus the 100 TB ops
    // advertise. Identity for 0 ≤ id < 2^31, so shipped-corpus buckets
    // and every oracle are unchanged; the SQL mirror folds identically.
    val folded = pmod(id, lit(2147483648L))
    val b = pmod(folded * lit(2654435761L), lit(4294967296L))
    pmod(b.bitwiseXOR(shiftright(b, 16)), lit(buckets.toLong))
  }

  private[operators] def mixBucketSql(idExpr: String, buckets: Long): String = {
    // pmod analog: DuckDB % keeps the dividend's sign
    val folded = s"((($idExpr) % 2147483648 + 2147483648) % 2147483648)"
    s"xor(($folded * 2654435761) % 4294967296, " +
      s"(($folded * 2654435761) % 4294967296) >> 16) % $buckets"
  }

  // deterministic per-source keep-rates (permille) for the mixing demo:
  // named sources are up/down-weighted, the long tail keeps 12.5%
  private val MixRates: Seq[(String, Long)] =
    Seq("src0" -> 1000L, "src1" -> 500L, "src2" -> 250L)
  private val MixDefaultRate = 125L
  // decorrelate the mixing decision from the split decision
  private val MixSalt = 1000003L
  // decorrelate the language-rebalance decision from both of the above
  private val BalanceSalt = 2000003L
  // duplicate-segment removal window (words per segment)
  private val SegWords = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // test-set decontamination: flag training docs sharing any 3-token
    // shingle with the benchmark set (doc_id % 97 == 0 plays the held-out
    // benchmark). The benchmark's distinct shingle hashes are TINY next
    // to the corpus → broadcast hash semi-join; the corpus-side explode
    // never shuffles (the only shuffle is the per-doc count of matches,
    // bounded by contaminated docs). The 13-gram decontamination of real
    // pipelines is this exact plan with n=13.
    "d_decontaminate" -> ((s, d) => {
      val grams = docs(s, d).select(col("doc_id"),
        TF.wordShingleHashes(col("text"), 3).as("g"))
      val bench = grams.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(explode(col("g")).as("gram")).distinct()
      val train = grams.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      val shared = train.select(col("doc_id"), explode(col("g")).as("gram"))
        .join(broadcast(bench), Seq("gram"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      train.select(col("doc_id")).join(shared, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
    }),

    // decontamination, Bloom-prefilter variant — the shape for when the
    // held-out set's shingle inventory outgrows an exact broadcast (a
    // full eval-suite 13-gram set at corpus scale is 10^8+ entries). A
    // compact bloom over the benchmark grams is built DISTRIBUTED
    // (graft_bloom_agg: partial sketches per partition, OR-merged once)
    // and reaches the corpus side as a scalar subquery — Spark's
    // subquery broadcast, never a driver collect of the gram set. The
    // corpus-side explode is then prefiltered map-side by
    // graft_might_contain BEFORE any shuffle: only the ~contaminated
    // tail reaches the exact join (an unhinted shuffle join — the bench
    // set no longer needs to fit broadcast), which removes bloom false
    // positives, so the output is bit-identical to `d_decontaminate`
    // (they share one oracle).
    "d_decontaminate_bloom" -> ((s, d) => {
      GraftExtensions.registerAll(s)
      docs(s, d).select(col("doc_id"),
          TF.wordShingleHashes(col("text"), 3).as("g"))
        .createOrReplaceTempView("graft_decon_grams")
      // size the sketch FROM THE DATA: Spark's BloomFilterAggregate
      // requires estimatedItems as a foldable literal, so the benchmark
      // set's distinct-gram cardinality is measured up front (one cheap
      // distributed agg over the BENCH slice only, never the corpus).
      // A fixed literal silently degrades at scale — at a 10^8-gram
      // eval suite an undersized sketch saturates into a ~100%-pass
      // sieve: still correct (the exact join kills false positives)
      // but the prefilter it exists for does nothing.
      val nBenchGrams = s.sql(
        """SELECT approx_count_distinct(gram) FROM (
          |  SELECT gram FROM graft_decon_grams
          |  LATERAL VIEW explode(g) x AS gram
          |  WHERE doc_id % 97 = 0)""".stripMargin).head().getLong(0)
      val items = bloomItems(nBenchGrams)
      s.sql(s"""
        WITH bench AS (
          SELECT DISTINCT gram
          FROM graft_decon_grams LATERAL VIEW explode(g) x AS gram
          WHERE doc_id % 97 = 0),
        tr AS (SELECT doc_id FROM graft_decon_grams WHERE doc_id % 97 != 0),
        cand AS (
          SELECT doc_id, gram
          FROM graft_decon_grams LATERAL VIEW explode(g) x AS gram
          WHERE doc_id % 97 != 0
            AND graft_might_contain(
                  (SELECT graft_bloom_agg(gram, CAST($items AS BIGINT))
                   FROM bench), gram)),
        cnt AS (
          SELECT c.doc_id, count(*) AS n_shared
          FROM cand c JOIN bench USING (gram) GROUP BY c.doc_id)
        SELECT t.doc_id,
          coalesce(c.n_shared, CAST(0 AS BIGINT)) AS n_shared,
          coalesce(c.n_shared, CAST(0 AS BIGINT)) > 0 AS contaminated
        FROM tr t LEFT JOIN cnt c USING (doc_id)""")
    }),

    // repetition analysis (Gopher-style quality signals): per doc, the
    // duplicate-2-gram fraction and the most-frequent-2-gram fraction.
    // Shape: explode 2-gram HASHES (8 bytes each, never the strings) →
    // per-(doc, gram) count → per-doc aggregate — the word-count plan,
    // fully map-side-combined.
    "d_repetition" -> ((s, d) => {
      val g = docs(s, d).select(col("doc_id"),
        explode(transform(TF.wordShingles(col("text"), 2), t => xxhash64(t))).as("gram"))
      g.groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(
          sum(col("c")).as("total"), max(col("c")).as("maxc"),
          count(lit(1)).as("nd"))
        .select(col("doc_id"),
          col("total").as("n_2grams"),
          col("nd").as("n_distinct_2grams"),
          round(lit(1.0) - col("nd").cast("double") / col("total"), 4).as("dup_2gram_frac"),
          round(col("maxc").cast("double") / col("total"), 4).as("top_2gram_frac"))
    }),

    // deterministic train/valid/test split: bucket = mix(doc_id) ∈
    // [0,1000); 80/10/10. Pure projection — zero shuffle at any scale,
    // and stable across runs/engines (re-running the pipeline never
    // migrates a doc between splits).
    "d_hash_split" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        mixBucket(col("doc_id"), 1000).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 800, "train")
            .when(col("bucket") < 900, "valid")
            .otherwise("test"))),

    // weighted source mixing: per-source keep-rates applied by
    // deterministic hash — domain up/down-sampling without sampling
    // noise. Projection + filter only: no shuffle, no RNG state.
    "d_source_mix" -> ((s, d) => {
      val rate = MixRates.foldLeft(lit(MixDefaultRate)) { case (acc, (src, r)) =>
        when(col("source") === src, lit(r)).otherwise(acc)
      }
      docs(s, d)
        .filter(mixBucket(col("doc_id") + MixSalt, 1000) < rate)
        .select(col("doc_id"), col("source"))
    }),

    // concat-and-chunk sequence packing: per source, documents in doc_id
    // order are concatenated token-wise and cut into 2048-token context
    // windows; each doc reports its token offset and the chunk range it
    // spans — the pipeline's layout step before tensorization. TWO-LEVEL
    // prefix sum (a per-source unbounded window would make one dominant
    // source ONE task at 100 TB): see [[packChunks]].
    "d_pack_chunks" -> ((s, d) =>
      packChunks(docs(s, d)
        .select(col("doc_id"), col("source"),
          TF.approxBpeTokenCount(col("text")).cast("long").as("n_tok")))),

    // overlapping token-window chunking (RAG / retrieval-index prep):
    // each doc splits into 64-token windows advancing by 48 (16-token
    // overlap so no boundary context is lost). Pure per-row projection +
    // explode — no shuffle at any scale; chunk ids are position-derived
    // (start/stride), so re-chunking a grown corpus never renumbers
    // existing docs' chunks.
    "d_chunk_text" -> ((s, d) =>
      chunkText(docs(s, d), chunkSize = 64, overlap = 16)),

    // exact duplicate-segment removal (the segment/paragraph-level exact
    // dedup of Lee et al. 2021 / CCNet, adapted to fixed word windows —
    // the corpus has no newlines, so "paragraph" = 4-word segment): a
    // segment occurring in >1 place survives only at its first occurrence
    // (min (doc_id, seg_idx)); every doc reports its segment counts and
    // the cleaned text. See [[segmentDedup]] for the scale shape.
    "d_segment_dedup" -> ((s, d) => segmentDedup(docs(s, d), SegWords)),

    // temperature-based language rebalancing (the multilingual mixing
    // trick: keep-rate_l = (min_count / count_l)^(1/T), T=2): per-lang
    // doc counts (a tiny agg) turn into deterministic hash keep-rates,
    // so the rarest language keeps 100% and dominant ones downsample
    // toward balance. No RNG, no shuffle on the corpus side: the corpus
    // sees one broadcast join + a filter projection.
    "d_lang_balance" -> ((s, d) => {
      val counts = docs(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("__cnt"))
      // global min as a broadcast 1-row scalar, not an unpartitioned
      // window: the per-lang frame is tiny, but the window shape would
      // still funnel it through a single-partition exchange — the
      // ungrouped agg + broadcast join is single-task-free and the
      // whole-gate plan sweep (PlanQualitySpec) stays clean
      val mn = counts.agg(min(col("__cnt")).as("__mn"))
      val rates = counts.crossJoin(broadcast(mn))
        .withColumn("keep_permille",
          floor(sqrt(col("__mn").cast("double") / col("__cnt")) * 1000).cast("long"))
        .select(col("lang"), col("keep_permille"))
      docs(s, d).join(broadcast(rates), Seq("lang"))
        .filter(mixBucket(col("doc_id") + BalanceSalt, 1000) < col("keep_permille"))
        .select(col("doc_id"), col("lang"), col("keep_permille"))
    }),

    // PII scrub: regex redaction of emails/phones with per-doc counts.
    // The corpus plants synthetic PII on doc_id % 10 == 0 (the testdata
    // text has none) so the scrubber provably fires. Pure projection —
    // regexes stay inside whole-stage codegen.
    "d_pii_scrub" -> ((s, d) => {
      val planted = when(pmod(col("doc_id"), lit(10)) === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-123-4567 now")))
        .otherwise(col("text"))
      docs(s, d).select(col("doc_id"), planted.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).as("n_phones"),
          regexp_replace(
            regexp_replace(col("t"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>").as("scrubbed"))
    }),

    // one-pass column profile of the corpus table (nulls / distincts /
    // bounds / value widths) — the "know your data" step before any
    // curation decision. Exact distincts here so DuckDB can replay the
    // numbers; see [[profile]] for the approx scale path.
    "d_profile" -> ((s, d) => profile(docs(s, d))),

    // percentile quality gating: drop the bottom 20% of the corpus by
    // quality score — the relative-threshold variant of the absolute
    // gate (absolute thresholds drift as the corpus mix shifts; "keep
    // the top X%" does not). See [[qualityTopQuantile]]: the gate runs
    // the exact cutoff (Spark `percentile` == DuckDB `quantile_cont`,
    // parity proven by q27); the 100 TB path is the same kernel with
    // approx_percentile, exercised by CurationSpec.
    "d_quality_topq" -> ((s, d) => qualityTopQuantile(docs(s, d), 0.2)),

    // sequence-length histogram (width-32 buckets of the BPE-ish token
    // count): the distribution that sizes context-window packing —
    // docs and token mass per bucket tell you the padding/truncation
    // cost of any window choice before running the pack. One groupBy
    // over ≤ max_len/32 keys: map-side combined, trivially scalable.
    "d_token_hist" -> ((s, d) =>
      docs(s, d)
        // coalesce: a NULL text is a 0-token doc, matching the oracle's
        // coalesce(list_sum(...), 0) — not a NULL histogram bucket
        .select(coalesce(TF.approxBpeTokenCount(col("text")), lit(0))
          .cast("long").as("n_tok"))
        .withColumn("bucket", col("n_tok") - pmod(col("n_tok"), lit(32L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))),

    // deterministic per-stratum sample: exactly min(k, |stratum|) docs
    // per source, the ones with the smallest salted mix-hash — a stable
    // "eyeball 20 docs per domain" sample that never changes between
    // runs. See [[stratifiedSample]] for the skew-proof two-level top-k.
    "d_stratified_sample" -> ((s, d) =>
      stratifiedSample(docs(s, d).select(col("doc_id"), col("source")),
        "source", "doc_id", SampleK)),

    // END-TO-END curation pipeline — the operators composed as one DAG,
    // the way a real corpus build runs them: decontaminate (drop docs
    // sharing a 3-shingle with the benchmark split) → quality gate
    // (score ≥ 0.3) → deterministic train split (80%) → pack survivors
    // into 2048-token context windows. One oracle replays the whole
    // chain. The cleaned corpus is PERSISTED before layout: pack_chunks
    // references its input several times (two windows + join-back), and
    // without the materialization Catalyst re-executes the whole
    // decontaminate+gate subtree per reference — the plan-level reason
    // real pipelines checkpoint between the filter phase and the layout
    // phase (at 100 TB: write the cleaned corpus to a table, then pack).
    "d_e2e_pipeline" -> ((s, d) => {
      val all = docs(s, d)
      val nonBench = all.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      val bench = all.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(explode(TF.wordShingleHashes(col("text"), 3)).as("gram"))
        .distinct()
      val contaminated = nonBench
        .select(col("doc_id"), explode(TF.wordShingleHashes(col("text"), 3)).as("gram"))
        .join(broadcast(bench), Seq("gram"))
        .select(col("doc_id")).distinct()
      val train = nonBench
        .join(contaminated, Seq("doc_id"), "left_anti")
        .filter(TF.qualityScore(col("text")) >= 0.3)
        .filter(mixBucket(col("doc_id"), 1000) < 800)
        .select(col("doc_id"), col("source"),
          TF.approxBpeTokenCount(col("text")).cast("long").as("n_tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      packChunks(train)
    }))

  // shared by Spark + DuckDB sides (Java regex and RE2 agree on these)
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Exact duplicate-segment removal. Docs split into non-overlapping
    * `w`-word segments; a segment string occurring more than once across
    * the corpus is kept ONLY at its canonical first occurrence — the
    * minimum `(doc_id, seg_idx)` — and removed everywhere else. Output
    * per doc: segment count, kept count, and the cleaned text
    * (surviving segments re-joined in order).
    *
    * Scale shape: explode → one groupBy on the segment key (map-side
    * combined: dup groups collapse early) → shuffle join back → one
    * groupBy(doc) rebuild. No window over an unbounded corpus-sized
    * partition, no driver materialization. The group key here is the
    * segment STRING so the DuckDB oracle can replay it verbatim; a
    * production run groups on `xxhash64(seg)` (8-byte shuffle keys,
    * identical plan shape, collisions ~1e-12 at corpus scale). */
  private[graft] def segmentDedup(df: DataFrame, w: Int): DataFrame = {
    val segsArr = TF.bound(TF.tokens(col("text"))) { ts =>
      when(size(ts) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), ceil(size(ts).cast("double") / w).cast("int") - 1),
          i => concat_ws(" ", slice(ts, i * w + 1, lit(w)))))
    }
    val segs = df.select(col("doc_id"), posexplode(segsArr).as(Seq("seg_idx", "seg")))
    val canon = segs.groupBy(col("seg")).agg(
      count(lit(1)).as("__c"),
      min(struct(col("doc_id"), col("seg_idx"))).as("__first"))
    val marked = segs.join(canon, Seq("seg"))
      .withColumn("__keep", col("__c") === 1 ||
        struct(col("doc_id"), col("seg_idx")) === col("__first"))
    marked.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_segs"),
      sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
      concat_ws(" ", transform(
        array_sort(collect_list(when(col("__keep"),
          struct(col("seg_idx"), col("seg"))))),
        x => x.getField("seg"))).as("cleaned"))
  }

  /** Sequence packing as a TWO-LEVEL prefix sum. The naive plan —
    * `sum(n_tok) over (partition by source order by doc_id)` — serializes
    * each source into one task: a dominant source at 100 TB is one
    * straggler doing the whole running sum. Instead:
    *
    *   1. slice each source into `subBuckets` ORDER-PRESERVING ranges of
    *      `doc_id` (monotonic in doc_id, so per-source packing order —
    *      and therefore every chunk id — is byte-identical to the naive
    *      plan's);
    *   2. aggregate per-bucket token sums (map-side combined; the frame
    *      is sources × subBuckets rows) and turn them into cumulative
    *      bucket offsets with a window over that TINY frame;
    *   3. broadcast the offsets back and run the running-sum window
    *      WITHIN each (source, bucket) — parallelism is
    *      sources × subBuckets instead of sources.
    *
    * The broadcasts assume sources × subBuckets ≪ corpus (thousands of
    * sources, not billions); with an unbounded source column the hints
    * come off and the joins degrade to shuffles, still avoiding the
    * single-task window. `base` must carry `doc_id`, `source`, `n_tok`. */
  private[graft] def packChunks(base: DataFrame, subBuckets: Int = 64): DataFrame = {
    val bucketed = withRangeBuckets(base, subBuckets)
    val wOff = Window.partitionBy(col("source")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("source"), col("__bkt"))
      .agg(sum(col("n_tok")).as("__bsum"))
      .withColumn("__off", coalesce(sum(col("__bsum")).over(wOff), lit(0L)))
      .select(col("source"), col("__bkt"), col("__off"))
    val wIn = Window.partitionBy(col("source"), col("__bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("source", "__bkt"))
      .withColumn("tok_start",
        col("__off") + coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
      .withColumn("start_chunk", floor(col("tok_start") / 2048.0).cast("long"))
      .withColumn("end_chunk",
        when(col("n_tok") <= 0, col("start_chunk"))
          .otherwise(floor((col("tok_start") + col("n_tok") - 1) / 2048.0))
          .cast("long"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("tok_start"),
        col("start_chunk"), col("end_chunk"))
  }

  /** Deterministic ORDER-PRESERVING sub-buckets: bucket of a row is its
    * doc_id's position in the source's [min, max] id range scaled to `k`
    * slices — monotonically non-decreasing in doc_id (double multiply /
    * divide by positive constants are monotone), so concatenation order
    * survives. Balanced for roughly uniform ids; a production pipeline
    * with adversarial id distributions would plug approxQuantile
    * boundaries into the same shape. */
  private[graft] def withRangeBuckets(base: DataFrame, k: Int): DataFrame = {
    val bounds = base.groupBy(col("source"))
      .agg(min(col("doc_id")).as("__min"), max(col("doc_id")).as("__max"))
    base.join(broadcast(bounds), Seq("source"))
      .withColumn("__bkt", least(lit(k - 1), floor(
        (col("doc_id") - col("__min")).cast("double") * k /
          (col("__max") - col("__min") + 1).cast("double")).cast("int")))
      .drop("__min", "__max")
  }

  // stratified-sample knobs: docs per stratum, decorrelating salt, and
  // the salt-cell fanout that bounds the first-level sort (see below)
  private val SampleK = 20
  private val SampleSalt = 3000017L
  private val SampleCells = 64L

  /** One-pass column profile: per column — row count, non-null count,
    * distinct count, min/max (as strings, so one schema fits every
    * column type), and mean rendered width. One aggregate job over the
    * table, then a driver-free explode into per-column rows.
    *
    * Scale: `approx = false` uses exact `count(DISTINCT)` — Spark plans
    * k distinct aggregates as an Expand (k× the input rows into the
    * partial aggregate), which is fine for the oracle-checked sf but is
    * the wrong trade at 100 TB. `approx = true` switches to
    * `approx_count_distinct` (HyperLogLog++): single pass, no Expand,
    * map-side partials only — the production profile of a petabyte
    * table costs one scan. */
  private[graft] def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    def nd(c: String): Column =
      if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        round(avg(length(col(c).cast("string"))), 4).as(s"__len_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"),
        col(s"__len_$c").as("avg_len"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Overlapping token-window chunking: split each document's token
    * stream into `chunkSize`-token windows advancing by
    * `chunkSize - overlap` tokens. Window starts stop `overlap` short
    * of the end, so the final window always reaches the last token and
    * no chunk is fully contained in its predecessor (trailing windows
    * may still be short); a 0-token doc yields no chunks. The
    * retrieval-index / RAG prep step. Shape: tokenize → per-row
    * `sequence` of window starts → `explode` → `slice` — a projection
    * with a row-local fan-out of ~n/stride, no shuffle at any corpus
    * size, and deterministic position-derived chunk ids. */
  private[graft] def chunkText(
      df: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap $overlap must be in [0, chunkSize $chunkSize)")
    val stride = chunkSize - overlap
    val toks = TF.tokens(col("text"))
    df.select(col("doc_id"), toks.as("__ts"))
      .withColumn("__n", size(col("__ts")))
      .withColumn("__start", explode(
        when(col("__n") > 0,
          sequence(lit(0),
            greatest(col("__n") - overlap, lit(1)) - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"),
        (col("__start") / stride).cast("int").as("chunk_id"),
        least(col("__n") - col("__start"), lit(chunkSize)).cast("long")
          .as("n_tokens"),
        array_join(slice(col("__ts"), col("__start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Percentile quality gate kernel: score every doc, compute ONE
    * corpus-wide cutoff (a 1-row scalar collect — metadata-plane), keep
    * docs at or above it. `approx = false` uses the exact interpolated
    * `percentile` (sort-based: right for the hash-exact oracle, wrong
    * at 100 TB where it shuffles every score); `approx = true` is the
    * scale path — `approx_percentile` (Greenwald-Khanna sketch: one
    * pass, map-side mergeable, bounded memory at `accuracy`), which
    * moves only per-partition sketches and changes the keep-set by at
    * most the sketch's rank-error band around the cutoff. */
  private[graft] def qualityTopQuantile(
      docs: DataFrame, q: Double, approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    val scored = docs
      .select(col("doc_id"), TF.qualityScore(col("text")).as("quality"))
    val cutoffExpr =
      if (approx) expr(s"approx_percentile(quality, $q, $accuracy)")
      else expr(s"percentile(quality, $q)")
    val row = scored.agg(cutoffExpr).collect()(0)
    // empty corpus: the percentile is NULL — an empty gate, not an NPE
    if (row.isNullAt(0)) scored.filter(lit(false))
    else scored.filter(col("quality") >= row.getDouble(0))
  }

  /** Deterministic stratified sample: the min(k, |stratum|) rows of each
    * stratum with the smallest `(saltedHash, id)` — reproducible across
    * runs and engines, no RNG state, and membership never churns when
    * other rows are added or removed (a doc's rank only moves if docs
    * hashing below it appear in ITS stratum).
    *
    * Scale shape — two-level top-k instead of one stratum-wide window: a
    * single `row_number() OVER (PARTITION BY stratum)` makes the biggest
    * stratum ONE task (the classic 100 TB faceplant when one domain is
    * half the corpus). Level 1 partitions by (stratum, id mod cells) —
    * `cells` way parallelism per stratum — and keeps k per cell; level 2
    * ranks the ≤ k·cells survivors per stratum. Any global top-k row is
    * top-k within its cell, so the result is exactly the one-window
    * answer. */
  private[graft] def stratifiedSample(
      df: DataFrame, stratum: String, id: String, k: Int): DataFrame = {
    val withH = df
      .withColumn("__h", mixBucket(col(id) + lit(SampleSalt), 1000000))
      .withColumn("__cell", pmod(col(id), lit(SampleCells)))
    val w1 = Window.partitionBy(col(stratum), col("__cell"))
      .orderBy(col("__h"), col(id))
    val w2 = Window.partitionBy(col(stratum)).orderBy(col("__h"), col(id))
    withH
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
      .withColumn("rn", row_number().over(w2)).filter(col("rn") <= k)
      .select(col(id), col(stratum), col("rn"))
  }

  val oracleSql: Map[String, String] = Map(
    "d_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, ${Pipeline.tokensSql} AS ts FROM documents),
         |sh AS (SELECT doc_id, list_distinct(${Pipeline.shinglesSql(3)}) AS g FROM toks),
         |bench AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, g FROM sh WHERE doc_id % 97 != 0),
         |cnt AS (
         |  SELECT doc_id, count(*) AS n_shared
         |  FROM (SELECT doc_id, unnest(g) AS gram FROM tr) u
         |  JOIN bench USING (gram) GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(coalesce(c.n_shared, 0) AS BIGINT) AS n_shared,
         |  coalesce(c.n_shared, 0) > 0 AS contaminated
         |FROM tr t LEFT JOIN cnt c USING (doc_id)""".stripMargin,
    // the bloom prefilter is invisible in the output (false positives die
    // in the exact join) — the variant shares the exact oracle verbatim
    "d_decontaminate_bloom" ->
      s"""WITH toks AS (SELECT doc_id, ${Pipeline.tokensSql} AS ts FROM documents),
         |sh AS (SELECT doc_id, list_distinct(${Pipeline.shinglesSql(3)}) AS g FROM toks),
         |bench AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, g FROM sh WHERE doc_id % 97 != 0),
         |cnt AS (
         |  SELECT doc_id, count(*) AS n_shared
         |  FROM (SELECT doc_id, unnest(g) AS gram FROM tr) u
         |  JOIN bench USING (gram) GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(coalesce(c.n_shared, 0) AS BIGINT) AS n_shared,
         |  coalesce(c.n_shared, 0) > 0 AS contaminated
         |FROM tr t LEFT JOIN cnt c USING (doc_id)""".stripMargin,
    "d_repetition" ->
      s"""WITH toks AS (SELECT doc_id, ${Pipeline.tokensSql} AS ts FROM documents),
         |sh AS (SELECT doc_id, ${Pipeline.shinglesSql(2)} AS g FROM toks),
         |u AS (SELECT doc_id, unnest(g) AS gram FROM sh),
         |c AS (SELECT doc_id, gram, count(*) AS c FROM u GROUP BY 1, 2),
         |a AS (SELECT doc_id, sum(c) AS total, max(c) AS maxc, count(*) AS nd
         |      FROM c GROUP BY doc_id)
         |SELECT doc_id,
         |  CAST(total AS BIGINT) AS n_2grams,
         |  CAST(nd AS BIGINT) AS n_distinct_2grams,
         |  round(1.0 - CAST(nd AS DOUBLE) / total, 4) AS dup_2gram_frac,
         |  round(CAST(maxc AS DOUBLE) / total, 4) AS top_2gram_frac
         |FROM a""".stripMargin,
    "d_hash_split" ->
      s"""SELECT doc_id, ${mixBucketSql("doc_id", 1000)} AS bucket,
         |  CASE WHEN ${mixBucketSql("doc_id", 1000)} < 800 THEN 'train'
         |       WHEN ${mixBucketSql("doc_id", 1000)} < 900 THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,
    "d_source_mix" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE ${mixBucketSql(s"doc_id + $MixSalt", 1000)} <
         |  CASE ${MixRates.map { case (k, v) => s"WHEN source = '$k' THEN $v" }
            .mkString(" ")} ELSE $MixDefaultRate END""".stripMargin,
    "d_chunk_text" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${Pipeline.tokensSql} AS ts FROM documents),
         |starts AS (
         |  SELECT doc_id, ts, len(ts) AS n,
         |    unnest(range(0, greatest(len(ts) - 16, 1), 48)) AS s
         |  FROM toks WHERE len(ts) > 0)
         |SELECT doc_id, CAST(s // 48 AS INT) AS chunk_id,
         |  CAST(least(n - s, 64) AS BIGINT) AS n_tokens,
         |  array_to_string(list_slice(ts, s + 1, least(s + 64, n)), ' ')
         |    AS chunk_text
         |FROM starts""".stripMargin,
    "d_pack_chunks" ->
      s"""WITH toks AS (SELECT doc_id, source, ${Pipeline.tokensSql} AS ts FROM documents),
         |n AS (SELECT doc_id, source,
         |  CAST(coalesce(list_sum(list_transform(ts,
         |    t -> greatest(1, CAST(ceil(length(t) / 4.0) AS INT)))), 0) AS BIGINT)
         |    AS n_tok FROM toks),
         |w AS (SELECT doc_id, source, n_tok,
         |  CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS tok_start FROM n)
         |SELECT doc_id, source, n_tok, tok_start,
         |  CAST(floor(tok_start / 2048.0) AS BIGINT) AS start_chunk,
         |  CAST(CASE WHEN n_tok <= 0 THEN floor(tok_start / 2048.0)
         |       ELSE floor((tok_start + n_tok - 1) / 2048.0) END AS BIGINT)
         |    AS end_chunk
         |FROM w""".stripMargin,
    "d_segment_dedup" ->
      s"""WITH toks AS (SELECT doc_id, ${Pipeline.tokensSql} AS ts FROM documents),
         |e AS (SELECT doc_id, ts,
         |  CAST(unnest(range(0, CAST(ceil(len(ts) / $SegWords.0) AS INT))) AS INT)
         |    AS seg_idx FROM toks),
         |segs AS (SELECT doc_id, seg_idx,
         |  array_to_string(list_slice(ts, seg_idx * $SegWords + 1,
         |    seg_idx * $SegWords + $SegWords), ' ') AS seg FROM e),
         |w AS (SELECT doc_id, seg_idx, seg,
         |  count(*) OVER (PARTITION BY seg) AS c,
         |  row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
         |  FROM segs)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_segs,
         |  CAST(sum(CASE WHEN c = 1 OR rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  coalesce(string_agg(CASE WHEN c = 1 OR rn = 1 THEN seg END,
         |    ' ' ORDER BY seg_idx), '') AS cleaned
         |FROM w GROUP BY doc_id""".stripMargin,
    "d_lang_balance" ->
      s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
         |r AS (SELECT lang, CAST(floor(sqrt(
         |    (SELECT CAST(min(cnt) AS DOUBLE) FROM c) / cnt) * 1000) AS BIGINT)
         |  AS keep_permille FROM c)
         |SELECT d.doc_id, d.lang, r.keep_permille
         |FROM documents d JOIN r USING (lang)
         |WHERE ${mixBucketSql(s"doc_id + $BalanceSalt", 1000)} < r.keep_permille""".stripMargin,
    "d_pii_scrub" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 10 = 0
         |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
         |        || '@example.com or call 555-123-4567 now'
         |      ELSE text END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '$EmailRe')) AS n_emails,
         |  len(regexp_extract_all(t, '$PhoneRe')) AS n_phones,
         |  regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g') AS scrubbed
         |FROM c""".stripMargin,
    "d_quality_topq" ->
      s"""WITH toks AS (SELECT doc_id, text, ${Pipeline.tokensSql} AS ts
         |              FROM documents),
         |m AS (SELECT doc_id, len(ts) AS n,
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
         |  FROM toks),
         |qual AS (SELECT doc_id,
         |  round(least(1.0, n / 50.0)
         |    * (0.5 + diversity * 0.5)
         |    * greatest(0.0, 1.0 - punct * 5 - digit * 5)
         |    * (CASE WHEN avg_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END),
         |    4) AS quality FROM m)
         |SELECT doc_id, quality FROM qual
         |WHERE quality >= (SELECT quantile_cont(quality, 0.2) FROM qual)""".stripMargin,
    "d_token_hist" ->
      s"""WITH n AS (
         |  SELECT CAST(coalesce(list_sum(list_transform(${Pipeline.tokensSql},
         |    t -> greatest(1, CAST(ceil(length(t) / 4.0) AS INT)))), 0) AS BIGINT)
         |    AS n_tok
         |  FROM documents)
         |SELECT n_tok - n_tok % 32 AS bucket,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens
         |FROM n GROUP BY 1""".stripMargin,
    "d_profile" ->
      Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val,
           |  round(avg(length(CAST($c AS VARCHAR))), 4) AS avg_len
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "d_stratified_sample" ->
      s"""WITH h AS (SELECT doc_id, source,
         |  ${mixBucketSql(s"doc_id + $SampleSalt", 1000000)} AS hh
         |  FROM documents),
         |r AS (SELECT doc_id, source,
         |  row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn
         |  FROM h)
         |SELECT doc_id, source, rn FROM r WHERE rn <= $SampleK""".stripMargin,
    "d_e2e_pipeline" ->
      s"""WITH toks AS (
         |  SELECT doc_id, text, source, ${Pipeline.tokensSql} AS ts FROM documents),
         |sh AS (SELECT doc_id, list_distinct(${Pipeline.shinglesSql(3)}) AS g
         |       FROM toks),
         |bench AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 97 = 0),
         |cont AS (SELECT DISTINCT u.doc_id
         |  FROM (SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id % 97 != 0) u
         |  JOIN bench USING (gram)),
         |m AS (SELECT doc_id, len(ts) AS n,
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
         |  FROM toks),
         |qual AS (SELECT doc_id,
         |  round(least(1.0, n / 50.0)
         |    * (0.5 + diversity * 0.5)
         |    * greatest(0.0, 1.0 - punct * 5 - digit * 5)
         |    * (CASE WHEN avg_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END),
         |    4) AS quality FROM m),
         |clean AS (
         |  SELECT t.doc_id, t.source, t.ts FROM toks t JOIN qual q USING (doc_id)
         |  WHERE t.doc_id % 97 != 0
         |    AND t.doc_id NOT IN (SELECT doc_id FROM cont)
         |    AND q.quality >= 0.3
         |    AND ${mixBucketSql("t.doc_id", 1000)} < 800),
         |n AS (SELECT doc_id, source,
         |  CAST(coalesce(list_sum(list_transform(ts,
         |    t -> greatest(1, CAST(ceil(length(t) / 4.0) AS INT)))), 0) AS BIGINT)
         |    AS n_tok FROM clean),
         |w AS (SELECT doc_id, source, n_tok,
         |  CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS tok_start FROM n)
         |SELECT doc_id, source, n_tok, tok_start,
         |  CAST(floor(tok_start / 2048.0) AS BIGINT) AS start_chunk,
         |  CAST(CASE WHEN n_tok <= 0 THEN floor(tok_start / 2048.0)
         |       ELSE floor((tok_start + n_tok - 1) / 2048.0) END AS BIGINT)
         |    AS end_chunk
         |FROM w""".stripMargin)
}
