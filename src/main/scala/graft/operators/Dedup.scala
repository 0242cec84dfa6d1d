package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** Deduplication family for training-data pipelines. Every variant is a
  * candidate-generation + verify pipeline built so the candidate join is
  * the ONLY shuffle and its key cardinality stays bounded at 100 TB:
  *
  *  - exact:      hash-groupBy on the content column (1 shuffle)
  *  - MinHash:    shingle → signature → banded bucket join → exact
  *                Jaccard verify on candidates only
  *  - SimHash:    64-bit sketch → 4×16-bit chunk pigeonhole join →
  *                Hamming verify (catches Hamming ≤ 3 with certainty ≥
  *                one chunk equal)
  *  - n-gram Jaccard: exact pairwise, for use under a blocking key
  *  - embedding:  random-hyperplane sketch bucket join → cosine verify
  */
object Dedup {

  // ------------------------------------------------ persist tracking
  // sigFrame persists the shared shingle+signature frame with no
  // unpersist path — fine for one-shot batch queries (Verify/Bench
  // clearCache between queries), but a LONG-RUNNING caller (the ingest
  // stream's per-micro-batch body) must release exactly those frames,
  // not nuke the whole session cache.
  private val trackedPersists =
    new ThreadLocal[scala.collection.mutable.Buffer[DataFrame]]

  /** Run `body` collecting every frame the minhash kernels persist on
    * THIS thread, and unpersist them all afterwards (after the body's
    * actions have completed). */
  private[graft] def trackingPersists[T](body: => T): T = {
    val buf = scala.collection.mutable.Buffer.empty[DataFrame]
    trackedPersists.set(buf)
    try body finally {
      trackedPersists.remove()
      buf.foreach(df => df.unpersist())
    }
  }

  /** Exact dedup: keep the minimum-id row per distinct content value.
    * Map-side partial agg keeps the shuffle small even when most rows
    * are unique. */
  def exactKeepMinId(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Exact dedup returning the surviving full rows. */
  def exactSurvivors(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(contentCol)).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash + LSH near-duplicate PAIRS.
    *
    * numHashes signatures split into `bands`; docs sharing any band's
    * sub-signature become candidates (standard S-curve: with b bands of
    * r rows, P(candidate) = 1-(1-s^r)^b). Candidates are verified with
    * exact Jaccard over distinct word shingles; pairs ≥ threshold
    * survive. */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    pairsFromSignatures(sigFrame(df, textCol, idCol, numHashes, shingleSize),
      bands, numHashes / bands, threshold)
  }

  /** [[minhashPairs]] over a PRECOMPUTED [[signatureFrame]] — the
    * shape a streaming ingest uses to shingle+minhash each micro-batch
    * exactly once and reuse the frame for intra-batch pairs, the
    * stored-index check and the index rows. */
  private[graft] def pairsFromSignatures(
      withSig: DataFrame,
      bands: Int,
      rows: Int,
      threshold: Double): DataFrame = {
    val bandKeys = bandKeyFrame(withSig, bands, rows)

    val candidates = bandKeys.select(col("band"), col("band_key"), col("id").as("id_a"))
      .join(bandKeys.select(col("band"), col("band_key"), col("id").as("id_b")),
        Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // collapses multi-band hits

    // re-attach shingle sets only for the (few) candidates, then verify
    val sets = withSig.select(col("id"), col("shingles"))
    candidates
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("__j", TF.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("__j") >= threshold) // threshold on the RAW value
      .select(col("id_a"), col("id_b"), round(col("__j"), 4).as("jaccard"))
  }

  /** Incremental near-dup check of a NEW batch against an existing
    * corpus — the "dedup before ingest" gate of a continuously-fed
    * training pipeline: which batch docs are ≥ threshold Jaccard-similar
    * to some already-stored doc?
    *
    * Scale shape: the corpus side's (band, band_key) rows are exactly
    * the banding step of [[minhashPairs]] — at 100 TB that index is
    * computed ONCE, persisted as a table keyed by band_key, and kept
    * current by appending each accepted batch's keys; the corpus text is
    * NEVER rescanned per ingest. Each arriving batch (small by
    * definition) broadcasts its band keys into the index join, so the
    * corpus side shuffles nothing; exact-Jaccard verification re-attaches
    * shingle sets for the candidate ids only. */
  def minhashAgainstIndex(
      corpus: DataFrame,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val corpusSig = sigFrame(corpus, textCol, idCol, numHashes, shingleSize)
    val batchSig = sigFrame(batch, textCol, idCol, numHashes, shingleSize)
    val corpusKeys = bandKeyFrame(corpusSig, bands, rows)
      .select(col("band"), col("band_key"), col("id").as("corpus_id"))
    val batchKeys = bandKeyFrame(batchSig, bands, rows)
      .select(col("band"), col("band_key"), col("id").as("batch_id"))

    val candidates = corpusKeys
      .join(broadcast(batchKeys), Seq("band", "band_key"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct() // collapses multi-band hits

    candidates
      .join(batchSig.select(col("id").as("batch_id"), col("shingles").as("sh_b")),
        Seq("batch_id"))
      .join(corpusSig.select(col("id").as("corpus_id"), col("shingles").as("sh_c")),
        Seq("corpus_id"))
      .withColumn("__j", TF.jaccardSorted(col("sh_b"), col("sh_c")))
      .filter(col("__j") >= threshold)
      .select(col("batch_id"), col("corpus_id"), round(col("__j"), 4).as("jaccard"))
  }

  /** The persistable minhash band index of a corpus: one (id, band,
    * band_key) row per (doc, band). This is the table a standing corpus
    * stores (and appends to on every accepted ingest) so that
    * [[minhashAgainstStoredIndex]] never rescans corpus text — 24
    * bytes/row × bands, the whole dedup state of a 100 TB corpus. */
  def minhashIndexRows(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    bandKeyFrame(sigFrame(corpus, textCol, idCol, numHashes, shingleSize),
      bands, numHashes / bands)
  }

  /** [[minhashAgainstIndex]], but candidates come from a PRE-BUILT
    * index (e.g. [[minhashIndexRows]] read back from a graft table)
    * instead of re-banding the corpus. Corpus text is touched ONLY for
    * the candidate ids (broadcast semi-join prunes the scan before any
    * shingle computation), so per-ingest cost is O(index ⋈ batch) +
    * O(candidates) — independent of corpus text volume. Parameters must
    * match the ones the index was built with. */
  def minhashAgainstStoredIndex(
      index: DataFrame,
      corpus: DataFrame,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    val (batchSig, candidates) =
      storedIndexCandidates(index, batch, textCol, idCol, numHashes, bands, shingleSize)
    // fetch + shingle ONLY the candidate corpus docs (broadcast
    // semi-join: filters rows, though the corpus SCAN still lists every
    // file — the point-read variant below prunes the scan itself)
    val candIds = candidates.select(col("corpus_id").as(idCol)).distinct()
    val candText = corpus.join(broadcast(candIds), Seq(idCol))
    verifyCandidates(candidates, batchSig, candText, textCol, idCol,
      shingleSize, threshold)
  }

  /** [[minhashAgainstStoredIndex]] with the candidate text fetched via
    * PK POINT READS: candidate ids (bounded by the batch's band matches
    * — a metadata-plane collect) go to `fetchByIds`, which should issue
    * a primary-key `isin` read against the corpus table(s) so manifest
    * stats / bloom pruning skip every data file containing no
    * candidate. This is the standing-ingest shape at 100 TB: a
    * broadcast semi-join still LISTS (and at best row-group-skips) the
    * whole corpus scan every micro-batch; a PK point read touches only
    * the files the candidates live in. */
  def minhashAgainstStoredIndexPointRead(
      index: DataFrame,
      fetchByIds: Seq[Long] => DataFrame,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    val (batchSig, candidates) =
      storedIndexCandidates(index, batch, textCol, idCol, numHashes, bands, shingleSize)
    val ids = candidates.select(col("corpus_id")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    verifyCandidates(candidates, batchSig, fetchByIds(ids), textCol, idCol,
      shingleSize, threshold)
  }

  /** [[minhashAgainstStoredIndexPointRead]] with the INDEX itself also
    * fetched by point read: the batch's band keys (micro-batch-bounded —
    * ≤ batch rows × bands 64-bit values, a metadata-plane collect) go to
    * `fetchIndexByBandKeys`, which should issue a `band_key.isin` read
    * against the persisted index table. With the index range-clustered
    * on `band_key` and `band_key` in its stats fields, manifest pruning
    * skips every index file whose key range the batch cannot touch — so
    * per-batch cost is O(batch bands) + O(touched index files) +
    * O(candidate files), and NEITHER the corpus text NOR the
    * corpus-sized index is scanned per batch. This is the standing
    * 100 TB ingest shape: at that scale the band index is itself a
    * multi-TB table, and a full `readAll()` per micro-batch would
    * dominate batch cost (periodic `clusterBy("band_key")` maintenance
    * keeps later appends pruned too). */
  def minhashAgainstStoredIndexPruned(
      fetchIndexByBandKeys: Seq[Long] => DataFrame,
      fetchByIds: Seq[Long] => DataFrame,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 32,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    storedIndexPrunedFromSignatures(fetchIndexByBandKeys, fetchByIds,
      sigFrame(batch, textCol, idCol, numHashes, shingleSize),
      bands, numHashes / bands, textCol, idCol, shingleSize, threshold)
  }

  /** [[minhashAgainstStoredIndexPruned]] over a PRECOMPUTED
    * [[signatureFrame]] (see [[pairsFromSignatures]] for why). */
  private[graft] def storedIndexPrunedFromSignatures(
      fetchIndexByBandKeys: Seq[Long] => DataFrame,
      fetchByIds: Seq[Long] => DataFrame,
      batchSig: DataFrame,
      bands: Int,
      rows: Int,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame = {
    val batchKeys = bandKeyFrame(batchSig, bands, rows)
      .select(col("band"), col("band_key"), col("id").as("batch_id"))
    val keys = batchKeys.select(col("band_key")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val candidates = candidatesFrom(fetchIndexByBandKeys(keys), batchKeys)
    val ids = candidates.select(col("corpus_id")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    verifyCandidates(candidates, batchSig, fetchByIds(ids), textCol, idCol,
      shingleSize, threshold)
  }

  /** Precomputed (id, shingles, sig) frame for reuse across the
    * kernels above; persisted (and tracked under [[trackingPersists]])
    * exactly like the frames the kernels build internally. */
  private[graft] def signatureFrame(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      shingleSize: Int): DataFrame =
    sigFrame(df, textCol, idCol, numHashes, shingleSize)

  /** [[minhashIndexRows]] over a precomputed [[signatureFrame]]. */
  private[graft] def indexRowsFromSignatures(
      sig: DataFrame, bands: Int, rows: Int): DataFrame =
    bandKeyFrame(sig, bands, rows)

  /** Batch signatures + light (band, band_key, batch_id) band rows —
    * stage 0 of every stored-index check. */
  private def batchBandKeys(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      bands: Int,
      shingleSize: Int): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val batchSig = sigFrame(batch, textCol, idCol, numHashes, shingleSize)
    val batchKeys = bandKeyFrame(batchSig, bands, numHashes / bands)
      .select(col("band"), col("band_key"), col("id").as("batch_id"))
    (batchSig, batchKeys)
  }

  /** Banded-key candidate join: (batch_id, corpus_id) pairs sharing a
    * band key with the (pre-fetched or full) index. */
  private def candidatesFrom(index: DataFrame, batchKeys: DataFrame): DataFrame =
    index
      .select(col("band"), col("band_key"), col("id").as("corpus_id"))
      .join(broadcast(batchKeys), Seq("band", "band_key"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()

  /** Shared stage 1 of the stored-index check: batch signatures + the
    * (batch_id, corpus_id) candidate pairs from the banded-key join. */
  private def storedIndexCandidates(
      index: DataFrame,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int,
      bands: Int,
      shingleSize: Int): (DataFrame, DataFrame) = {
    val (batchSig, batchKeys) =
      batchBandKeys(batch, textCol, idCol, numHashes, bands, shingleSize)
    (batchSig, candidatesFrom(index, batchKeys))
  }

  /** Shared stage 2: exact-Jaccard verification of candidate pairs
    * against the fetched candidate text. */
  private def verifyCandidates(
      candidates: DataFrame,
      batchSig: DataFrame,
      candText: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame = {
    val candShingles = candText
      .select(col(idCol).as("corpus_id"),
        TF.wordShingleHashes(col(textCol), shingleSize).as("sh_c"))
    candidates
      .join(batchSig.select(col("id").as("batch_id"), col("shingles").as("sh_b")),
        Seq("batch_id"))
      .join(candShingles, Seq("corpus_id"))
      .withColumn("__j", TF.jaccardSorted(col("sh_b"), col("sh_c")))
      .filter(col("__j") >= threshold)
      .select(col("batch_id"), col("corpus_id"), round(col("__j"), 4).as("jaccard"))
  }

  /** (id, shingles, sig) for a frame. Native shingle/minhash
    * expressions: one static-call kernel each — no HOF re-inlining
    * hazard, tiny generated code. persist: this frame feeds band-key
    * generation AND the candidate re-attach joins — without it the
    * shingle+signature pipeline runs multiple times (LRU-evicted when
    * memory is needed). */
  private def sigFrame(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int, shingleSize: Int): DataFrame = {
    val shingleExpr = TF.wordShingleHashes(col(textCol), shingleSize)
    // fanOut: the shingle+minhash kernel is per-row CPU; a one-split
    // scan of a small dense corpus would run it on one core
    val p = SkewUtils.fanOut(df).select(
      col(idCol).as("id"),
      shingleExpr.as("shingles"),
      TF.minhashSignature(shingleExpr, numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Option(trackedPersists.get).foreach(_ += p)
    p
  }

  /** LIGHT band rows: (id, band, 64-bit key of the band's sub-signature)
    * — LSH joins shuffle 16 bytes per row, never the shingle arrays. */
  private def bandKeyFrame(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")

  /** SimHash near-duplicate pairs with Hamming distance ≤ maxHamming.
    * Pigeonhole banding: split the 64-bit sketch into 4 16-bit chunks;
    * any pair within Hamming ≤ 3 shares at least one exact chunk. */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    // the fixed 4×16-bit chunk pigeonhole only GUARANTEES a shared
    // chunk for Hamming ≤ 3 — a larger threshold would silently miss
    // pairs whose 4+ differing bits spread across all chunks
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming $maxHamming exceeds the 4-chunk pigeonhole bound (3)")
    val sketched = SkewUtils.fanOut(df).select(col(idCol).as("id"),
      TF.simhash64(TF.tokens(col(textCol))).as("sim"))

    val chunked = sketched.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")

    val l = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val r = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_b"), col("sim").as("sim_b"))

    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", TF.hammingDistance64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Collapse near-duplicate PAIRS into connected components and elect
    * the min-id survivor per component — the step between pair
    * generation and corpus filtering in a full dedup pipeline (a chain
    * a~b~c must keep ONE doc, even though (a,c) was never a pair).
    *
    * Iterative min-label propagation over the PAIR GRAPH ONLY: the loop
    * touches just the nodes that occur in some pair (bounded by
    * 2·|pairs|, tiny next to the corpus — at 100 TB the corpus never
    * enters the loop; it joins in exactly once at the end to pick up
    * singletons). Every round each node takes the smallest label among
    * itself and its neighbors — one join + one partial-aggregated
    * groupBy per round, rounds = O(component diameter); convergence is
    * read off the propagation frame itself (no extra join). Near-dup
    * components are near-cliques, so 2-3 rounds in practice; no
    * driver-side graph state, labels only ever shrink. At extreme
    * diameters swap in large-star/small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — same primitive.
    *
    * Returns (idCol, cluster_id, survivor): every id of `universe`
    * labeled with its component's min id; singletons label themselves. */
  def dedupClusters(
      pairs: DataFrame,
      universe: DataFrame,
      idCol: String,
      idA: String = "id_a",
      idB: String = "id_b",
      maxDriverEdges: Long = 1000000L): DataFrame = {
    val half0 = pairs.select(col(idA).as("src"), col(idB).as("dst"))

    // ADAPTIVE CUTOVER. The pair graph is bounded by the candidate pairs
    // — orders of magnitude smaller than the corpus (the corpus never
    // enters either path's loop). When it fits comfortably on the driver
    // (≤ maxDriverEdges, integral ids) a local union-find replaces the
    // whole iterative join loop with one collect: O(E α(E)) and zero
    // extra Spark jobs. Above the threshold — or for non-integral ids —
    // fall through to the distributed min-label loop, which scales to
    // arbitrarily large pair graphs.
    val idType = half0.schema.head.dataType
    val integral = idType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val half = half0.localCheckpoint() // materialize the pair pipeline once
    val nEdges = half.count()
    if (integral && nEdges <= maxDriverEdges) {
      val es = half.select(col("src").cast("long"), col("dst").cast("long")).collect()
      // union toward the smaller root: the root of each component is by
      // construction its min id, so no relabel pass is needed
      val parent = new java.util.HashMap[Long, Long](es.length * 2)
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.get(x)
        while (p != x) { // path halving
          val gp = parent.get(p)
          parent.put(x, gp); x = gp; p = parent.get(x)
        }
        x
      }
      es.foreach { r =>
        val a = r.getLong(0); val b = r.getLong(1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      val spark = universe.sparkSession
      import scala.jdk.CollectionConverters._
      val labelRows = parent.keySet().asScala.iterator
        .map(k => org.apache.spark.sql.Row(k, find(k))).toSeq
      val labelSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.LongType)))
      val labels = spark.createDataFrame(
          spark.sparkContext.parallelize(labelRows, 1), labelSchema)
        .select(col("id").cast(idType).as("id"), col("label").cast(idType).as("label"))
      val u = universe.select(col(idCol)).distinct()
      // the union-find consumed the edge list: release half's
      // checkpoint blocks (Dataset.unpersist can't — they live outside
      // the CacheManager)
      org.apache.spark.sql.graftshim.PlanAudit.releaseCheckpoint(half)
      return u.join(broadcast(labels), u(idCol) === labels("id"), "left")
        .select(u(idCol),
          coalesce(col("label"), u(idCol)).as("cluster_id"),
          (coalesce(col("label"), u(idCol)) === u(idCol)).as("survivor"))
    }

    // localCheckpoint (not persist): truncating lineage each round keeps
    // the per-round physical plan IDENTICAL across iterations — one
    // codegen compile total instead of one per round — and is the
    // standard guard against lineage blowup in iterative algorithms
    // (at 100 TB a 10-round loop would otherwise replay 10 joins deep).
    val edges = half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // edges' checkpoint truncated the lineage: half's blocks are done
    org.apache.spark.sql.graftshim.PlanAudit.releaseCheckpoint(half)
    // track each round's DIRECT checkpoint so its blocks can be
    // released when superseded (Dataset.unpersist doesn't touch them)
    var labelsCk = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var labels = labelsCk.toDF()
    try {
      var changed = 1L
      var iters = 0
      while (changed > 0) {
        iters += 1
        val itT0 = System.nanoTime()
        val prop = edges.join(labels, edges("src") === labels("id"))
          .groupBy(col("dst")).agg(min(col("label")).as("nl"))
        val next = labels
          .join(prop, labels("id") === prop("dst"), "left")
          .select(labels("id"), labels("label").as("prev"),
            least(labels("label"), coalesce(col("nl"), labels("label"))).as("label"))
          .localCheckpoint()
        changed = next.filter(col("label") =!= col("prev")).count()
        org.apache.spark.sql.graftshim.PlanAudit.releaseCheckpoint(labelsCk)
        labelsCk = next
        labels = next.select(col("id"), col("label"))
        if (sys.env.contains("GRAFT_PROF"))
          println(s"[cc] iter $iters changed=$changed ${(System.nanoTime() - itT0) / 1e9}s")
      }
      // paired nodes carry their component min; everything else is a
      // singleton — one broadcast-able left join against the corpus.
      // (The FINAL round's checkpoint stays alive: the returned frame
      // references it; its blocks free when the caller is done.)
      val u = universe.select(col(idCol)).distinct()
      u.join(labels, u(idCol) === labels("id"), "left")
        .select(u(idCol),
          coalesce(col("label"), u(idCol)).as("cluster_id"),
          (coalesce(col("label"), u(idCol)) === u(idCol)).as("survivor"))
    } finally org.apache.spark.sql.graftshim.PlanAudit.releaseCheckpoint(edges)
  }

  /** Exact n-gram Jaccard pairs within a blocking key (all-pairs inside
    * each block only — at scale the block is a cheap partition key like
    * source/length-bucket; full cross-join is never materialized).
    *
    * The block self-join is SALTED (SkewUtils.saltedJoin): one hot block
    * would otherwise concentrate its O(n²) pair generation in a single
    * task; with salting the block's pairs spread over `salts` tasks (the
    * b-side partitions by a per-row hash salt, the a-side replicates —
    * only (id, size) rows, 16 bytes each, ever replicate or shuffle). */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int = 2,
      threshold: Double = 0.5,
      salts: Int = 8): DataFrame = {
    val grams = SkewUtils.fanOut(df)
      .select(col(blockCol).as("block"), col(idCol).as("id"),
      TF.wordShingleHashes(col(textCol), n).as("grams"))
      .withColumn("sz", size(col("grams")))

    // Gram arrays ride THROUGH the block self-join — each array crosses
    // the shuffle once per doc (× salt replicas), never once per pair.
    // Candidates here are ALL block pairs (unlike LSH there is no band
    // prefilter), so the whole pair predicate — id ordering, the integer
    // size-ratio prefilter (J ≤ min|·|/max|·| can't reach the threshold
    // for mismatched sizes), and the exact sorted-merge verify — runs as
    // the JOIN CONDITION: it short-circuits left-to-right against the
    // two input rows, and a joined output row (with both wide arrays
    // copied in) is only ever built for pairs that pass. Jaccard is
    // recomputed in the projection for the few survivors.
    val pairs = SkewUtils.saltedJoin(
        big = grams.select(col("block"), col("id").as("id_b"),
          col("sz").as("sz_b"), col("grams").as("g_b")),
        small = grams.select(col("block"), col("id").as("id_a"),
          col("sz").as("sz_a"), col("grams").as("g_a")),
        key = "block",
        salts = salts,
        extraCond = (b, a) =>
          a("id_a") < b("id_b") &&
            least(a("sz_a"), b("sz_b")).cast("double") >=
              greatest(a("sz_a"), b("sz_b")) * threshold &&
            TF.jaccardSorted(a("g_a"), b("g_b")) >= threshold)
    pairs
      .withColumn("__j", TF.jaccardSorted(col("g_a"), col("g_b")))
      .select(col("id_a"), col("id_b"), round(col("__j"), 4).as("jaccard"))
  }

  /** Embedding near-duplicate pairs: hyperplane-sketch bands as the
    * bucket join, exact cosine verify on candidates. With `bands` bands
    * of `bitsPerBand` planes, a pair at angle θ collides in one band
    * w.p. (1-θ/π)^bits; for near-dup thresholds (≥0.95 cosine) recall is
    * effectively 1 while random pairs almost never collide. */
  def embeddingCosinePairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      threshold: Double = 0.99,
      bands: Int = 4,
      bitsPerBand: Int = 8): DataFrame = {
    val planes = VF.randomPlanes(bands * bitsPerBand, dim)
    val sketched = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sketch", VF.hyperplaneSketch(col("v"), planes))
    // light band join (ids only), vectors re-attached to candidates
    val banded = sketched.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sketch"), b * bitsPerBand)
          .bitwiseAND(lit((1L << bitsPerBand) - 1))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")

    val candidates = banded.select(col("band"), col("band_val"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("band_val"), col("id").as("id_b")),
        Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    val vecs = sketched.select(col("id"), col("v"))
    candidates
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("__c", VF.cosine(col("v_a"), col("v_b")))
      .filter(col("__c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__c"), 4).as("cosine"))
  }
}
