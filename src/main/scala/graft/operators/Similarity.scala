package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query
  *    set against the corpus, one scan, per-query top-k via window.
  *    At 100 TB this is the correct plan when queries ≪ corpus: the
  *    corpus is never shuffled, only scanned.
  *  - [[ivfTopK]]: the scale path — coarse-quantize the corpus into
  *    hyperplane-sketch cells (computed in the same scan, no training
  *    job needed), probe only cells the query sketch (and its nearest
  *    neighbors by sketch Hamming distance) maps to. Corpus side stays
  *    partitioned by cell: the probe is a semi-join, not a cross-join.
  */
object Similarity {

  /** Exact top-k: for each query row, the k most-cosine-similar corpus
    * rows (excluding self-matches by id). Deterministic ordering via
    * (score desc, id asc).
    *
    * Scale shape: brute force must SCORE all N×Q pairs, but it must not
    * SHIP them — the per-query ranking runs through the bounded
    * [[org.apache.spark.sql.graftshim.TopKByScore]] aggregate, whose
    * map-side partial caps at k entries, so the one shuffle carries
    * ≤ partitions × k rows per query and no task ever holds a whole
    * query's scored corpus (the `Window.partitionBy(q_id)` formulation
    * did exactly that). Ranks on the RAW score (rounded ties would
    * reorder vs an oracle); posexplode over the sorted result array
    * recovers the rank. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("qv")))
    val scored = c.join(q, col("vec_id") =!= col("q_id"))
      .withColumn("__s", VF.cosine(col("v"), col("qv")))
    topKPerQuery(scored, k, "score")
  }

  /** Per-query bounded top-k over a scored candidate frame
    * (`q_id`, `vec_id`, `__s`): one aggregate through
    * [[org.apache.spark.sql.graftshim.TopKByScore]] — the map-side
    * partial caps at k, so the shuffle carries ≤ partitions × k rows
    * per query and no task ever holds a query's whole candidate set
    * (the `row_number().over(Window.partitionBy(q_id))` formulation
    * did). Output order and ties (score desc, id asc) are identical to
    * the window formulation, so oracles are unaffected; `posexplode`
    * over the sorted result array recovers the rank. */
  private def topKPerQuery(scored: DataFrame, k: Int, outScore: String): DataFrame = {
    import org.apache.spark.sql.graftshim.TopKByScore
    scored.groupBy(col("q_id"))
      .agg(TopKByScore(col("__s"), col("vec_id"), k).as("__tk"))
      .select(col("q_id"), posexplode(col("__tk")).as(Seq("__i", "__x")))
      .select(col("q_id"), col("__x.vec_id").as("vec_id"),
        round(col("__x.score"), 4).as(outScore),
        (col("__i") + 1).cast("int").as("rank"))
  }

  /** IVF-style ANN: corpus rows are assigned a `cells`-bit hyperplane
    * sketch; each query probes all cells within `probeHamming` sketch
    * bits of its own (multi-probe), then ranks exactly within the probed
    * subset. Recall improves with probeHamming at linear cost in probed
    * cells. */
  def ivfTopK(
      spark: SparkSession,
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      k: Int,
      sketchBits: Int = 8,
      probeHamming: Int = 1): DataFrame = {
    val planes = VF.randomPlanes(sketchBits, dim)
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("cell", VF.hyperplaneSketch(col("v"), planes))

    // all sketch values within probeHamming bits of a query's sketch
    val masks: Seq[Long] = {
      def combos(bits: List[Int], flip: Int): Seq[Long] =
        if (flip == 0) Seq(0L)
        else bits match {
          case Nil => Seq(0L)
          case b :: rest =>
            combos(rest, flip) ++ combos(rest, flip - 1).map(_ | (1L << b))
        }
      combos((0 until sketchBits).toList, probeHamming).distinct
    }
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("q_cell", VF.hyperplaneSketch(col("qv"), planes))
      .withColumn("cell", explode(
        transform(lit(masks.toArray), m => col("q_cell").bitwiseXOR(m))))

    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("__s", VF.cosine(col("v"), col("qv")))
    topKPerQuery(scored, k, "score")
  }

  /** K-means coarse quantizer: Lloyd's iterations as DataFrame jobs over
    * a bounded sample. Deterministic: the sample is a PER-PARTITION HASH
    * THRESHOLD — keep rows whose seeded id-hash falls under a
    * count-calibrated cutoff. (`orderBy(hash).limit(n)` would compile to
    * TakeOrderedAndProject, whose driver merge is O(partitions × n) —
    * the wrong shape at extreme partition counts; the threshold filter
    * ships nothing to the driver and needs no sort.) Init = the
    * `numCentroids` smallest-hash rows OF THE BOUNDED SAMPLE (a top-16
    * over ≤~1.1 × sampleSize rows; deterministic, but a DIFFERENT pick
    * than a raw-signed-hash order — the sample hash is
    * pmod(xxhash64, 2^32), so centroids are not comparable across the
    * two implementations); each iteration is one assignment scan + a per-(cell,
    * dimension) mean via posexplode — the shuffle carries
    * `numCentroids × dim` partial sums, not vectors. Empty cells keep
    * their previous centroid. */
  def trainCentroids(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      numCentroids: Int,
      numIters: Int = 3,
      sampleSize: Int = 100000,
      seed: Long = 42L): Seq[Seq[Double]] = {
    val sample = thresholdSample(df, vecCol, idCol, sampleSize, numCentroids, seed)
    try {
      // id tie-break: ~1 hash collision is EXPECTED in a 100k-row
      // sample (32-bit hash space); without it a tie at the init
      // boundary would make training partition-order-dependent
      var centroids: Seq[Seq[Double]] = sample
        .orderBy(col("__h"), col("id")).limit(numCentroids)
        .collect().map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
      var iter = 0
      while (iter < numIters) {
        val assigned = sample.withColumn("cell",
          org.apache.spark.sql.graftshim.NearestCentroidsExpr(col("v"), centroids, 1)(0))
        // Per-(cell, dimension) mean in FIXED POINT: a double `avg` is
        // merge-order-sensitive (float addition is not associative), so
        // trained centroids would differ run-to-run with partitioning —
        // the one thing that kept this operator oracle-less. Scaled-long
        // sums are exact and associative: bit-identical centroids at any
        // parallelism. S = 2^36 keeps 1.5e-11 precision with overflow
        // headroom up to |x| ≈ 1e3 at the 1e5-row sample cap.
        val S = (1L << 36).toDouble
        val means = assigned
          .select(col("cell"), posexplode(col("v")))
          .groupBy(col("cell"), col("pos"))
          .agg(sum(round(col("col") * S).cast("long")).as("fs"),
            count(lit(1)).as("n"))
          .collect()
        val byCell = means.groupBy(_.getInt(0))
        centroids = centroids.zipWithIndex.map { case (prev, ci) =>
          byCell.get(ci) match {
            case Some(rows) =>
              val m = prev.toArray.clone()
              rows.foreach(r => m(r.getInt(1)) = r.getLong(2).toDouble / S / r.getLong(3))
              m.toIndexedSeq
            case None => prev // empty cell: keep the old centroid
          }
        }
        iter += 1
      }
      centroids
    } finally { sample.unpersist(); () }
  }

  /** Deterministic bounded sample without a global sort: keep rows whose
    * seeded id-hash falls under a count-calibrated cutoff (expected hits
    * ≈ 1.1 × sampleSize), widening the cutoff (still deterministically)
    * if the hash under-delivers. The plan is scan + filter — nothing
    * rides to the driver, unlike TakeOrderedAndProject's
    * O(partitions × sampleSize) merge. Returned frame is persisted;
    * caller unpersists. Columns: id, v, __h. */
  private[graft] def thresholdSample(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      sampleSize: Int,
      minRows: Int,
      seed: Long): DataFrame = {
    val HashMod = 1L << 32
    val keyed = df
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("__h", pmod(xxhash64(col("id"), lit(seed)), lit(HashMod)))
    val total = keyed.count()
    def sampleAt(cutoff: Long) = keyed.filter(col("__h") < cutoff)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cutoff =
      if (total <= sampleSize) HashMod
      else math.min(HashMod,
        math.max(1L, (HashMod.toDouble * sampleSize * 1.1 / total).toLong))
    var sample = sampleAt(cutoff)
    val needed = math.max(minRows.toLong, math.min(total, sampleSize.toLong) / 2)
    while (sample.count() < needed && cutoff < HashMod) {
      sample.unpersist()
      cutoff = math.min(HashMod, cutoff * 2)
      sample = sampleAt(cutoff)
    }
    sample
  }

  /** TRUE IVF ANN: k-means-trained coarse quantizer (vs [[ivfTopK]]'s
    * training-free hyperplane cells). Corpus rows are assigned their
    * nearest centroid in the same scan that computes the sketch-free
    * cell id; each query probes its `nProbe` nearest centroids and ranks
    * exactly within the probed subset. On clustered real-world
    * embeddings the trained cells align with the data manifold, so the
    * same probe budget buys far more recall than data-blind cells. */
  def ivfKmeansTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4,
      numIters: Int = 3): DataFrame = {
    val centroids = trainCentroids(corpus, vecCol, idCol, dim, numCentroids, numIters)
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("cell",
        org.apache.spark.sql.graftshim.NearestCentroidsExpr(
          col("v").cast("array<double>"), centroids, 1)(0))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(
        org.apache.spark.sql.graftshim.NearestCentroidsExpr(
          col("qv").cast("array<double>"), centroids, nProbe)))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("__s", VF.cosine(col("v"), col("qv")))
    topKPerQuery(scored, k, "score")
  }

  /** Product-quantization ANN (Jégou et al. 2011): vectors are split
    * into `m` subspaces; each sub-vector is coded as the index of its
    * nearest codebook anchor (squared-L2, ties to the lowest index), so
    * a `dim`-float vector shrinks to `m` small codes — with the default
    * 64-dim/8-subspace split, 256 bytes of floats become 8 bytes, the
    * compression that lets a 100 TB vector corpus score in memory.
    * Queries score by asymmetric distance computation (ADC): the query
    * keeps full precision and accumulates `dot(q_sub, anchor(code))`
    * per subspace — one table lookup + an 8-dim dot product each, no
    * decode of the corpus vector.
    *
    * The codebook here is the `codebookSize` lowest-id vectors
    * (deterministic — the oracle replays the whole pipeline in SQL); a
    * production run would train per-subspace k-means codebooks with the
    * same [[trainCentroids]] machinery — encode/score plans are
    * identical. Scale shape: encoding is a projection; the scored join
    * broadcasts the queries against the CODES-ONLY corpus (the full
    * vectors never leave the encode scan); ranking is a per-query
    * window over candidates. */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      k: Int,
      m: Int = 8,
      codebookSize: Int = 16): DataFrame = {
    val codebook = pqCodebook(corpus, vecCol, idCol, codebookSize)
    val encoded = pqEncode(corpus, vecCol, idCol, dim, m, codebook)
    pqScore(encoded, queries, vecCol, idCol, dim, m, codebook, k)
  }

  /** The deterministic demo codebook: the `codebookSize` lowest-id
    * vectors (production: per-subspace k-means via [[trainCentroids]]). */
  def pqCodebook(corpus: DataFrame, vecCol: String, idCol: String,
      codebookSize: Int): Seq[Seq[Double]] =
    corpus.orderBy(col(idCol).asc).limit(codebookSize)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq

  private def pqAnchors(codebook: Seq[Seq[Double]], dim: Int, m: Int)
      : IndexedSeq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    (0 until m).map(s => codebook.map(v => v.slice(s * sub, (s + 1) * sub)))
  }

  /** Encode each vector to `m` codebook codes — one codegen'd
    * projection; only `(id, codes)` survives (the 32× shrink). */
  def pqEncode(corpus: DataFrame, vecCol: String, idCol: String,
      dim: Int, m: Int, codebook: Seq[Seq[Double]]): DataFrame = {
    val sub = dim / m
    val anchors = pqAnchors(codebook, dim, m)
    corpus
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("codes", array((0 until m).map(s =>
        org.apache.spark.sql.graftshim.NearestCentroidsExpr(
          slice(col("__v"), s * sub + 1, sub), anchors(s), 1)(0)): _*))
      .select(col("vec_id"), col("codes"))
  }

  /** ADC scoring of full-precision queries against a codes-only corpus
    * (in-flight or read back from a persisted index table). */
  def pqScore(encoded: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, dim: Int, m: Int, codebook: Seq[Seq[Double]],
      k: Int): DataFrame = {
    val sub = dim / m
    val anchors = pqAnchors(codebook, dim, m)
    val q = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("qv")))
    // ADC accumulated in fixed subspace order (deterministic float sum)
    val approx = (0 until m).map { s =>
      VF.dot(slice(col("qv"), s * sub + 1, sub),
        element_at(typedLit(anchors(s)), col("codes")(s) + 1))
    }.reduce(_ + _)
    val scored = encoded.join(q, col("vec_id") =!= col("q_id"))
      .withColumn("__s", approx)
    topKPerQuery(scored, k, "approx_dot")
  }

  /** Params map for [[PqEncodeTransform]] — the codebook rides INSIDE
    * the persisted plan (Double.toString round-trips exactly), so an MV
    * whose transform is the PQ encoder refreshes in any later session
    * with bit-identical codes. */
  def pqEncodeParams(vecCol: String, idCol: String, dim: Int, m: Int,
      codebook: Seq[Seq[Double]]): Map[String, String] = Map(
    "vecCol" -> vecCol, "idCol" -> idCol,
    "dim" -> dim.toString, "m" -> m.toString,
    "codebook" -> codebook.map(_.mkString(",")).mkString(";"))

  /** Symmetric per-vector int8 quantization of an embedding column —
    * the 4× memory shrink that makes a 100 TB vector corpus fit an ANN
    * serving tier. For each vector: scale = max|x| / 127, code_i =
    * floor(x_i/scale + 0.5) ∈ [-127, 127], plus the max absolute
    * reconstruction error as a quality audit column.
    *
    * Pure Column pipeline (higher-order array functions, codegen'd, no
    * UDF, no shuffle — a projection at any scale). `floor(x + 0.5)` is
    * used instead of `round` so the tie-break rule is bit-identical
    * across engines (round() is HALF_UP in Spark, HALF_EVEN in most SQL
    * engines). All-zero vectors quantize to scale 0 / codes 0. */
  def quantizeInt8(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val m = array_max(transform(col(vecCol), x => abs(x)))
      .cast("double").as("__m")
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"), m)
      .select(
        col(idCol),
        size(col("__v")).as("n_dims"),
        round(col("__m") / 127.0d, 6).as("scale"),
        when(col("__m") === 0d, lit(0L)).otherwise(
          array_max(transform(col("__v"),
            x => abs(floor(x / (col("__m") / 127.0d) + 0.5d))))
            .cast("long")).as("max_code"),
        when(col("__m") === 0d, lit(0d)).otherwise(
          round(array_max(transform(col("__v"), x =>
            abs(x - floor(x / (col("__m") / 127.0d) + 0.5d) *
              (col("__m") / 127.0d)))), 6)).as("max_abs_err"))
  }
}

/** FQCN-persistable PQ-encode transform for materialized views
  * (resolved by [[graft.views.TransformRegistry]]'s class loader — no
  * session-local registration needed): the embedding-index maintenance
  * shape of the reference's `notebooks/incremental_embedding_index.ipynb`.
  * An MV of a vector table with this transform IS a PQ code index that
  * [[MaterializedView.refresh]] maintains incrementally — each source
  * snapshot's CDC batch re-encodes ONLY its delta vectors. Params via
  * [[Similarity.pqEncodeParams]]. */
final class PqEncodeTransform extends graft.views.Transform {
  def apply(df: DataFrame, params: Map[String, String]): DataFrame = {
    val codebook: Seq[Seq[Double]] = params("codebook").split(";").toIndexedSeq
      .map(_.split(",").toIndexedSeq.map(_.toDouble))
    Similarity.pqEncode(df, params("vecCol"), params("idCol"),
      params("dim").toInt, params("m").toInt, codebook)
  }
}
