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
    * (score desc, id asc). */
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
    // rank on the RAW score (rounded ties would reorder vs an oracle)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("__s").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), round(col("__s"), 4).as("score"), col("rank"))
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
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("__s").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), round(col("__s"), 4).as("score"), col("rank"))
  }
}
