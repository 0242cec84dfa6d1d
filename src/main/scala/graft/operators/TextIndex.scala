package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Inverted text index over a document table, persisted as a graft
  * table and maintained INCREMENTALLY as a materialized view (the
  * postings transform is an EXPAND MapNode — one document row becomes
  * one posting per distinct term — and source deletes sweep derived
  * rows through `DmlOps.deleteByKeysOn`).
  *
  * The 100 TB shape this buys: BM25 keyword search stops being a corpus
  * scan. [[Semantics.bm25]] pays one pass over every document per query
  * set; with the postings table range-clustered on `term`, a query
  * reads ONLY its terms' posting files (manifest-pruned point read —
  * the same pattern as the minhash ingest-dedup index), per-term
  * document frequencies fall out of the fetched postings themselves,
  * and the corpus-wide scalars (N, avgdl) come from an
  * incrementally-maintained [[graft.views.AggregateView]] — O(groups)
  * rows, never a rescan. New documents cost one delta refresh
  * (postings of the CDC add-batch only); deleted documents drop their
  * postings by source key.
  *
  * Reference scope note: the reference stops at storage + row-wise
  * transforms (SURVEY.md §2.9 extension scope); this composes its MV
  * machinery (views.py:247-323 analog) with the extension operators.
  */
object TextIndex {

  /** `(idCol, term, tf, dl)` posting rows for a batch of documents.
    * tf (term frequency) and dl (document length) are exact per
    * document, so a batch computes its own postings independently of
    * the rest of the corpus — an MV refresh over a CDC add-batch is
    * delta-correct by construction. Row-local explode + per-doc
    * aggregate: no corpus-wide state, shuffles only (doc × distinct
    * term) rows. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol), TF.tokenCount(col(textCol)).as("dl"),
        explode(TF.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** BM25 scores from posting rows ALREADY FILTERED to the query terms
    * (`(idCol, term, tf, dl)` — the output of a term point read against
    * the postings table). A term's fetched postings are exactly its
    * document list, so per-term document frequency is a tiny aggregate
    * over the fetched rows; the corpus-wide scalars arrive as
    * parameters from maintained stats. Output and arithmetic are
    * IDENTICAL to [[Semantics.bm25]] — this IS its scoring tail, kept
    * in one place so the formula cannot diverge from the shared DuckDB
    * oracle. */
  def bm25FromPostings(tf: DataFrame, idCol: String, nDocs: Long, avgdl: Double): DataFrame = {
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val w = idf * (col("tf") * lit(Semantics.K1 + 1)) /
      (col("tf") + lit(Semantics.K1) *
        (lit(1 - Semantics.B) + lit(Semantics.B) * col("dl") / lit(avgdl)))
    tf.join(broadcast(dfreq), Seq("term"))
      .groupBy(col(idCol))
      .agg(round(sum(w), 4).as("bm25"), count(lit(1)).as("n_terms"))
  }
}

/** FQCN-persistable postings transform — the MV plan node that turns a
  * document batch into inverted-index rows (EXPAND: one doc → one row
  * per distinct term). Params: `textCol`, `idCol`. Stateless; the
  * persisted plan replays it on any CDC add-batch. */
final class TokenPostingsTransform extends graft.views.Transform {
  def apply(df: DataFrame, params: Map[String, String]): DataFrame =
    TextIndex.postings(df, params("textCol"), params("idCol"))
}
