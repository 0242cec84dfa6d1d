package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SpaceDataset

/** Key-pruned ("dynamic file pruning") joins against a graft fact
  * table.
  *
  * Spark's own dynamic partition pruning reaches only Hive-style
  * partition columns; a graft table's layout is files + manifest stats
  * + optional buckets + embedded parquet blooms. For a selective dim
  * side, collecting its distinct join keys and planning the fact scan
  * with the exact IN predicate lets ALL THREE metadata layers drop
  * fact files before any task is scheduled: falsifiable-IN manifest
  * pruning on a key-clustered layout, bucket hashing on a bucketed
  * one, and file-level blooms ([[graft.core.BloomPruning]]) on a
  * layout DECORRELATED from the key. At 100 TB this is the difference
  * between scanning the fact table and scanning the handful of files
  * that can possibly match.
  *
  * Inner-join only: dropping fact rows outside the dim key set is
  * semantics-preserving exactly because an inner join discards them
  * anyway (and NULL keys never equi-match). A dim side that is not
  * point-shaped (more than `maxKeys` distinct keys) falls back to a
  * plain join planned by Catalyst/AQE — correctness never depends on
  * the prune firing.
  */
object PrunedJoin {

  /** Join by NAME through subquery aliases, never by `df(col)` handles:
    * a graft relation can be re-instantiated between the handle's
    * resolution and the join's analysis (fresh expression ids), which
    * makes attribute-handle conditions fail analysis with
    * MISSING_ATTRIBUTES. Qualified name resolution is immune. */
  private def joinOnKey(
      factDf: DataFrame, factKey: String,
      dimDf: DataFrame, dimKey: String): DataFrame = {
    val cond: Column = col(s"__pj_f.`$factKey`") === col(s"__pj_d.`$dimKey`")
    factDf.alias("__pj_f").join(dimDf.alias("__pj_d"), cond)
  }

  /** Inner equi-join of `fact` (graft table) with `dim` on
    * `factKey == dimKey`. The dim side should be broadcast-small when
    * point-shaped (it is broadcast in the pruned path); the fallback
    * path leaves strategy to AQE. */
  def inner(
      spark: SparkSession,
      fact: SpaceDataset,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      maxKeys: Int = 4096): DataFrame = {
    // No persist across probe and join: the returned DataFrame outlives
    // this call, so a persist here could only be released by the caller
    // (or leak in the session CacheManager — cached plans are not
    // GC-reclaimed). The dim evaluates at most twice — once for the
    // limit-bounded key probe, once as the broadcast build — and a dim
    // worth pruning with is small by contract.
    //
    // A NON-DETERMINISTIC dim (sample(), rand-derived keys, unordered
    // limit) must NOT re-evaluate between the probe and the build: the
    // fact scan would be pruned by keys from evaluation 1 while the
    // broadcast holds rows from evaluation 2 — silently dropped matches
    // (ADVICE r10). localCheckpoint pins ONE evaluation executor-side;
    // the checkpointed blocks are reclaimed with the frame by the
    // ContextCleaner, so nothing needs a caller-side release.
    val dimSafe =
      if (dim.queryExecution.analyzed.deterministic) dim
      else dim.localCheckpoint()
    // limit(n+1) short-circuits: a non-selective dim pays one cheap
    // partial scan of its distinct keys, never a full collect
    val keys = dimSafe.select(col(dimKey)).filter(col(dimKey).isNotNull)
      .distinct().limit(maxKeys + 1).collect().map(_.get(0)).toSeq
    if (keys.isEmpty) {
      // no joinable dim keys -> empty inner join, zero fact IO
      joinOnKey(fact.readAll().filter(lit(false)), factKey, dimSafe, dimKey)
    } else if (keys.size > maxKeys) {
      joinOnKey(fact.readAll(), factKey, dimSafe, dimKey)
    } else {
      val factDf = fact.read(filter = Some(col(factKey).isInCollection(keys)))
      joinOnKey(factDf, factKey, broadcast(dimSafe), dimKey)
    }
  }
}
