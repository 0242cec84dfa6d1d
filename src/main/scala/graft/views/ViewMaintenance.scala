package graft.views

import org.apache.spark.sql.SparkSession

import graft.core.{ManifestIO, SpaceDataset}

/** Self-maintenance shared by the refreshable views.
  *
  * Every refresh commits one state snapshot per source snapshot, and
  * each commit mints at least one small state file — a view refreshed
  * every minute accrues ~1.4k files/day, and the state table's own
  * read path (the next refresh's delta joins included) degrades with
  * the file count. Rather than making the operator schedule `compact`
  * on every view table, refresh COMPACTS ITS OWN STATE when the file
  * count crosses a threshold. The compaction is CDC-silent, so views
  * chained on this view's state table see nothing. */
object ViewMaintenance {

  /** State-file count that triggers a post-refresh bin-pack; `0`
    * disables auto-compaction. */
  val AutoCompactFilesKey = "spark.graft.mv.autoCompactFiles"
  val DefaultAutoCompactFiles = 128L

  /** Output sizing for the auto-compact (`CompactOp.compact`'s
    * `targetFileRows`): capped so a LARGE state table (a join view
    * over a fact table) bin-packs its trickle files into bounded
    * outputs instead of one giant file, while backbone files above
    * half the target are left alone (incremental shape). */
  val CompactTargetRowsKey = "spark.graft.mv.compactTargetRows"
  val DefaultCompactTargetRows = 4L * 1000 * 1000

  private def longConf(spark: SparkSession, key: String, dflt: Long): Long =
    spark.conf.getOption(key).map { raw =>
      val v = try raw.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be a non-negative integer, got '$raw'")
      }
      require(v >= 0, s"$key must be a non-negative integer, got '$raw'")
      v
    }.getOrElse(dflt)

  /** Bin-pack the view's state table if its O(1) file count (manifest
    * summaries) reached the threshold. Returns true when a compaction
    * committed. Never fails the refresh that called it: a concurrent
    * writer racing the compact aborts IT, not the refresh — the next
    * refresh simply retries. */
  def maybeCompactState(spark: SparkSession, dataset: SpaceDataset): Boolean = {
    val threshold = longConf(spark, AutoCompactFilesKey, DefaultAutoCompactFiles)
    if (threshold <= 0) return false
    val storage = dataset.storage
    val snap = storage.metadata.currentSnapshot
    val files = ManifestIO.summarizedFileCount(
      storage, snap.manifestFiles.indexManifestFiles)
    if (!files.exists(_ >= threshold)) return false
    val target = math.max(1L, math.min(
      longConf(spark, CompactTargetRowsKey, DefaultCompactTargetRows),
      snap.storageStatistics.numRows))
    try dataset.compact(targetFileRows = target).isDefined
    catch {
      // first-committer-wins: someone else is mutating the state table
      // (an overlapping refresher, an operator compact) — theirs lands,
      // ours retries on the next refresh
      case _: graft.core.ConcurrentCommitException => false
    }
  }
}
