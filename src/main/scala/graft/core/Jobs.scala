package graft.core

import org.apache.spark.sql.{Column, DataFrame}

import graft.format.StorageStatistics

/** The reference's job-state surface (core/jobs.py:26-44): a mutation
  * job resolves to SUCCEEDED / FAILED / SKIPPED. */
sealed abstract class JobState
object JobState {
  case object Succeeded extends JobState
  case object Failed extends JobState
  case object Skipped extends JobState
}

/** Result of one mutation job (core/jobs.py:26-44): the terminal state,
  * the storage-statistics update the job committed (None unless
  * SUCCEEDED), the error message (None unless FAILED), and — beyond the
  * reference — the committed snapshot id. */
final case class JobResult(
    state: JobState,
    storageStatisticsUpdate: Option[StorageStatistics] = None,
    errorMessage: Option[String] = None,
    snapshotId: Option[Long] = None)

/** Result-typed mutation runner over a [[SpaceDataset]] — the
  * reference's runner contract (runners.py:100-122 `transactional`
  * decorator, runners.py:145-207 op surface), where every op returns a
  * [[JobResult]] instead of raising or handing back a bare snapshot id:
  * a failed job captures its error message, and a no-op job (an
  * `appendOnce` whose (appId, version) already committed, or a delete
  * matching nothing) reports SKIPPED. The underlying [[SpaceDataset]]
  * ops are unchanged; this wrapper only translates their outcome. */
final class JobRunner(val ds: SpaceDataset) {

  def append(df: DataFrame): JobResult = run(() => Some(ds.append(df)))

  def appendFrom(sources: Seq[() => DataFrame]): JobResult =
    run(() => Some(ds.appendFrom(sources)))

  /** SKIPPED when this (appId, version) was already committed. */
  def appendOnce(df: DataFrame, appId: String, version: Long): JobResult =
    run(() => ds.appendOnce(df, appId, version))

  def insert(df: DataFrame): JobResult = run(() => Some(ds.insert(df)))

  def upsert(df: DataFrame): JobResult = run(() => Some(ds.upsert(df)))

  def delete(cond: Column): JobResult = run(() => Some(ds.delete(cond)))

  def overwrite(df: DataFrame): JobResult = run(() => Some(ds.overwrite(df)))

  /** The op runs as usual; its outcome is classified AFTER the fact:
    * None / an unchanged head → SKIPPED, an exception → FAILED (with
    * the message, as the reference's transactional decorator records),
    * a new snapshot → SUCCEEDED with the cumulative-stats delta between
    * the head observed before the op and the committed snapshot. */
  private def run(op: () => Option[Long]): JobResult = {
    ds.storage.reload()
    val beforeId = ds.storage.metadata.currentSnapshotId
    val before = ds.storage.metadata.currentSnapshot.storageStatistics
    try op() match {
      case None => JobResult(JobState.Skipped)
      case Some(sid) if sid == beforeId => JobResult(JobState.Skipped, snapshotId = Some(sid))
      case Some(sid) =>
        ds.storage.reload()
        val after = ds.storage.snapshotOrFail(sid).storageStatistics
        JobResult(JobState.Succeeded, Some(after - before), None, Some(sid))
    } catch {
      case scala.util.control.NonFatal(e) =>
        JobResult(JobState.Failed, None, Some(e.toString))
    }
  }
}
