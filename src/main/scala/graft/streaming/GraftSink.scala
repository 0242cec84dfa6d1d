package graft.streaming

import org.apache.spark.sql.{Dataset, Row}

import graft.core.SpaceDataset

/** Exactly-once streaming sinks into graft tables, as `foreachBatch`
  * bodies (the scale-safe sink shape — each micro-batch is one
  * distributed write + one commit, nothing collects on the driver):
  *
  * {{{
  *   stream.writeStream
  *     .option("checkpointLocation", ckpt)
  *     .foreachBatch(GraftSink.append(table, appId = "events-ingest"))
  *     .start()
  * }}}
  *
  * `append` is idempotent across restarts: the commit records
  * `appId → batchId` ([[SpaceDataset.appendOnce]]), so the batch the
  * engine redelivers after a failure (its at-least-once contract)
  * commits exactly once. `upsert` is idempotent by keys instead — same
  * batch replayed lands on the same primary keys.
  */
object GraftSink {

  /** Append-mode sink body, exactly-once via `appId` + batch id. */
  def append(ds: SpaceDataset, appId: String): (Dataset[Row], Long) => Unit =
    (batch, batchId) => {
      val b = batch.persist()
      try { if (!b.isEmpty) { ds.appendOnce(b.toDF(), appId, batchId); () } }
      finally { b.unpersist(); () }
    }

  /** Upsert-mode sink body (update semantics by primary key); replays
    * are naturally idempotent because the same keys re-land. */
  def upsert(ds: SpaceDataset): (Dataset[Row], Long) => Unit =
    (batch, _) => {
      val b = batch.persist()
      try { if (!b.isEmpty) { ds.upsert(b.toDF()); () } }
      finally { b.unpersist(); () }
    }
}
