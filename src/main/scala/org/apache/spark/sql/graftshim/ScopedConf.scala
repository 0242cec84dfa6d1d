package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame

/** Run a plan under SESSION-SCOPED SQL conf overrides without mutating
  * the shared session: clone the session (same SparkContext, copied
  * SessionState + conf), apply the overrides to the clone, and rebind
  * the frame's logical plan onto it. Concurrent jobs on the original
  * session never observe the overrides — unlike a set/restore around
  * the action, which leaks the override to (and can clobber overrides
  * of) anything else planning in the same session during the window. */
object ScopedConf {

  /** Bound on cached clones ACROSS all parents and override sets. The
    * engine's callers use a handful of override sets per session
    * (advisory-partition sizes keyed by value), so 32 entries covers
    * steady state; under session churn (a server embedding the engine)
    * eviction is what lets a dropped parent session unload — the clone
    * strongly references its parent's SessionState, so any cache design
    * that never evicts pins every parent forever. (The previous
    * WeakHashMap keyed by parent had exactly that flaw: the VALUE
    * reached the KEY, so the weak key was never collectible —
    * VERDICT/ADVICE r10.) */
  private val MaxClones = 32

  /** (parent sessionUUID, overrides) → clone, LRU over [[MaxClones]].
    * Keyed by the parent's UUID string — never by the parent object —
    * so the cache itself holds no reference path to a parent except
    * through its live clones, and eviction severs that. The clone
    * snapshots the parent's conf/catalog state at FIRST use — later
    * parent conf changes don't propagate into it (callers key
    * value-bearing overrides into `confs`, so changing e.g. the
    * advisory byte size naturally selects a fresh clone). */
  private val clones =
    new java.util.LinkedHashMap[(String, Seq[(String, String)]),
        org.apache.spark.sql.classic.SparkSession](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Seq[(String, String)]),
            org.apache.spark.sql.classic.SparkSession]): Boolean =
        size() > MaxClones
    }

  /** Clears the whole cache when the SparkContext stops: a stopped
    * application's sessions (and their SessionStates) must not stay
    * pinned by cached clones. Registered once, on the first clone.
    * Embedders retiring individual SESSIONS (the context outlives them)
    * call [[invalidate]] deterministically instead — LRU churn is the
    * only other way a retired parent's clones unload. */
  final class CleanupListener
    extends org.apache.spark.scheduler.SparkListener {
    override def onApplicationEnd(
        e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = clearAll()
  }

  /** The applicationId the listener is currently registered on. A
    * per-JVM AtomicBoolean was not enough (ADVICE r12): after that
    * application ends, a NEW SparkContext in the same JVM would never
    * get a listener, so its clones would only unload by LRU churn.
    * Tracking the app id re-registers on every context change. */
  private val listenerAppId = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Drop every cached clone (the application-end hook). */
  def clearAll(): Unit = clones.synchronized(clones.clear())

  def withScopedConf[A](df: DataFrame, confs: Seq[(String, String)])(
      body: DataFrame => A): A = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val appId = classic.sparkContext.applicationId
    if (listenerAppId.getAndSet(appId) != appId)
      classic.sparkContext.addSparkListener(new CleanupListener)
    val key = (classic.sessionUUID, confs)
    val clone = clones.synchronized {
      val hit = clones.get(key)
      if (hit != null) hit
      else {
        val c = classic.cloneSession()
        confs.foreach { case (k, v) => c.conf.set(k, v) }
        clones.put(key, c)
        c
      }
    }
    body(org.apache.spark.sql.classic.Dataset.ofRows(clone, df.queryExecution.logical))
  }

  /** Session-level variant for flows that aren't a single DataFrame —
    * DDL, inserts, and SQL against a temp catalog. Clones the session,
    * applies the overrides to the CLONE, and runs `body` with it; the
    * parent's conf is never touched, so concurrent planners can't
    * observe the overrides or have their own clobbered (both failure
    * modes of the set/try/finally/restore template this replaces —
    * VERDICT r12/r13). Deliberately UNCACHED, unlike [[withScopedConf]]:
    * callers here carry per-invocation session state (a freshly
    * registered temp catalog), so a reused clone would see stale conf.
    * The clone shares the SparkContext; discarding it costs nothing. */
  def withSessionOverrides[A](
      spark: org.apache.spark.sql.SparkSession,
      confs: Seq[(String, String)])(
      body: org.apache.spark.sql.SparkSession => A): A = {
    val clone = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    confs.foreach { case (k, v) => clone.conf.set(k, v) }
    body(clone)
  }

  /** Drop every cached clone of `session` — for embedders that retire
    * sessions deterministically instead of waiting for LRU churn. */
  def invalidate(session: org.apache.spark.sql.SparkSession): Unit = {
    val uuid = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
    clones.synchronized {
      val it = clones.keySet().iterator()
      while (it.hasNext) if (it.next()._1 == uuid) it.remove()
    }
  }

  /** Current number of cached clones (bounded by [[MaxClones]]). */
  def cacheSize: Int = clones.synchronized(clones.size())
}
