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

  /** Cloned sessions cached per (parent session, overrides): a
    * streaming sink with a write-clustered table would otherwise build
    * a fresh SessionState every micro-batch. Weak keys let a parent
    * session (and its clones) unload with the app; the overrides are
    * applied once at clone time and the clone is never mutated after.
    * The clone snapshots the parent's conf at FIRST use — later parent
    * conf changes don't propagate into it (callers key value-bearing
    * overrides into `confs`, so changing e.g. the advisory byte size
    * naturally selects a fresh clone). */
  private val clones =
    new java.util.WeakHashMap[org.apache.spark.sql.classic.SparkSession,
      java.util.concurrent.ConcurrentHashMap[Seq[(String, String)],
        org.apache.spark.sql.classic.SparkSession]]()

  def withScopedConf[A](df: DataFrame, confs: Seq[(String, String)])(
      body: DataFrame => A): A = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val perSession = clones.synchronized {
      var m = clones.get(classic)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap()
        clones.put(classic, m)
      }
      m
    }
    val clone = perSession.computeIfAbsent(confs, { _ =>
      val c = classic.cloneSession()
      confs.foreach { case (k, v) => c.conf.set(k, v) }
      c
    })
    body(org.apache.spark.sql.classic.Dataset.ofRows(clone, df.queryExecution.logical))
  }
}
