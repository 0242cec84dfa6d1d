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

  def withScopedConf[A](df: DataFrame, confs: Seq[(String, String)])(
      body: DataFrame => A): A = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val clone = classic.cloneSession()
    confs.foreach { case (k, v) => clone.conf.set(k, v) }
    body(org.apache.spark.sql.classic.Dataset.ofRows(clone, df.queryExecution.logical))
  }
}
