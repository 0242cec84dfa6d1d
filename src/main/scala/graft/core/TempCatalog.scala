package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway per-query SQL catalog lifecycle, shared by every operator
  * that drives the graft DSv2 surface (`CREATE TABLE`/`CALL`/`MERGE`)
  * inside a benchmarked query. The invariants live here in one place:
  *
  *  - the catalog name is randomized so repeated runs never collide in
  *    session conf, and BOTH conf keys are unset in a finally (a leaked
  *    registration accumulates across benchmarked queries);
  *  - any DataFrame the caller returns must not lazily resolve the
  *    catalog after unregistration — eager `spark.sql` analysis binds
  *    the table, but results of streaming writes or plan-asserted joins
  *    must be [[decouple]]d first.
  */
object TempCatalog {

  /** Register a GraftCatalog named `<prefix><8 hex>` rooted at `root`,
    * run `f(catalogName)`, always unregister. */
  def withTempCatalog[T](s: SparkSession, root: String, prefix: String)(
      f: String => T): T = {
    val cat = prefix + java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.location", root)
    try f(cat)
    finally {
      s.conf.unset(s"spark.sql.catalog.$cat")
      s.conf.unset(s"spark.sql.catalog.$cat.location")
    }
  }

  /** Detach a catalog-backed result from the catalog about to be
    * unregistered: executor-parallel parquet round-trip, NOT `persist()`
    * — a cache here would pin the rows in executor memory for every
    * later benchmarked query. */
  def decouple(s: SparkSession, df: DataFrame): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_tmpcat_out").toString
    df.write.mode("overwrite").parquet(out)
    s.read.parquet(out)
  }
}
