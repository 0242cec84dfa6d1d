package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core._

/** Catalog, zero-copy ingest, and SQL-facade coverage. */
object ExtrasOps {

  private def fresh(prefix: String): String =
    Files.createTempDirectory(s"graft_$prefix").toString

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // directory catalog: name → location resolution round-trip
    "s_catalog" -> ((s, d) => {
      val cat = new DirCatalog(s, fresh("cat"))
      val region = Tables.read(s, d, "region")
      cat.createDataset("region", region.schema, Seq("r_regionkey")).append(region)
      val nation = Tables.read(s, d, "nation")
      cat.createDataset("nation", nation.schema, Seq("n_nationkey")).append(nation)
      require(cat.datasets() == Seq("nation", "region"), cat.datasets().toString)
      cat.dataset("region").readAll()
    }),

    // zero-copy ingest: manifest built from the EXTERNAL file's footers,
    // no data copied; filter still pushes down + uses footer stats
    "s_load_parquet" -> ((s, d) => {
      val li = Tables.read(s, d, "lineitem")
      val ds = SpaceDataset.create(s, fresh("zc") + "/tbl", li.schema,
        Seq("l_orderkey", "l_linenumber"))
      ParquetLoader.loadParquet(s, ds, Seq(s"$d/lineitem.parquet"))
      ds.read(filter = Some(col("l_orderkey") <= 100L))
    }),

    // SQL over graft tables: read() registers as temp views, the whole
    // Spark SQL surface applies (SURVEY.md §2.9 obligation (b))
    "s_sql" -> ((s, d) => {
      val o = Tables.read(s, d, "orders")
      val c = Tables.read(s, d, "customer")
      val ods = SpaceDataset.create(s, fresh("sqlo") + "/tbl", o.schema, Seq("o_orderkey"))
      ods.append(o)
      val cds = SpaceDataset.create(s, fresh("sqlc") + "/tbl", c.schema, Seq("c_custkey"))
      cds.append(c)
      ods.readAll().createOrReplaceTempView("graft_orders")
      cds.readAll().createOrReplaceTempView("graft_customer")
      s.sql(
        """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM graft_orders JOIN graft_customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment""".stripMargin)
    }))

  val oracleSql: Map[String, String] = Map(
    "s_catalog" -> "SELECT * FROM region",
    "s_load_parquet" -> "SELECT * FROM lineitem WHERE l_orderkey <= 100",
    "s_sql" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
}
