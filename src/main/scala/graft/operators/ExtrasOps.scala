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

  /** The "HuggingFace download" fixture: the documents table exported
    * once as 4 range-sharded parquet files — the HF hub serves every
    * dataset as parquet (notebooks/huggingface_conversion.ipynb), so
    * these stand in for the notebook's wget'd files. Building them is
    * the download step, not part of the measured conversion; cached
    * ACROSS JVMs ([[FixtureCache]]) so bench minima never include it. */
  private def hfShards(s: SparkSession, d: String): Seq[String] = {
    val dir = FixtureCache.dir("hf", d, "documents") { out =>
      Tables.read(s, d, "documents").repartitionByRange(4, col("doc_id"))
        .write.mode("overwrite").parquet(out.resolve("shards").toString)
    }
    new java.io.File(dir.resolve("shards").toString).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted.toSeq
  }

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

    // HuggingFace ⇄ graft conversion round-trip (reference notebooks/
    // huggingface_conversion.ipynb): the hub serves every dataset as
    // parquet, so conversion IN is append_parquet — ZERO-COPY footer
    // harvest, metadata-only (at 100 TB: one footer read per shard, no
    // data moved or rewritten). Then the notebook's manipulation step —
    // a PK-pruned CoW delete (only the shard holding the keys is
    // rewritten; the other downloaded files stay referenced in place)
    // and a version tag — and conversion OUT: hand
    // indexFiles(version=tag) to a RAW parquet read, the
    // load_dataset("parquet", data_files=...) analog with no engine on
    // the read path (CoW snapshots are complete at rest). A post-tag
    // append proves the export is pinned, not head-coupled.
    "s_load_hf" -> ((s, d) => {
      val docs = Tables.read(s, d, "documents")
      val ds = SpaceDataset.create(s, fresh("hf") + "/tbl", docs.schema, Seq("doc_id"))
      ParquetLoader.loadParquet(s, ds, hfShards(s, d))
      ds.delete(col("doc_id").between(10L, 19L))
      ds.addTag("after_delete")
      ds.append(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 9000000L))
      // explicit id-stripped schema: the export mixes engine-written
      // survivor files (field ids in footers) with untouched downloads
      // (none) — schema INFERENCE could pick the id-carrying footer and
      // then refuse the id-less files
      s.read.schema(graft.format.FieldIds.strip(docs.schema))
        .parquet(ds.indexFiles(version = Some("after_delete")): _*)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    }),

    // zero-copy ingest of EXTERNAL record files: payload parquet stays
    // where it is; index columns derived from the payloads by expression
    // (array_record.py:36-109 analog), addresses point at the external
    // files, manifests footer-only
    "s_load_records" -> ((s, d) => {
      val docs = Tables.read(s, d, "documents")
      // fabricate the pre-existing record files: plain parquet with one
      // binary `value` column holding the full serialized record
      val extDir = fresh("extrec")
      docs.select(encode(concat_ws("\u0001",
          col("doc_id"), col("source"), col("text")), "UTF-8").as("value"))
        .repartition(4).write.mode("overwrite").parquet(extDir)
      val extFiles = new java.io.File(extDir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).sorted.toSeq

      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType)))
      val ds = SpaceDataset.create(s, fresh("ldrec") + "/tbl", schema,
        Seq("doc_id"), Seq("payload"))
      RecordLoader.loadRecordParquet(s, ds, "payload", extFiles, Map(
        "doc_id" -> expr("CAST(split(decode(value, 'UTF-8'), '\u0001', 3)[0] AS BIGINT)"),
        "source" -> expr("split(decode(value, 'UTF-8'), '\u0001', 3)[1]")))
      ds.readAll().select(col("doc_id"), col("source"),
        expr("split(decode(payload, 'UTF-8'), '\u0001', 3)[2]").as("text"))
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
    }),

    // DSv2 TableCatalog: CREATE/INSERT/SELECT through `spark.sql` on
    // `graft_cat.<table>` — catalog resolution, transactional write, and
    // manifest-pruned DSv2 scan all inside Spark's own SQL planner
    "s_sql_catalog" -> ((s, d) => {
      s.conf.set("spark.sql.catalog.graft_cat",
        classOf[org.apache.spark.sql.graftshim.GraftCatalog].getName)
      // fresh location per run (like every sibling query): a fixed
      // shared path races concurrent Verify/Bench sessions on
      // DROP+CREATE and reads half-written state
      s.conf.set("spark.sql.catalog.graft_cat.location",
        java.nio.file.Files.createTempDirectory("graft_cat_sql_").toString)
      val orders = Tables.read(s, d, "orders")
      s.sql("DROP TABLE IF EXISTS graft_cat.orders_sql")
      s.sql("CREATE TABLE graft_cat.orders_sql (" +
        orders.schema.fields.map(f => s"${f.name} ${f.dataType.sql}").mkString(", ") +
        ") TBLPROPERTIES ('primary_keys'='o_orderkey')")
      orders.createOrReplaceTempView("graft_cat_src_orders")
      s.sql("INSERT INTO graft_cat.orders_sql SELECT * FROM graft_cat_src_orders")
      s.sql(
        """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
          |FROM graft_cat.orders_sql WHERE o_orderkey <= 30000
          |GROUP BY o_orderstatus""".stripMargin)
    }))

  val oracleSql: Map[String, String] = Map(
    "s_catalog" -> "SELECT * FROM region",
    "s_load_parquet" -> "SELECT * FROM lineitem WHERE l_orderkey <= 100",
    // the tagged export = the corpus minus the deleted key range; the
    // post-tag append must not appear
    "s_load_hf" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE doc_id NOT BETWEEN 10 AND 19""".stripMargin,
    "s_load_records" -> "SELECT doc_id, source, text FROM documents",
    "s_sql" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "s_sql_catalog" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey <= 30000
        |GROUP BY o_orderstatus""".stripMargin)
}
