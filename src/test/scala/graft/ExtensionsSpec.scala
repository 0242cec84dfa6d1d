package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: every graft function must be callable from plain
  * SQL with results identical to the DataFrame API. The suite registers
  * via [[GraftExtensions.registerAll]] — the `spark.sql.extensions`
  * builder path runs the SAME (name, arity, builder) list, but a static
  * conf only applies at SparkContext construction, which a shared test
  * JVM cannot redo. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  GraftExtensions.registerAll(spark)

  private def docs() = {
    val df = Tables.read(spark, sfDir, "documents")
    df.createOrReplaceTempView("docs_ext")
    df
  }

  test("text functions are callable from SQL and match the DataFrame API") {
    import org.apache.spark.sql.functions._
    val df = docs()
    val sql = spark.sql(
      """SELECT doc_id,
        |  graft_token_count(text) AS tc,
        |  graft_quality_score(text) AS q,
        |  graft_fingerprint(text) AS fp,
        |  graft_lang_id(text) AS lang,
        |  graft_simhash64(graft_tokens(text)) AS sh
        |FROM docs_ext""".stripMargin)
    val api = df.select(col("doc_id"),
      functions.TextFunctions.tokenCount(col("text")).as("tc"),
      functions.TextFunctions.qualityScore(col("text")).as("q"),
      functions.TextFunctions.fingerprint(col("text")).as("fp"),
      functions.LangId.langId(col("text")).as("lang"),
      functions.TextFunctions.simhash64(
        functions.TextFunctions.tokens(col("text"))).as("sh"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("shingle/minhash/jaccard pipeline runs end-to-end in SQL") {
    docs()
    val r = spark.sql(
      """SELECT avg(graft_jaccard_sorted(g, g)) AS self_j,
        |       count(DISTINCT graft_minhash(g, 16)) AS sigs
        |FROM (SELECT graft_word_shingle_hashes(text, 2) AS g FROM docs_ext)
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0) // self-Jaccard is exactly 1
    assert(r.getLong(1) > 1)
  }

  test("vector cosine and hamming agree with the DataFrame API") {
    import org.apache.spark.sql.functions._
    val emb = Tables.read(spark, sfDir, "embeddings")
    emb.createOrReplaceTempView("emb_ext")
    val sql = spark.sql(
      "SELECT round(avg(graft_cosine(embedding, embedding)), 6) AS c FROM emb_ext")
      .collect()(0).getDouble(0)
    assert(sql == 1.0)
  }

  test("graft_mix_bucket and graft_dot match the DataFrame API from SQL") {
    import org.apache.spark.sql.functions._
    docs()
    Tables.read(spark, sfDir, "embeddings").createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_mix_bucket(doc_id, 1000) AS b FROM docs_ext")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.operators.Curation.mixBucket(col("doc_id"), 1000).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
    // self dot = squared norm > 0 for non-zero vectors
    val d = spark.sql(
      "SELECT min(graft_dot(embedding, embedding)) AS d FROM emb_ext")
      .collect()(0).getDouble(0)
    assert(d > 0.0)
    // arbitrary int64 keys are safe (the SQL surface folds before the
    // multiply — the raw kernel would overflow under ANSI)
    val big = spark.sql(
      "SELECT graft_mix_bucket(9223372036854775807, 1000) AS b")
      .collect()(0).getLong(0)
    assert(big >= 0 && big < 1000)
    val zero = intercept[Exception](
      spark.sql("SELECT graft_mix_bucket(1, 0)").collect())
    assert(zero.getMessage.contains("positive"), zero.getMessage)
  }

  test("literal-arg validation and arity errors are user-readable") {
    docs()
    val e = intercept[Exception](
      spark.sql("SELECT graft_token_count(text, 2) FROM docs_ext").collect())
    assert(e.getMessage.contains("1 argument"))
  }

  test("degenerate literal args fail fast at analysis, not per-row") {
    docs()
    val e = intercept[Exception](
      spark.sql("SELECT graft_word_shingle_hashes(text, 0) FROM docs_ext").collect())
    assert(e.getMessage.contains(">= 1"), e.getMessage)
  }

  test("unsorted jaccardSorted inputs and mismatched vectors fail loudly") {
    import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // out-of-order arrays would silently UNDERCOUNT the intersection —
    // they must throw instead
    val bad = Seq((Array(3L, 1L, 2L), Array(1L, 2L, 3L, 4L, 5L))).toDF("a", "b")
    val e1 = intercept[Exception](
      bad.select(TF.jaccardSorted(col("a"), col("b"))).collect())
    assert(e1.getMessage.contains("not sorted"), e1.getMessage)
    // sorted inputs unaffected
    val ok = Seq((Array(1L, 2L, 3L), Array(2L, 3L, 4L))).toDF("a", "b")
    assert(ok.select(TF.jaccardSorted(col("a"), col("b")))
      .collect()(0).getDouble(0) == 0.5)
    // a truncated embedding must error, not NULL out of a >= filter
    val vecs = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val e2 = intercept[Exception](
      vecs.select(VF.cosine(col("a"), col("b"))).collect())
    assert(e2.getMessage.contains("length mismatch"), e2.getMessage)
  }
}
