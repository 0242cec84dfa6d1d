package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("every multimodal query runs, returns rows, and has an oracle") {
    assert(Multimodal.oracleSql.keySet == Multimodal.queries.keySet)
    Multimodal.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("resize plan fits within 256, never upscales, keeps aspect") {
    val out = Multimodal.queries("m_resize")(spark, sfDir).cache()
    try {
      assert(out.filter(col("out_w") > 256 || col("out_h") > 256).count() == 0)
      assert(out.filter(col("out_w") < 1 || col("out_h") < 1).count() == 0)
      assert(out.filter(col("out_w") > col("width") ||
        col("out_h") > col("height")).count() == 0, "upscaled an image")
      // images already within bounds pass through untouched
      assert(out.filter(greatest(col("width"), col("height")) <= 256 &&
        (col("out_w") =!= col("width") || col("out_h") =!= col("height")))
        .count() == 0)
      // both branches are exercised by the corpus
      assert(out.filter(greatest(col("width"), col("height")) > 256).count() > 0)
      assert(out.filter(greatest(col("width"), col("height")) <= 256).count() > 0)
      // aspect preserved within integer-floor tolerance: flooring costs
      // at most one pixel on each output side, so the relative ratio
      // drift is bounded by ~1/min(out_w, out_h)
      val skewed = out
        .filter(greatest(col("width"), col("height")) > 256)
        .withColumn("r_in", col("width").cast("double") / col("height"))
        .withColumn("r_out", col("out_w").cast("double") / col("out_h"))
        .filter(abs(col("r_in") - col("r_out")) / col("r_in") >
          lit(1.2) / least(col("out_w"), col("out_h")))
      assert(skewed.count() == 0, "aspect ratio drifted past floor tolerance")
    } finally { out.unpersist(); () }
  }

  test("corpus is ASCII — the oracle's chars==bytes precondition holds") {
    // every m_* oracle equates DuckDB length(text) (chars) with Spark
    // octet_length (bytes); a non-ASCII doc would silently skew them
    val docs = Tables.read(spark, sfDir, "documents")
    assert(docs.filter(
      octet_length(col("text")) =!= length(col("text"))).count() == 0,
      "non-ASCII text in the documents fixture breaks m_* oracles")
  }

  test("null ids/payloads are skipped, not crashed on; bad args rejected") {
    import TestSpark.spark.implicits._
    import graft.operators.Multimodal
    val df = Seq((Some(1L), Some("abc")), (Some(2L), None),
      (None: Option[Long], Some("xyz")))
      .toDF("doc_id", "txt")
      .select(col("doc_id"), encode(col("txt"), "UTF-8").as("payload"))
    // WebDataset samples legitimately miss extensions → null payloads
    val meta = Multimodal.decodeMeta(df, "doc_id", "payload").collect()
    assert(meta.length == 1 && meta(0).getLong(0) == 1L,
      s"null rows must be skipped: ${meta.mkString(";")}")
    intercept[IllegalArgumentException] {
      Multimodal.chunkPayload(df, "doc_id", "payload", chunkBytes = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(df, "doc_id", "payload", step = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeMeta(df, "doc_id", "payload", batchSize = 0)
    }
  }
}
