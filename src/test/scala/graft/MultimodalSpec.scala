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
}
