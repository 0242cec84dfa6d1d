package graft

import org.apache.spark.sql.SparkSession

// temporary profiling harness (not part of the driver contract)
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    for (n <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      n match {
        case "x_grams" =>
          import org.apache.spark.sql.functions._
          graft.Tables.read(spark, sfDir, "documents")
            .select(col("source"), col("doc_id"),
              graft.functions.TextFunctions.wordShingleHashes(col("text"), 2).as("g"))
            .select(sum(size(col("g")))).collect()
        case "x_ngram_salt1" =>
          graft.operators.Dedup.ngramJaccardPairs(
            graft.Tables.read(spark, sfDir, "documents"),
            "text", "doc_id", "source", n = 2, threshold = 0.55, salts = 1).count()
        case _ =>
          SparkEntry.queries(n)(spark, sfDir).count()
      }
      println(s"[prof] $n run$i ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
