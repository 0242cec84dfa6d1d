package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Stream-shaped processing over the events table.
  *
  * The reference has NO event-stream layer (its incrementality is
  * snapshot-diff CDC, SURVEY.md §2.5); these operators are the
  * Spark-native extension: Structured Streaming for windowed
  * aggregation, and typed `groupByKey` sessionization for custom state
  * logic (the batch shape of `flatMapGroupsWithState`).
  */
object EventsStream {

  /** events.ts is TIMESTAMP(NANOS) parquet → read as long nanos. */
  private def eventsRaw(s: SparkSession, d: String): (StructType, String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$d/events.parquet"
    (s.read.parquet(path).schema, path)
  }

  /** Tumbling-window aggregation executed by the REAL streaming engine:
    * file-source stream → watermark → window agg → memory sink, driven
    * to completion synchronously. Returns the final result table. */
  def windowedAgg(s: SparkSession, d: String, windowSec: Int = 600): DataFrame = {
    val (schema, path) = eventsRaw(s, d)
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // the streaming file source requires a DIRECTORY; select just the
    // events file out of the scale-factor dir via pathGlobFilter
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .withColumn("event_time", timestamp_seconds(expr("ts div 1000000000")))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), s"$windowSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
      .select(unix_timestamp(col("window.start")).as("w_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Gap-based sessionization via the typed API: per-user event streams
    * folded into sessions when gaps exceed `gapSec`. The imperative
    * per-group walk is what `flatMapGroupsWithState` runs in streaming;
    * here it runs over a bounded group iterator (sorted in memory — at
    * 100 TB swap in a secondary sort / sortWithinPartitions first). */
  def sessionize(s: SparkSession, d: String, gapSec: Long = 1800): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = Tables.read(s, d, "events")
      .select(col("user_id"), expr("ts div 1000000000").as("t"))
      .as[(Long, Long)]
    events.groupByKey(_._1).mapGroups { (uid, it) =>
      val ts = it.map(_._2).toArray.sorted
      var nSessions = 0
      var maxLen = 0
      var curLen = 0
      var prev = Long.MinValue
      ts.foreach { t =>
        if (prev == Long.MinValue || t - prev > gapSec) { nSessions += 1; curLen = 0 }
        curLen += 1
        if (curLen > maxLen) maxLen = curLen
        prev = t
      }
      (uid, nSessions, maxLen)
    }.toDF("user_id", "n_sessions", "max_session_events")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_stream_window" -> ((s, d) => windowedAgg(s, d)),
    "e_sessionize" -> ((s, d) => sessionize(s, d)))

  val oracleSql: Map[String, String] = Map(
    "e_stream_window" ->
      """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS w_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "e_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
        |flags AS (
        |  SELECT user_id, t,
        |    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |g AS (
        |  SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flags),
        |per_session AS (
        |  SELECT user_id, sess_id, count(*) AS cnt FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS INT) AS n_sessions,
        |  CAST(max(cnt) AS INT) AS max_session_events
        |FROM per_session GROUP BY user_id""".stripMargin)
}
