package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval (range) join: points matched to every range
  * `[start, end)` that contains them, with NO equi-key between the two
  * sides — the IP-to-geo / event-to-maintenance-window lookup shape.
  *
  * Spark has no native interval-join strategy: a raw
  * `points JOIN ranges ON p >= start AND p < end` plans as
  * BroadcastNestedLoopJoin (O(|points|·|ranges|) comparisons — a
  * scale-killer the moment the ranges side outgrows a broadcast).
  * This operator makes the join an EQUI-join Catalyst can shuffle or
  * broadcast like any other:
  *
  *   - each point gets one bucket key `p div w`;
  *   - each range explodes to the buckets its span covers
  *     (`ceil(len/w)` keys — bounded replication, pick `w` near the
  *     typical span so it stays O(1) per range);
  *   - equi-join on the bucket key + residual containment filter.
  *
  * A qualifying pair meets in EXACTLY one bucket (the point's), so no
  * dedup pass is needed. At 100 TB both sides shuffle by the 8-byte
  * bucket key (or the exploded ranges side broadcasts when small);
  * hot buckets are ordinary join skew — AQE's skew-join split applies,
  * unlike the nested-loop plan, which no optimizer can rescue.
  */
object RangeJoin {

  /** `points` × `ranges` where `pointCol ∈ [startCol, endCol)`.
    * All three columns must be integral (epoch seconds, addresses, …);
    * `bucketWidth` trades replication (`~span/width` copies per range)
    * against residual-filter selectivity within a bucket.
    * `maxBucketsPerRange` is the loud-failure backstop against runaway
    * replication: a single range spanning more buckets than this (a
    * bucketWidth orders of magnitude below the real spans, or a corrupt
    * `endCol`) raises at runtime instead of silently exploding one row
    * into millions of shuffle keys. */
  def rangeJoin(
      points: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxBucketsPerRange: Long = 16384L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerRange > 0, "maxBucketsPerRange must be positive")
    val p = points.withColumn("__bkt", expr(s"`$pointCol` div $bucketWidth"))
    // Empty/inverted ranges ([start, end) with end <= start) match
    // nothing — drop them BEFORE the explode: sequence(a, b) with b < a
    // generates a DESCENDING sequence, so one corrupt row could fan out
    // to millions of bucket keys that the residual filter then discards.
    // (Correctness for well-formed ranges, including negative domains,
    // rests only on `div` being monotone: start <= p < end implies the
    // point's bucket lies within the range's covered-bucket interval.)
    val startBkt = expr(s"`$startCol` div $bucketWidth")
    val endBkt = expr(s"(`$endCol` - 1) div $bucketWidth")
    // the guard rides INSIDE sequence's upper bound so column pruning
    // can never eliminate it. endBkt >= startBkt is guaranteed by the
    // end > start filter + div monotonicity, so a NEGATIVE difference
    // can only mean 64-bit overflow (full-address-space domains) — trip
    // the guard then too, instead of letting sequence() die opaquely.
    val span = endBkt - startBkt
    val endGuarded = when(span < 0L || span >= maxBucketsPerRange,
      raise_error(format_string(
        s"range [%s, %s) spans more than $maxBucketsPerRange buckets at " +
          s"bucketWidth=$bucketWidth — raise bucketWidth or maxBucketsPerRange",
        col(startCol), col(endCol))).cast("long"))
      .otherwise(endBkt)
    val r = ranges
      .filter(col(endCol) > col(startCol))
      .withColumn("__bkt", explode(sequence(startBkt, endGuarded)))
    p.join(r, Seq("__bkt"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bkt")
  }
}
