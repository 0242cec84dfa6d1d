package graft.views

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.core.{ManifestIO, RecordIO, SpaceDataset, Storage}

/** Executes a [[JoinNode]] (reference `JoinTransform` + `RayJoinOp`,
  * `/root/reference/python/src/space/core/transform/join.py:37-129`,
  * `/root/reference/python/src/space/ray/ops/join.py:49-137`),
  * Spark-first:
  *
  *   - Table sides are read in the PHYSICAL schema (record fields as
  *     address structs, `reference_read` analog of read.py:112-114), so
  *     record payloads never cross the join shuffle — the reference's
  *     defense for multimodal joins (flatten/fold around `pa.Table.join`,
  *     ray/ops/join.py:120-135). Payloads are stitched back AFTER the
  *     join, and only for sides with `referenceRead = false`.
  *   - The join-key ranges of both sides are intersected from manifest
  *     stats and applied as a pre-filter (ray/ops/join.py:148-176), so
  *     manifest pruning + parquet pushdown skip files outside the
  *     overlap. The range *partitioning* half of the reference's RayJoinOp
  *     is subsumed by Spark's shuffle/SMJ + AQE.
  *   - Output schema = key, left non-key fields, right non-key fields
  *     (join.py:64-91); name collisions between the sides are rejected
  *     (the reference leaves this as a TODO at join.py:90-91 and would
  *     produce an invalid schema).
  */
object JoinExec {

  private final case class Side(
      build: Option[Column] => DataFrame, // range filter → projected frame
      outFields: Seq[String], // non-key output fields, in order
      stitchAfter: Seq[(String, Storage)], // record fields to stitch post-join
      keyRange: Option[(Any, Any)])

  def run(spark: SparkSession, j: JoinNode): DataFrame = {
    val key = j.key
    val left = side(spark, j.left, j.leftFields, j.leftReferenceRead, key)
    val right = side(spark, j.right, j.rightFields, j.rightReferenceRead, key)

    val collide = left.outFields.intersect(right.outFields)
    require(collide.isEmpty,
      s"join sides share output fields (rename or project them away): ${collide.mkString(", ")}")

    // intersect the sides' key ranges; a disjoint intersection yields an
    // always-false predicate and (correctly) an empty result
    val rangeFilter: Option[Column] = for {
      (llo, lhi) <- left.keyRange
      (rlo, rhi) <- right.keyRange
    } yield {
      val lo = ManifestIO.maxAny(llo, rlo)
      val hi = ManifestIO.minAny(lhi, rhi)
      col(key) >= lit(lo) && col(key) <= lit(hi)
    }

    val joined = left.build(rangeFilter).join(right.build(rangeFilter), Seq(key), "inner")
    (left.stitchAfter ++ right.stitchAfter).foldLeft(joined) {
      case (df, (field, storage)) => RecordIO.stitch(spark, storage, df, Some(Seq(field)))
    }
  }

  /** `_sanitize_fields` (views.py:202-210): a projection must keep at
    * least one non-key field; the key is auto-added. */
  private def sanitize(fields: Option[Seq[String]], key: String, all: Seq[String]): Seq[String] = {
    fields match {
      case None => all
      case Some(fs) =>
        require(fs.nonEmpty && fs != Seq(key),
          "join requires reading at least one non-join-key field")
        fs.foreach(f => require(all.contains(f), s"unknown join field: $f"))
        if (fs.contains(key)) fs else fs :+ key
    }
  }

  private def side(
      spark: SparkSession,
      plan: ViewPlan,
      fields: Option[Seq[String]],
      referenceRead: Boolean,
      key: String): Side = plan match {
    case ReadTable(location) =>
      val ds = SpaceDataset.load(spark, location)
      val st = ds.storage
      require(st.primaryKeys.contains(key),
        s"join key $key must be a primary key of $location (join.py:199-201)")
      val selected = sanitize(fields, key, st.schema.fieldNames.toSeq)
      val ordered = key +: selected.filterNot(_ == key)
      val stitchAfter =
        if (referenceRead) Nil
        else st.recordFields.filter(selected.contains).map(_ -> st)
      Side(
        build = f => ds.read(filter = f, fields = Some(ordered), referenceRead = true),
        outFields = ordered.tail,
        stitchAfter = stitchAfter,
        keyRange = ManifestIO.keyRange(spark, st, key))
    case other =>
      // transformed side: record fields (if any) were already stitched by
      // the upstream pipeline; join as plain columns
      val df0 = other.toDF(spark)
      require(df0.columns.contains(key), s"join key $key missing from view output")
      val selected = sanitize(fields, key, df0.columns.toSeq)
      val ordered = key +: selected.filterNot(_ == key)
      Side(
        build = f => f.fold(df0)(df0.filter).select(ordered.map(col): _*),
        outFields = ordered.tail,
        stitchAfter = Nil,
        keyRange = None)
  }
}
