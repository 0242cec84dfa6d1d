package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join: for every left row, the single right row with
  * the greatest `rightTime <= leftTime` within the same key group — the
  * point-in-time lookup of feature stores and market data, an operator
  * Spark's join zoo lacks (a naive formulation is a non-equi range join
  * that explodes to O(n·m) per key).
  *
  * Shape: UNION the tagged sides, one window over (keys, time) with a
  * running last-right-payload carry-forward, keep left rows. Cost is ONE
  * shuffle by key + one sort — identical to a sort-merge join, no range
  * explosion, no per-key buffering beyond the sort spill machinery, so
  * it holds at 100 TB with skew governed by the key partitioning (salt
  * upstream if one key dominates; the window itself is
  * partition-parallel).
  *
  * Right rows sort BEFORE left rows at equal timestamps, so an exactly
  * simultaneous right row is visible (`<=` semantics, matching DuckDB's
  * ASOF JOIN which the oracle uses).
  */
object AsofJoin {

  /** Inner as-of join. `right`'s payload columns (everything except keys
    * and `rightTime`) come back nested under `asof` plus flattened with
    * their own names; left rows with no prior right row are dropped. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    val lCols = left.columns

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields ++
            right.select(col(rightTime).as("__rt")).schema.fields)))
    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .withColumn("__r", struct(rightPayload.map(col) :+ col(rightTime).as("__rt"): _*))
      .select((keys.map(col) :+ col("__t") :+ col("__tag") :+ col("__r")): _*)

    // align schemas: left keeps its own columns, right side contributes
    // nulls for them (they are dropped after the window)
    val leftShape = taggedLeft.select(
      (keys.map(col) :+ col("__t") :+ col("__tag") :+ col("__r")) ++
        lCols.filterNot(keys.contains).map(col): _*)
    val rightShape = lCols.filterNot(keys.contains).foldLeft(taggedRight) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(leftShape.columns.map(col): _*)

    // deterministic tiebreak for multiple right rows at the same
    // (keys, time): order by the payload struct itself when its type is
    // orderable — otherwise last() would carry whichever duplicate
    // happened to sort last under the partitioning (and flake against
    // an oracle). Unorderable payloads (maps) keep the 2-column order;
    // ties there remain caller-visible nondeterminism.
    val rStructOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(taggedRight.schema("__r").dataType)
    val ordering =
      if (rStructOrderable) Seq(col("__t").asc, col("__tag").asc, col("__r").asc)
      else Seq(col("__t").asc, col("__tag").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftShape.unionByName(rightShape)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 && col("asof").isNotNull)
      .select(lCols.map(col) :+ col("asof"): _*)
  }

  /** Convenience: flatten chosen right payload fields as top-level
    * columns `prefix<field>`. */
  def asofJoinFlat(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      fields: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val joined = asofJoin(left, right, keys, leftTime, rightTime)
    val flat = fields.map(f => col(s"asof.$f").as(s"$prefix$f")) :+
      col("asof.__rt").as(s"${prefix}time")
    joined.select(joined.columns.filterNot(_ == "asof").map(col) ++ flat: _*)
  }
}
