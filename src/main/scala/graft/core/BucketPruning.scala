package graft.core

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, InSet, Literal, Murmur3HashFunction, Or}
import org.apache.spark.sql.types.DataType

import graft.format.StoragePaths

/** File pruning from the BUCKET layout alone: a filter that pins the
  * bucket column to literals can only match rows in the buckets those
  * literals hash to, so every other bucket's files are skipped without
  * any stats — the O(1/numBuckets) point-lookup path of a bucketed
  * table (works even when the table was never clustered, where min/max
  * stats are useless).
  *
  * Conservative by construction: anything not a literal equality/IN on
  * the single bucket column — including type-mismatched literals, whose
  * murmur3 differs from the column type's — keeps ALL buckets. AND
  * intersects, OR unions (and widens to "all" if either side does).
  * Multi-column bucket specs are not analyzed (always "all buckets"). */
object BucketPruning {

  /** Write-side bucket id of a literal: pmod(murmur3_32(v, seed 42), n)
    * — HashPartitioning's partition id, the same function AppendOp's
    * repartition and the catalog's `bucket` V2 function use. */
  def bucketId(value: Any, dt: DataType, numBuckets: Int): Int = {
    val h = Murmur3HashFunction.hash(value, dt, 42L).toInt
    ((h % numBuckets) + numBuckets) % numBuckets
  }

  /** Buckets `filters` (implicitly ANDed) can reach; None = all. */
  def reachableBuckets(
      bucketCols: Seq[String],
      colType: DataType,
      numBuckets: Int,
      filters: Seq[Expression]): Option[Set[Int]] = {
    if (bucketCols.size != 1 || numBuckets <= 0 || filters.isEmpty) return None
    val bucketCol = bucketCols.head

    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute if u.nameParts.length == 1 => Some(u.nameParts.head)
      case _ => None
    }
    def litOf(e: Expression): Option[(Any, DataType)] = e match {
      // a literal of a DIFFERENT type than the column hashes differently
      // than the write path did — never prune on it
      case Literal(v, dt) if v != null && dt == colType => Some((v, dt))
      case _ => None
    }
    def isBucketAttr(e: Expression): Boolean = attrName(e).contains(bucketCol)

    // Column → expression conversion yields UnresolvedFunction nodes
    // ('`=`', '`and`', '`or`', '`in`') before analysis; normalize them to
    // their resolved shapes so both the API path (unresolved) and the
    // Catalyst data-filter path (resolved) prune identically.
    def norm(e: Expression): Expression = e match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        (f.nameParts.map(_.toLowerCase).mkString("."), f.arguments) match {
          case ("=", Seq(l, r)) => EqualTo(norm(l), norm(r))
          case ("==", Seq(l, r)) => EqualTo(norm(l), norm(r))
          case ("and", Seq(l, r)) => And(norm(l), norm(r))
          case ("or", Seq(l, r)) => Or(norm(l), norm(r))
          case ("in", a +: vs) if vs.nonEmpty => In(norm(a), vs.map(norm))
          case _ => e
        }
      case _ => e.mapChildren(norm)
    }

    def walk(e0: Expression): Option[Set[Int]] = norm(e0) match {
      case And(l, r) =>
        (walk(l), walk(r)) match {
          case (Some(a), Some(b)) => Some(a intersect b)
          case (a, b) => a.orElse(b)
        }
      case Or(l, r) =>
        for (a <- walk(l); b <- walk(r)) yield a union b
      case EqualTo(a, v) if isBucketAttr(a) =>
        litOf(v).map { case (value, dt) => Set(bucketId(value, dt, numBuckets)) }
      case EqualTo(v, a) if isBucketAttr(a) =>
        litOf(v).map { case (value, dt) => Set(bucketId(value, dt, numBuckets)) }
      case In(a, vs) if isBucketAttr(a) =>
        val lits = vs.map(litOf)
        if (lits.forall(_.isDefined))
          Some(lits.flatten.map { case (value, dt) => bucketId(value, dt, numBuckets) }.toSet)
        else None
      case InSet(a, vs) if isBucketAttr(a) =>
        Some(vs.filter(_ != null).map(v => bucketId(v, colType, numBuckets)).toSet)
      case _ => None
    }

    // top-level filters AND together: intersect whatever is known
    filters.flatMap(walk) match {
      case Seq() => None
      case sets => Some(sets.reduce(_ intersect _))
    }
  }

  /** Drop files of unreachable buckets (files without a bucket id in
    * their name are conservatively kept). */
  def pruneFiles(
      storage: Storage,
      filters: Seq[Expression],
      files: Seq[String]): Seq[String] = {
    val meta = storage.metadata
    if (meta.numBuckets == 0) return files
    val colType = storage.schema(meta.bucketColumns.head).dataType
    reachableBuckets(meta.bucketColumns, colType, meta.numBuckets, filters) match {
      case None => files
      case Some(reach) =>
        files.filter(f => StoragePaths.bucketOf(f).forall(reach.contains))
    }
  }
}
