package graft.core

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.values.bloomfilter.BloomFilter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File pruning from the PARQUET BLOOM FILTERS the write path already
  * embeds (AppendOp: PK columns + [[graft.format.StorageMetadata
  * .bloomColumns]]): a point predicate (`=` / `IN`) on a bloom-carrying
  * column drops every candidate file whose blooms prove the value(s)
  * absent — BEFORE task scheduling, from footer-only driver reads.
  *
  * This is the third pruning layer and the one that works when the
  * OTHER two can't: manifest min/max stats need the layout to correlate
  * with the key (clustered tables), bucket pruning needs a bucket spec —
  * a bloom answers point lookups on an arbitrary layout. The intended
  * 100 TB shape is a small candidate set AFTER stats/bucket pruning (a
  * point read); a broad scan gains nothing from per-file membership
  * tests, so pruning engages only under [[MaxCandidateFiles]].
  *
  * Conservative by construction: any file whose footer lacks a bloom
  * for the column (legacy files, `spark.graft.pkBloomFilters=false`
  * writes), any non-literal or type-mismatched comparison, and any
  * value possibly present in ANY row group keeps the file. Row-group
  * blooms are cached (bounded LRU, whole-filter bits) so the repeated
  * point reads of a streaming ingest pay the footer IO once per file.
  */
object BloomPruning {

  /** Only point-read-shaped candidate sets benefit; a broad scan would
    * pay O(files) footer reads for nothing. */
  private val MaxCandidateFiles = 512

  /** Cap on total membership probes (values × conjuncts). */
  private val MaxLookupValues = 1024

  /** Drop candidate files whose blooms falsify a point conjunct.
    * `filters` are implicitly ANDed; `files` are table-root-relative. */
  def pruneFiles(
      spark: SparkSession,
      storage: Storage,
      filters: Seq[Expression],
      files: Seq[String]): Seq[String] = {
    if (files.isEmpty || files.size > MaxCandidateFiles || filters.isEmpty) return files
    val lookups = pointLookups(storage, filters)
    if (lookups.isEmpty) return files
    if (lookups.map(_._3.size).sum > MaxLookupValues) return files
    val conf = spark.sparkContext.hadoopConfiguration
    files.filter { rel =>
      val abs = storage.absolute(rel)
      lookups.forall { case (colName, dt, values) =>
        // the conjunct can hold in this file only if SOME value might
        // be present in SOME row group (missing bloom = might)
        blooms(abs, colName, conf) match {
          case None => true // no bloom anywhere in the file
          case Some(perGroup) => perGroup.exists {
            case None => true
            case Some(b) => values.exists(v => mightContain(b, dt, v))
          }
        }
      }
    }
  }

  /** Conjunctive point lookups on bloom-carrying columns:
    * (column, type, candidate values) per conjunct — the conjunct holds
    * only if the row's column equals one of the values. */
  private def pointLookups(
      storage: Storage,
      filters: Seq[Expression]): Seq[(String, DataType, Seq[Any])] = {
    val eligible: Map[String, DataType] = {
      // PHYSICAL names: both planning paths hand filters over the
      // physical schema (renamed columns prune under their as-written
      // name, matching the parquet footer's column paths)
      val schema = storage.schema
      (storage.primaryKeys ++ storage.metadata.bloomColumns).distinct.flatMap { c =>
        schema.fields.find(f => f.name == c && ManifestIO.statsEligible(f.dataType))
          .map(f => c -> f.dataType)
      }.toMap
    }
    if (eligible.isEmpty) return Nil

    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute if u.nameParts.length == 1 => Some(u.nameParts.head)
      case _ => None
    }
    def bloomAttr(e: Expression): Option[(String, DataType)] =
      attrName(e).flatMap(n => eligible.get(n).map(n -> _))
    // integral literals widen safely to the column's integral type; any
    // other mismatch loses (a coerced comparison is not a raw-value probe)
    def litOf(e: Expression, dt: DataType): Option[Any] = e match {
      case Literal(v, ldt) if v != null =>
        (ldt, dt) match {
          case (a, b) if a == b => Some(v)
          case (IntegerType, LongType) => Some(v.asInstanceOf[Int].toLong)
          case _ => None
        }
      case _ => None
    }
    // Column-API predicates arrive unresolved ('`=`', '`in`', …);
    // normalize like BucketPruning so both paths prune identically.
    def norm(e: Expression): Expression = e match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        (f.nameParts.map(_.toLowerCase).mkString("."), f.arguments) match {
          case ("=", Seq(l, r)) => EqualTo(norm(l), norm(r))
          case ("==", Seq(l, r)) => EqualTo(norm(l), norm(r))
          case ("and", Seq(l, r)) => And(norm(l), norm(r))
          case ("in", a +: vs) if vs.nonEmpty => In(norm(a), vs.map(norm))
          case _ => e
        }
      case _ => e.mapChildren(norm)
    }

    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }

    filters.map(norm).flatMap(conjuncts).flatMap {
      case EqualTo(a, v) if bloomAttr(a).isDefined =>
        val (c, dt) = bloomAttr(a).get
        litOf(v, dt).map(x => (c, dt, Seq(x)))
      case EqualTo(v, a) if bloomAttr(a).isDefined =>
        val (c, dt) = bloomAttr(a).get
        litOf(v, dt).map(x => (c, dt, Seq(x)))
      case EqualNullSafe(a, v) if bloomAttr(a).isDefined =>
        val (c, dt) = bloomAttr(a).get
        litOf(v, dt).map(x => (c, dt, Seq(x)))
      case In(a, vs) if bloomAttr(a).isDefined && vs.nonEmpty =>
        val (c, dt) = bloomAttr(a).get
        val lits = vs.map(litOf(_, dt))
        if (lits.forall(_.isDefined)) Some((c, dt, lits.flatten)) else None
      case InSet(a, vs) if bloomAttr(a).isDefined && vs.nonEmpty =>
        val (c, dt) = bloomAttr(a).get
        Some((c, dt, vs.filter(_ != null).toSeq))
      case _ => None
    }
  }

  private def mightContain(b: BloomFilter, dt: DataType, v: Any): Boolean = dt match {
    case IntegerType => b.findHash(b.hash(v.asInstanceOf[Int]))
    case LongType => b.findHash(b.hash(v.asInstanceOf[Long]))
    case FloatType => b.findHash(b.hash(v.asInstanceOf[Float]))
    case DoubleType => b.findHash(b.hash(v.asInstanceOf[Double]))
    case StringType =>
      val bytes = v match {
        case s: UTF8String => s.getBytes
        case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case other => other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }
      b.findHash(b.hash(Binary.fromConstantByteArray(bytes)))
    case _ => true
  }

  // ------------------------------------------------- bloom bits cache

  /** (absolute path, column) → per-row-group blooms; None = no row
    * group in the file carries one (cache that too — re-proving absence
    * costs the same footer read the cache exists to avoid). */
  private val MaxCached = 512
  private val cache =
    new java.util.LinkedHashMap[(String, String), Option[Seq[Option[BloomFilter]]]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Option[Seq[Option[BloomFilter]]]]): Boolean =
        size() > MaxCached
    }

  private def blooms(
      absPath: String,
      colName: String,
      conf: org.apache.hadoop.conf.Configuration): Option[Seq[Option[BloomFilter]]] = {
    val key = (absPath, colName)
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    val loaded: Option[Seq[Option[BloomFilter]]] = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(absPath), conf))
      try {
        val perGroup = reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          block.getColumns.asScala.find(_.getPath.toDotString == colName).flatMap { cc =>
            Option(reader.getBloomFilterDataReader(block)).flatMap(r =>
              Option(r.readBloomFilter(cc)))
          }
        }
        if (perGroup.forall(_.isEmpty)) None else Some(perGroup)
      } finally reader.close()
    }
    cache.synchronized { cache.put(key, loaded) }
    loaded
  }

  /** Test hook: drop cached bloom bits (e.g. after rewriting files). */
  private[graft] def clearCache(): Unit = cache.synchronized(cache.clear())
}
