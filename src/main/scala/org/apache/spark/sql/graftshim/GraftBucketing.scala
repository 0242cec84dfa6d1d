package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Murmur3HashFunction}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

import graft.format.StoragePaths

/** Storage-partitioned-join support for BUCKETED graft tables.
  *
  * A bucketed table shuffles every write to
  * `pmod(murmur3(bucketColumns), numBuckets)` (AppendOp) and encodes the
  * bucket id in the file name. The SQL scan below regroups the parquet
  * planner's splits into ONE input partition per bucket, each reporting
  * its bucket id as the partition key; the scan reports
  * `KeyGroupedPartitioning(bucket(n, cols))`. With
  * `spark.sql.sources.v2.bucketing.enabled=true`, two graft tables
  * bucketed the same way then JOIN WITH ZERO SHUFFLE — Catalyst aligns
  * the bucket partitions side by side (Spark's storage-partitioned join,
  * the DSv2 successor of Hive bucketing; same design as Iceberg's).
  */
object GraftBucketing {

  /** One input partition per bucket: the parquet splits of that bucket's
    * files, keyed by the bucket id — a single flat id for the single-
    * hash layout, the per-column id TUPLE for a `bucketCounts` layout
    * (matching the per-column transforms the scan reports). */
  final class BucketFilePartition(
      index: Int,
      files: Array[PartitionedFile],
      key: Array[Any])
    extends FilePartition(index, files) with HasPartitionKey {
    override def partitionKey(): InternalRow = new GenericInternalRow(key)
  }

  /** Batch that REGROUPS the delegate parquet batch's splits by bucket.
    * Reuses the parquet reader factory unchanged — only the grouping
    * (and therefore the reported partitioning) differs. `bucketCounts`
    * non-empty = per-column layout: flat file ids decode row-major into
    * tuples. */
  final class BucketedBatch(delegate: ParquetScan, bucketCounts: Seq[Int] = Nil)
    extends Batch {
    private lazy val inner = delegate.toBatch

    lazy val partitions: Array[InputPartition] = {
      val files = inner.planInputPartitions().flatMap {
        case fp: FilePartition => fp.files
        case other => throw new IllegalStateException(s"unexpected partition $other")
      }
      val byBucket = files.groupBy(pf => StoragePaths.bucketOf(pf.filePath.toString))
      require(!byBucket.contains(None),
        "bucketed table contains files without a bucket id")
      byBucket.toSeq
        .map { case (b, fs) => (b.get, fs) }
        .sortBy(_._1)
        .zipWithIndex
        .map { case ((b, fs), idx) =>
          val key: Array[Any] =
            if (bucketCounts.isEmpty) Array[Any](b)
            else graft.core.AppendOp.tupleOfFlat(b, bucketCounts)
              .map(Int.box(_): Any).toArray
          new BucketFilePartition(idx, fs, key): InputPartition
        }
        .toArray
    }

    override def planInputPartitions(): Array[InputPartition] = partitions

    override def createReaderFactory(): PartitionReaderFactory = inner.createReaderFactory()
  }

  /** The `bucket(numBuckets, col1[, col2…])` V2 function (resolved
    * through [[GraftCatalog]]'s FunctionCatalog surface) — the SAME hash
    * the write path uses: murmur3_32 CHAINED over the bucket columns in
    * spec order starting from seed 42, then pmod — i.e. Spark's own
    * `HashPartitioning(cols, n)` partition id (what
    * `df.repartition(n, cols…)` computes). Catalyst uses it to prove the
    * two join sides' partitionings compatible (and to hash one side when
    * only one table is bucketed and v2 bucketing-shuffle is enabled). */
  object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets, cols…): pmod(murmur3(cols…, seed 42), numBuckets)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length >= 2,
        s"bucket expects (numBuckets, col1[, col2…]), got $inputType")
      require(inputType.fields(0).dataType == IntegerType,
        "bucket: numBuckets must be int")
      new BucketBound(inputType.fields.drop(1).map(_.dataType).toSeq)
    }
  }

  final class BucketBound(valueTypes: Seq[DataType]) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = (IntegerType +: valueTypes).toArray
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${valueTypes.map(_.simpleString).mkString(",")})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val h = valueTypes.zipWithIndex.foldLeft(42L) { case (seed, (dt, i)) =>
        Murmur3HashFunction.hash(input.get(i + 1, dt), dt, seed)
      }.toInt
      ((h % n) + n) % n
    }
  }
}
