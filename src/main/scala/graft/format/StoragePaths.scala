package graft.format

import java.util.UUID

/** Table-root-relative path layout (reference
  * `/root/reference/python/src/space/core/utils/paths.py:30-110`):
  *
  * {{{
  * <root>/metadata/entrypoint.json
  * <root>/metadata/metadata_<uuid>.json
  * <root>/metadata/index_manifest_<uuid>.parquet
  * <root>/metadata/record_manifest_<uuid>.parquet
  * <root>/metadata/changes/change_<uuid>.json
  * <root>/data/index_<uuid>.parquet
  * <root>/data/records/<field>_<uuid>.parquet
  * }}}
  *
  * Record payloads live in record *Parquet* files (single binary column)
  * rather than ArrayRecord — ArrayRecord has no JVM reader (SURVEY.md §1.2).
  */
object StoragePaths {
  val MetadataDir = "metadata"
  val DataDir = "data"
  val RecordDataDir = "data/records"
  val ChangesDir = "metadata/changes"
  val EntryPointFile = "metadata/entrypoint.json"

  private def uuid(): String = UUID.randomUUID().toString.replace("-", "")

  def newMetadataFile(): String = s"$MetadataDir/metadata_${uuid()}.json"
  def newIndexManifestFile(): String = s"$MetadataDir/index_manifest_${uuid()}.parquet"
  def newRecordManifestFile(): String = s"$MetadataDir/record_manifest_${uuid()}.parquet"
  def newChangeLogFile(): String = s"$ChangesDir/change_${uuid()}.json"
  def newDeleteVectorFile(): String = s"$MetadataDir/dv_${uuid()}.json"
  def newIndexDataFile(): String = s"$DataDir/index_${uuid()}.parquet"
  /** Bucketed index file: the bucket id is encoded in the NAME (the
    * Hive/Spark-bucketing convention) so no manifest change is needed
    * to group a snapshot's files by bucket. */
  def newIndexDataFile(bucket: Int): String = s"$DataDir/index_b${bucket}_${uuid()}.parquet"

  private val BucketRe = ".*/index_b(\\d+)_[0-9a-f]+\\.parquet$".r
  def bucketOf(path: String): Option[Int] = path match {
    case BucketRe(b) => Some(b.toInt)
    case _ => None
  }
  def newRecordDataFile(field: String): String = s"$RecordDataDir/${field}_${uuid()}.parquet"
}
