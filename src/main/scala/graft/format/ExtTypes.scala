package graft.format

import org.apache.spark.sql.types._

/** The reference's two schema extension types, mapped per SURVEY.md §1.3
  * to plain Spark types + field-metadata markers (no UDT needed):
  *
  *  - `TfFeatures` (serialized-tensor dict, reference
  *    schema/types/tf_features.py:29-64) → `BinaryType` record field
  *    with a marker; the TFDS serializer stays an abstract
  *    [[FieldSerializer]] hook (bytes pass-through by default — the
  *    reference's own tests use plain bytes, README.md:80-96).
  *  - `File` (path relative to a directory prefix,
  *    schema/types/files.py:29-64; proto metadata.proto:206-210) →
  *    `StringType` carrying the directory in metadata.
  */
object ExtTypes {
  val TypeKey = "graft.ext.type"
  val TfFeaturesType = "tf_features"
  val FileTypeName = "file"
  val DirectoryKey = "graft.ext.directory"

  def tfFeaturesField(name: String): StructField =
    StructField(name, BinaryType, nullable = true,
      new MetadataBuilder().putString(TypeKey, TfFeaturesType).build())

  def fileField(name: String, directory: String): StructField =
    StructField(name, StringType, nullable = true,
      new MetadataBuilder().putString(TypeKey, FileTypeName)
        .putString(DirectoryKey, directory).build())

  def isTfFeatures(f: StructField): Boolean =
    f.metadata.contains(TypeKey) && f.metadata.getString(TypeKey) == TfFeaturesType

  def fileDirectory(f: StructField): Option[String] =
    if (f.metadata.contains(DirectoryKey)) Some(f.metadata.getString(DirectoryKey)) else None

  /** Resolve a File-typed column to full paths: `directory/<value>`. */
  def fullPath(f: StructField, value: String): String =
    fileDirectory(f).map(d => s"$d/$value").getOrElse(value)
}

/** Per-field record-payload serializer hook (reference `FieldSerializer`
  * serializers/base.py:30-108). Default is bytes pass-through; a TFDS
  * FeaturesDict codec would plug in here. */
trait FieldSerializer extends Serializable {
  def serialize(value: Any): Array[Byte]
  def deserialize(bytes: Array[Byte]): Any
}

object BytesPassthroughSerializer extends FieldSerializer {
  def serialize(value: Any): Array[Byte] = value.asInstanceOf[Array[Byte]]
  def deserialize(bytes: Array[Byte]): Any = bytes
}
