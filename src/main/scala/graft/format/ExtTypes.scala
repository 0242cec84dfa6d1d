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
  /** Name of the [[FieldSerializer]] applied to this record field's
    * payloads (resolved via [[SerializerRegistry]]). */
  val SerializerKey = "graft.ext.serializer"

  /** JSON of the field's declared [[TfFeaturesSpec]] — the analog of
    * the reference persisting `FeaturesDict.to_json` inside the Arrow
    * extension type (`__arrow_ext_serialize__`, tf_features.py:44-45):
    * the spec travels WITH the schema, so reads are schema-checked with
    * no registry setup. */
  val TfSpecKey = "graft.ext.tf_features_spec"

  def tfFeaturesField(name: String): StructField =
    StructField(name, BinaryType, nullable = true,
      new MetadataBuilder().putString(TypeKey, TfFeaturesType).build())

  /** A `tf_features` record field carrying its own FeaturesDict spec:
    * payloads are schema-checked `tf.train.Example` bytes, logical
    * values are nested JSON feature documents. */
  def tfFeaturesDictField(name: String, spec: TfFeaturesSpec): StructField =
    StructField(name, BinaryType, nullable = true,
      new MetadataBuilder().putString(TypeKey, TfFeaturesType)
        .putString(TfSpecKey, spec.toJson).build())

  def tfFeaturesSpec(f: StructField): Option[TfFeaturesSpec] =
    if (f.metadata.contains(TfSpecKey))
      Some(TfFeaturesSpec.fromJson(f.metadata.getString(TfSpecKey)))
    else None

  /** A binary record field whose payloads pass through the named
    * serializer on write and its inverse on read/stitch/random-access. */
  def serializedField(name: String, serializer: String): StructField =
    StructField(name, BinaryType, nullable = true,
      new MetadataBuilder().putString(SerializerKey, serializer).build())

  def serializerName(f: StructField): Option[String] =
    if (f.metadata.contains(SerializerKey)) Some(f.metadata.getString(SerializerKey)) else None

  def fileField(name: String, directory: String): StructField =
    StructField(name, StringType, nullable = true,
      new MetadataBuilder().putString(TypeKey, FileTypeName)
        .putString(DirectoryKey, directory).build())

  def isTfFeatures(f: StructField): Boolean =
    f.metadata.contains(TypeKey) && f.metadata.getString(TypeKey) == TfFeaturesType

  def isFile(f: StructField): Boolean =
    f.metadata.contains(TypeKey) && f.metadata.getString(TypeKey) == FileTypeName

  def fileDirectory(f: StructField): Option[String] =
    if (f.metadata.contains(DirectoryKey)) Some(f.metadata.getString(DirectoryKey)) else None

  /** Resolve a File-typed column to full paths: `directory/<value>`. */
  def fullPath(f: StructField, value: String): String =
    fileDirectory(f).map(d => s"$d/$value").getOrElse(value)
}

/** Per-field record-payload serializer hook (reference `FieldSerializer`
  * serializers/base.py:30-108, applied in the record read/write paths).
  * Spark deviation (documented): the in-memory representation of a
  * record field is its logical binary value, so a serializer is a BYTE
  * CODEC — `serialize` maps the logical payload to its on-disk form on
  * append, `deserialize` inverts it on stitch and random access. The
  * reference's TFDS FeaturesDict codec (tf_features.py:29-64) is exactly
  * such a codec (structured example ↔ serialized proto bytes);
  * [[TfExampleSerializer]] provides it concretely — JSON feature docs ↔
  * genuine `tf.train.Example` wire bytes, no TensorFlow needed. The
  * `tf_features` name still resolves to pass-through by default (bytes
  * ingested from a real TFDS dataset are ALREADY serialized Examples and
  * must not be re-encoded); register [[TfExampleSerializer]] under that
  * name when the logical payloads are JSON feature docs instead. */
trait FieldSerializer extends Serializable {
  def serialize(value: Array[Byte]): Array[Byte]
  def deserialize(bytes: Array[Byte]): Array[Byte]
}

object BytesPassthroughSerializer extends FieldSerializer {
  def serialize(value: Array[Byte]): Array[Byte] = value
  def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
}

/** Registry of named serializers (the schema persists only the NAME —
  * same persistability rule as transforms: registered instance or FQCN
  * of a no-arg [[FieldSerializer]] class). */
object SerializerRegistry {
  private val registry = scala.collection.concurrent.TrieMap.empty[String, FieldSerializer]

  def register(name: String, s: FieldSerializer): Unit = registry.put(name, s)

  /** Serializer for a record field: a field-embedded FeaturesDict spec
    * wins (self-describing, like the reference's extension-type
    * metadata), then the explicit marker, then the TfFeatures default,
    * else pass-through. */
  def resolve(f: StructField): FieldSerializer =
    ExtTypes.tfFeaturesSpec(f) match {
      case Some(spec) => new TfFeaturesDictSerializer(spec)
      case None => resolveNamed(f)
    }

  private def resolveNamed(f: StructField): FieldSerializer =
    ExtTypes.serializerName(f) match {
      case Some(n) =>
        registry.get(n).orElse(loadClass(n)).getOrElse {
          if (n == ExtTypes.TfFeaturesType) BytesPassthroughSerializer
          else throw new IllegalArgumentException(s"serializer $n not registered")
        }
      case None if ExtTypes.isTfFeatures(f) =>
        registry.getOrElse(ExtTypes.TfFeaturesType, BytesPassthroughSerializer)
      case None => BytesPassthroughSerializer
    }

  def isPassthrough(s: FieldSerializer): Boolean = s eq BytesPassthroughSerializer

  private def loadClass(name: String): Option[FieldSerializer] =
    if (!name.contains(".")) None
    else scala.util.Try(
      Class.forName(name).getDeclaredConstructor().newInstance().asInstanceOf[FieldSerializer]
    ).toOption
}
