package graft.format

import org.apache.spark.sql.types._

/** Depth-first field-id assignment at table creation (reference
  * `/root/reference/python/src/space/core/schema/field_ids.py:26-71`):
  * top-level and nested struct children get sequential ids; a list field's
  * element gets the list's id + 1.
  *
  * Ids are carried in `StructField.metadata` under `parquet.field.id`,
  * which Spark natively writes into / reads from Parquet footers (since
  * 3.3), preserving schema-evolution-by-id (SURVEY.md §1.3).
  */
object FieldIds {
  val ParquetFieldId = "parquet.field.id"
  /** Id for externally-loaded files without assigned ids (arrow.py:28-31). */
  val NullFieldId: Int = -1

  def assign(schema: StructType, startId: Int = 0): StructType = {
    var next = startId
    def assignField(f: StructField): StructField = {
      val id = next
      next += 1
      val dt = assignType(f.dataType)
      val md = new MetadataBuilder().withMetadata(f.metadata)
        .putLong(ParquetFieldId, id.toLong).build()
      StructField(f.name, dt, f.nullable, md)
    }
    def assignType(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(assignField))
      case a: ArrayType =>
        next += 1 // element id = list id + 1 (field_ids.py:44-49)
        ArrayType(assignType(a.elementType), a.containsNull)
      case other => other
    }
    StructType(schema.fields.map(assignField))
  }

  // ONE definition of how many ids a type/field consumes — consumedIds
  // and maxAssignedId must never skew (a future id-consumption rule,
  // e.g. MapType support, changes exactly one place)
  private def countType(dt: DataType): Int = dt match {
    case s: StructType => s.fields.map(countField).sum
    case a: ArrayType => 1 + countType(a.elementType)
    case _ => 0
  }
  private def countField(f: StructField): Int = 1 + countType(f.dataType)

  /** Number of ids [[assign]] consumes for `schema` — the start id for
    * fields appended by schema evolution (ids are never reused). */
  def consumedIds(schema: StructType): Int =
    schema.fields.map(countField).sum

  /** Highest id [[assign]] has handed out for `schema` — ids of a field
    * with id k and a type consuming c ids span k..k+c-1. Unlike
    * [[consumedIds]] this stays correct after DROP COLUMN leaves holes
    * in the id space. */
  def maxAssignedId(schema: StructType): Int =
    if (schema.fields.isEmpty) -1
    else schema.fields.map(f => fieldId(f) + countField(f) - 1).max

  def fieldId(f: StructField): Int =
    if (f.metadata.contains(ParquetFieldId)) f.metadata.getLong(ParquetFieldId).toInt
    else NullFieldId

  /** Drop field-id metadata (recursively). Read schemas must NOT carry
    * ids: Spark 4 hard-fails on id-carrying read schemas against files
    * without ids (externally-loaded parquet has none — NULL_FIELD_ID
    * semantics, arrow.py:28-31); our files always keep stable names, so
    * name matching is lossless. Data files still get ids at WRITE time. */
  def strip(schema: StructType): StructType = {
    def stripField(f: StructField): StructField = {
      val md = new MetadataBuilder().withMetadata(f.metadata)
        .remove(ParquetFieldId).build()
      StructField(f.name, stripType(f.dataType), f.nullable, md)
    }
    def stripType(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(stripField))
      case a: ArrayType => ArrayType(stripType(a.elementType), a.containsNull)
      case other => other
    }
    StructType(schema.fields.map(stripField))
  }
}

/** Schema rules enforced at table creation (reference
  * `/root/reference/python/src/space/core/schema/utils.py:65-94`):
  * at least one primary key; PKs must exist, be non-nested scalars and not
  * record fields or floats; record fields must exist and be binary.
  * Primary keys are declared but unenforced (metadata.proto:80).
  */
object SchemaValidation {
  def validate(schema: StructType, primaryKeys: Seq[String], recordFields: Seq[String]): Unit = {
    require(primaryKeys.nonEmpty, "at least one primary key required")
    val byName = schema.fields.map(f => f.name -> f).toMap
    primaryKeys.foreach { pk =>
      val f = byName.getOrElse(pk, throw new IllegalArgumentException(s"primary key $pk not in schema"))
      require(!recordFields.contains(pk), s"record field $pk cannot be a primary key")
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          throw new IllegalArgumentException(s"primary key $pk cannot be a nested type")
        case FloatType | DoubleType =>
          throw new IllegalArgumentException(s"primary key $pk cannot be a float type")
        case _ =>
      }
    }
    recordFields.foreach { rf =>
      val f = byName.getOrElse(rf, throw new IllegalArgumentException(s"record field $rf not in schema"))
      require(f.dataType == BinaryType, s"record field $rf must be binary, got ${f.dataType}")
    }
  }
}
