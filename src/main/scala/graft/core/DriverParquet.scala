package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Tiny driver-side parquet writer for MANIFEST files (flat schema +
  * one-level min/max stat structs). Manifest rows are already on the
  * driver when a commit assembles its patch — spinning a Spark job (+
  * temp dir + part-file rename) per manifest write is pure overhead;
  * this writes them directly. Data files still go through distributed
  * Spark writes — this path is metadata-only. */
object DriverParquet {

  def write(conf: Configuration, absPath: String, schema: StructType, rows: Seq[Row]): Unit = {
    val message = toMessageType(schema)
    val c = new Configuration(conf)
    GroupWriteSupport.setSchema(message, c)
    val writer = ExampleParquetWriter.builder(new Path(absPath))
      .withConf(c).withType(message).build()
    val factory = new SimpleGroupFactory(message)
    try {
      rows.foreach { row =>
        val g = factory.newGroup()
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i)) f.dataType match {
            case s: StructType =>
              val sub = g.addGroup(f.name)
              val inner = row.getStruct(i)
              s.fields.zipWithIndex.foreach { case (sf, j) =>
                if (!inner.isNullAt(j)) appendPrimitive(sub, sf.name, sf.dataType, inner.get(j))
              }
            case dt => appendPrimitive(g, f.name, dt, row.get(i))
          }
        }
        writer.write(g)
      }
    } finally writer.close()
  }

  private def appendPrimitive(g: org.apache.parquet.example.data.Group,
      name: String, dt: DataType, v: Any): Unit = dt match {
    case StringType => g.append(name, Binary.fromString(v.asInstanceOf[String]))
    case LongType => g.append(name, v.asInstanceOf[Long])
    case IntegerType => g.append(name, v.asInstanceOf[Int])
    case DoubleType => g.append(name, v.asInstanceOf[Double])
    case FloatType => g.append(name, v.asInstanceOf[Float])
    case BooleanType => g.append(name, v.asInstanceOf[Boolean])
    case other => throw new IllegalArgumentException(s"manifest type unsupported: $other")
  }

  private def toMessageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach(f => b.addField(toField(f)))
    b.named("graft_manifest")
  }

  private def toField(f: StructField): Type = f.dataType match {
    case s: StructType =>
      val gb = Types.optionalGroup()
      s.fields.foreach(sf => gb.addField(toField(sf)))
      gb.named(f.name)
    case dt =>
      val rep = if (f.nullable) Type.Repetition.OPTIONAL else Type.Repetition.REQUIRED
      dt match {
        case StringType => Types.primitive(PrimitiveTypeName.BINARY, rep)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case LongType => Types.primitive(PrimitiveTypeName.INT64, rep).named(f.name)
        case IntegerType => Types.primitive(PrimitiveTypeName.INT32, rep).named(f.name)
        case DoubleType => Types.primitive(PrimitiveTypeName.DOUBLE, rep).named(f.name)
        case FloatType => Types.primitive(PrimitiveTypeName.FLOAT, rep).named(f.name)
        case BooleanType => Types.primitive(PrimitiveTypeName.BOOLEAN, rep).named(f.name)
        case other => throw new IllegalArgumentException(s"manifest type unsupported: $other")
      }
  }
}
