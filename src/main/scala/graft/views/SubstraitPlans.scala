package graft.views

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** Substrait wire-format persistence for view plans — the reference's
  * actual plan encoding (transform/plans.py:28-122, udfs.py:133-178,
  * datasets.py:114-121 build `substrait.Plan` protos; views load back
  * through `_load_view` udfs.py:249-266, which supports exactly the
  * read / project / filter relations this codec emits).
  *
  * The messages are hand-encoded in protobuf wire format (the same
  * approach as [[graft.format.TfExampleSerializer]] for tf.train.Example)
  * against field numbers taken from the substrait protos the reference
  * vendors (`python/src/substrait/` generated `_pb2.py` descriptors):
  *
  *   Plan{1: extension_uris, 2: extensions, 3: relations}
  *   PlanRel{2: root}          RelRoot{1: input}
  *   Rel{1: read, 2: filter, 7: project}
  *   ReadRel{7: named_table}   ReadRel.NamedTable{1: names}
  *   FilterRel{2: input, 3: condition}
  *   ProjectRel{2: input, 3: expressions}
  *   Expression{3: scalar_function}
  *   Expression.ScalarFunction{1: function_reference, 3: output_type,
  *                             4: arguments}
  *   FunctionArgument{1: enum}
  *   Type{1: bool}  Type.Boolean{}
  *   SimpleExtensionURI{1: extension_uri_anchor, 2: uri}
  *   SimpleExtensionDeclaration{3: extension_function}
  *   …ExtensionFunction{1: extension_uri_reference, 2: function_anchor,
  *                      3: name}
  *
  * Substrait has no place for our expression-transform params (the
  * reference's UDFs are pickled closures, carrying their state), so
  * params ride as `FunctionArgument.enum` strings `"key=value"` — valid
  * wire-format Substrait, declared under the reference's own extension
  * URI (`urn:space:substrait_simple_extension_function`). Anchor
  * numbering matches the reference builder: both counters start at 1 and
  * a fresh URI declaration is appended per function (plans.py:76-97,
  * udfs.py:66-88). Joins are not encodable — reference parity:
  * `_load_view` raises on any other relation.
  */
object SubstraitPlans {

  /** plans.py:34 — the UDF extension URI of the reference. */
  val SimpleUdfUri = "urn:space:substrait_simple_extension_function"

  private def paramEsc(s: String): String =
    s.replace("%", "%25").replace("=", "%3D")
  private def paramUnesc(s: String): String =
    s.replace("%3D", "=").replace("%25", "%")

  // ---- protobuf wire primitives ----

  private final class Writer {
    val out = new ByteArrayOutputStream()
    def varintField(field: Int, v: Long): Unit =
      graft.format.ProtoWire.writeVarintField(out, field, v)
    def bytesField(field: Int, b: Array[Byte]): Unit =
      graft.format.ProtoWire.writeLenDelim(out, field, b)
    def stringField(field: Int, s: String): Unit = bytesField(field, s.getBytes(UTF_8))
    def msgField(field: Int)(body: Writer => Unit): Unit = {
      val w = new Writer; body(w); bytesField(field, w.out.toByteArray)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Decoded fields of one message level: (fieldNo -> values in order).
    * Only varint (wire 0) and length-delimited (wire 2) appear in the
    * messages this codec reads; anything else fails loudly. */
  private def parse(buf: Array[Byte]): Seq[(Int, Either[Long, Array[Byte]])] = {
    val res = scala.collection.mutable.ArrayBuffer.empty[(Int, Either[Long, Array[Byte]])]
    var i = 0
    def varint(): Long = {
      val (v, next) = graft.format.ProtoWire.readVarint(buf, i)
      i = next; v
    }
    while (i < buf.length) {
      val t = varint(); val field = (t >>> 3).toInt
      (t & 7) match {
        case 0 => res += field -> Left(varint())
        case 2 =>
          val len = varint().toInt
          // copyOfRange past the end ZERO-PADS instead of failing: a
          // truncated/corrupt persisted plan would decode to silent
          // garbage (e.g. a table location with NUL tail) — corruption
          // must be loud
          if (len < 0 || i + len > buf.length)
            throw new IllegalArgumentException(
              s"truncated substrait plan: field $field declares $len bytes " +
                s"but only ${buf.length - i} remain")
          res += field -> Right(java.util.Arrays.copyOfRange(buf, i, i + len))
          i += len
        case w => throw new IllegalArgumentException(
          s"unsupported wire type $w for field $field")
      }
    }
    res.toSeq
  }

  private def sub(fields: Seq[(Int, Either[Long, Array[Byte]])], no: Int): Seq[Array[Byte]] =
    fields.collect { case (`no`, Right(b)) => b }
  private def one(fields: Seq[(Int, Either[Long, Array[Byte]])], no: Int, what: String): Array[Byte] =
    sub(fields, no).headOption.getOrElse(
      throw new IllegalArgumentException(s"substrait plan missing $what"))
  private def num(fields: Seq[(Int, Either[Long, Array[Byte]])], no: Int): Option[Long] =
    fields.collectFirst { case (`no`, Left(v)) => v }

  // ---- encode ----

  /** ReadRel.base_schema — the reference attaches the source table's
    * schema as a `NamedStruct` (datasets.py:120-121, built by
    * schema/substrait.py:35-100): names in depth-first order (list items
    * contribute no name), one `Type` per field with the FIELD ID stored
    * in `type_variation_reference` (their documented hack,
    * substrait.py:102-104), nullability left unspecified. Array element
    * ids are `list id + 1` (field_ids.py:44-49 — same rule FieldIds
    * uses). Returns false (emit nothing) when a type has no mapping. */
  private def namedStruct(w: Writer, schema: org.apache.spark.sql.types.StructType): Boolean = {
    import org.apache.spark.sql.types._
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val types = scala.collection.mutable.ArrayBuffer.empty[Writer => Unit]
    def fieldId(f: StructField): Long =
      if (f.metadata.contains(graft.format.FieldIds.ParquetFieldId))
        f.metadata.getLong(graft.format.FieldIds.ParquetFieldId)
      else graft.format.FieldIds.NullFieldId.toLong
    // Type{<typeField>: <Concrete>{type_variation_reference: id}}
    def leaf(typeField: Int, tvr: Long)(t: Writer): Unit =
      t.msgField(typeField)(c => if (tvr != 0) c.varintField(1, tvr))
    def typeOf(dt: DataType, id: Long): Option[Writer => Unit] = dt match {
      case BooleanType => Some(leaf(1, id))
      case IntegerType => Some(leaf(5, id))
      case LongType => Some(leaf(7, id))
      case FloatType => Some(leaf(10, id))
      case DoubleType => Some(leaf(11, id))
      case StringType => Some(leaf(12, id))
      case BinaryType => Some(leaf(13, id))
      case a: ArrayType =>
        typeOf(a.elementType, id + 1).map { inner => (t: Writer) =>
          t.msgField(27) { l =>          // Type.list
            l.msgField(1)(inner)         // List.type
            if (id != 0) l.varintField(2, id) // List.type_variation_reference
          }
        }
      case s: StructType =>
        val members = s.fields.toSeq.map(f => field(f))
        if (members.exists(_.isEmpty)) None
        else Some { (t: Writer) =>
          t.msgField(25) { st =>         // Type.struct
            members.flatten.foreach(m => st.msgField(1)(m)) // Struct.types
            if (id != 0) st.varintField(2, id)
          }
        }
      case _ => None
    }
    def field(f: StructField): Option[Writer => Unit] = {
      names += f.name
      typeOf(f.dataType, fieldId(f))
    }
    val all = schema.fields.toSeq.map(field)
    if (all.exists(_.isEmpty)) false
    else {
      names.foreach(w.stringField(1, _))          // NamedStruct.names
      w.msgField(2) { st =>                       // NamedStruct.struct
        all.flatten.foreach(t => st.msgField(1)(t)) // Type.Struct.types
      }
      true
    }
  }

  /** DFS field names of the first ReadRel's base_schema, if present —
    * introspection/spec helper. */
  def baseSchemaNames(bytes: Array[Byte]): Option[Seq[String]] = {
    def findRead(rel: Array[Byte]): Option[Array[Byte]] = {
      val f = parse(rel)
      f.headOption match {
        case Some((1, Right(read))) => Some(read)
        case Some((2, Right(filt))) => findRead(one(parse(filt), 2, "input"))
        case Some((7, Right(proj))) => findRead(one(parse(proj), 2, "input"))
        case _ => None
      }
    }
    val planRel = one(parse(bytes), 3, "Plan.relations")
    val root = one(parse(planRel), 2, "PlanRel.root")
    findRead(one(parse(root), 1, "RelRoot.input")).flatMap { read =>
      sub(parse(read), 2).headOption.map { ns =>
        sub(parse(ns), 1).map(new String(_, UTF_8))
      }
    }
  }

  /** Encode a (join-free) view plan as `substrait.Plan` bytes.
    * `schemaOf` supplies a source table's (field-id-carrying) schema so
    * ReadRel can carry `base_schema` like the reference; tables it
    * returns None for — or types with no Substrait mapping — just omit
    * it (the loader only reads `named_table`, udfs.py:260). */
  def encode(
      plan: ViewPlan,
      schemaOf: String => Option[org.apache.spark.sql.types.StructType] = _ => None
  ): Array[Byte] = {
    var uriAnchor = 0
    var fnAnchor = 0
    // (uriAnchor, fnAnchor, name) per registered function, in plan order
    val decls = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    def register(name: String): Int = {
      uriAnchor += 1; fnAnchor += 1
      decls += ((uriAnchor, fnAnchor, name))
      fnAnchor
    }

    def relOf(p: ViewPlan, w: Writer): Unit = p match {
      case ReadTable(location) =>
        w.msgField(1) { read =>           // Rel.read
          schemaOf(location).foreach { schema =>
            val bs = new Writer
            if (namedStruct(bs, schema))
              read.bytesField(2, bs.bytes) // ReadRel.base_schema
          }
          read.msgField(7) { nt =>        // ReadRel.named_table
            nt.stringField(1, location)   // NamedTable.names
          }
        }
      case MapNode(name, params, input) =>
        val anchor = register(name)
        w.msgField(7) { proj =>           // Rel.project
          proj.msgField(2)(relOf(input, _))        // ProjectRel.input
          proj.msgField(3) { e =>                   // ProjectRel.expressions
            scalarFn(e, anchor, params, withBoolType = false)
          }
        }
      case FilterNode(name, params, input) =>
        val anchor = register(name)
        w.msgField(2) { filt =>           // Rel.filter
          filt.msgField(2)(relOf(input, _))        // FilterRel.input
          filt.msgField(3) { e =>                   // FilterRel.condition
            scalarFn(e, anchor, params, withBoolType = true)
          }
        }
      case _: JoinNode => throw new UnsupportedOperationException(
        "join views have no Substrait encoding (reference parity: " +
          "udfs.py:249-266 loads read/project/filter only)")
    }

    def scalarFn(e: Writer, anchor: Int, params: Map[String, String],
        withBoolType: Boolean): Unit =
      e.msgField(3) { sf =>               // Expression.scalar_function
        sf.varintField(1, anchor.toLong)  // function_reference
        if (withBoolType) sf.msgField(3) { t =>    // output_type
          t.msgField(1)(_ => ())                    // Type.bool = Boolean{}
        }
        params.toSeq.sortBy(_._1).foreach { case (k, v) =>
          // '=' separates key from value, so both sides percent-escape
          // '%' and '=' — a key containing '=' must survive the split
          sf.msgField(4)(_.stringField(1, s"${paramEsc(k)}=${paramEsc(v)}"))
        }
      }

    // body first (assigns anchors in walk order), then the Plan envelope
    val rel = new Writer
    relOf(plan, rel)
    val w = new Writer
    decls.foreach { case (ua, _, _) =>
      w.msgField(1) { u =>                // Plan.extension_uris
        u.varintField(1, ua.toLong)       // extension_uri_anchor
        u.stringField(2, SimpleUdfUri)    // uri
      }
    }
    decls.foreach { case (ua, fa, name) =>
      w.msgField(2) { d =>                // Plan.extensions
        d.msgField(3) { f =>              // extension_function
          f.varintField(1, ua.toLong)     // extension_uri_reference
          f.varintField(2, fa.toLong)     // function_anchor
          f.stringField(3, name)          // name
        }
      }
    }
    w.msgField(3) { pr =>                 // Plan.relations
      pr.msgField(2) { root =>            // PlanRel.root
        root.bytesField(1, rel.bytes)     // RelRoot.input = Rel
      }
    }
    w.bytes
  }

  def encodeBase64(
      plan: ViewPlan,
      schemaOf: String => Option[org.apache.spark.sql.types.StructType] = _ => None): String =
    Base64.getEncoder.encodeToString(encode(plan, schemaOf))

  // ---- decode ----

  /** `from_relation` analog: walk Plan → relations[0].root.input. */
  def decode(bytes: Array[Byte]): ViewPlan = {
    val plan = parse(bytes)
    // anchor -> function name, via the extension declarations
    val fns: Map[Long, String] = sub(plan, 2).flatMap { d =>
      sub(parse(d), 3).map { f =>
        val pf = parse(f)
        val anchor = num(pf, 2).getOrElse(0L)
        val name = new String(one(pf, 3, "ExtensionFunction.name"), UTF_8)
        anchor -> name
      }
    }.toMap

    def relOf(b: Array[Byte]): ViewPlan = {
      val rel = parse(b)
      rel.headOption match {
        case Some((1, Right(read))) =>
          val nt = one(parse(read), 7, "ReadRel.named_table")
          val names = sub(parse(nt), 1)
          ReadTable(new String(names.head, UTF_8))
        case Some((2, Right(filt))) =>
          val pf = parse(filt)
          val (name, params) = fnOf(one(pf, 3, "FilterRel.condition"))
          FilterNode(name, params, relOf(one(pf, 2, "FilterRel.input")))
        case Some((7, Right(proj))) =>
          val pp = parse(proj)
          val (name, params) = fnOf(one(pp, 3, "ProjectRel.expressions"))
          MapNode(name, params, relOf(one(pp, 2, "ProjectRel.input")))
        case other => throw new IllegalArgumentException(
          s"Substrait relation not supported: field ${other.map(_._1)}")
      }
    }

    def fnOf(expr: Array[Byte]): (String, Map[String, String]) = {
      val sf = parse(one(parse(expr), 3, "Expression.scalar_function"))
      val anchor = num(sf, 1).getOrElse(
        throw new IllegalArgumentException("scalar_function missing reference"))
      val name = fns.getOrElse(anchor,
        throw new IllegalArgumentException(s"unknown function anchor $anchor"))
      val params = sub(sf, 4).flatMap { arg =>
        sub(parse(arg), 1).map(new String(_, UTF_8)).map { s =>
          val i = s.indexOf('=')
          if (i < 0) paramUnesc(s) -> ""
          else paramUnesc(s.take(i)) -> paramUnesc(s.drop(i + 1))
        }
      }.toMap
      (name, params)
    }

    val planRel = one(plan, 3, "Plan.relations")
    val root = one(parse(planRel), 2, "PlanRel.root")
    relOf(one(parse(root), 1, "RelRoot.input"))
  }

  def decodeBase64(s: String): ViewPlan = decode(Base64.getDecoder.decode(s))
}
