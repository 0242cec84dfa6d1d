package graft.format

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.immutable.SortedMap

/** Concrete TFDS-compatible serializer: JSON feature documents ↔
  * `tf.train.Example` protocol-buffer bytes.
  *
  * The reference ships a real TFDS FeaturesDict codec
  * (serializers/tf_features.py:29-64); the TF stack does not exist on
  * the JVM, but the `Example` proto's WIRE FORMAT is public and tiny
  * (three repeated-value list messages under a string-keyed map), so
  * this codec writes/reads it directly — the on-disk payload of a
  * `tf_features` record field is a genuine `tf.train.Example` any TFDS
  * pipeline can consume, no TensorFlow involved.
  *
  * Logical (in-memory) form: a UTF-8 JSON object, one key per feature,
  * each value an array (scalars are accepted on serialize and wrapped).
  * Mapping: JSON strings → `bytes_list` (UTF-8), integral numbers →
  * `int64_list`, other numbers → `float_list` (binary32, the proto's
  * precision). `bytes_list` values that are NOT valid UTF-8 (image /
  * audio payloads — the common TFDS case) deserialize as
  * `"base64:<data>"` strings, and a JSON string with that prefix
  * serializes back to the raw bytes: every byte payload round-trips
  * losslessly; the prefix is reserved (a literal UTF-8 string starting
  * with `base64:` also gets re-encoded through the same form, keeping
  * the mapping bijective). Deserialize is canonical: keys sorted,
  * values always arrays — so serialize∘deserialize is the identity on
  * proto bytes and deserialize∘serialize is the identity on canonical
  * JSON. Both packed and unpacked encodings of the repeated numeric
  * lists are accepted on read, as the proto spec requires.
  *
  * Wire schema (tensorflow/core/example/{example,feature}.proto):
  * {{{
  * Example  { Features features = 1; }
  * Features { map<string, Feature> feature = 1; }
  * Feature  { oneof { BytesList=1; FloatList=2; Int64List=3 } }
  * BytesList{ repeated bytes value = 1; }
  * FloatList{ repeated float value = 1 [packed]; }
  * Int64List{ repeated int64 value = 1 [packed]; }
  * }}}
  */
object TfExampleSerializer extends FieldSerializer {

  /** Registry name: `SerializerRegistry.register("tf_example", this)` is
    * done lazily by [[graft.format.ExtTypes]] users; registering under
    * [[ExtTypes.TfFeaturesType]] makes it the `tf_features` default. */
  val Name = "tf_example"

  // ------------------------------------------------------------- encode

  def serialize(value: Array[Byte]): Array[Byte] = {
    val features = parseJson(new String(value, StandardCharsets.UTF_8))
    val fs = new ByteArrayOutputStream()
    features.foreach { case (key, feature) =>
      // Features.feature map entry: {1: key, 2: Feature}
      val entry = new ByteArrayOutputStream()
      writeLenDelim(entry, 1, key.getBytes(StandardCharsets.UTF_8))
      writeLenDelim(entry, 2, encodeFeature(feature))
      writeLenDelim(fs, 1, entry.toByteArray)
    }
    val out = new ByteArrayOutputStream()
    writeLenDelim(out, 1, fs.toByteArray) // Example.features
    out.toByteArray
  }

  /** Reserved JSON prefix for non-UTF-8 byte payloads. */
  private val B64Prefix = "base64:"

  private def featureBytes(s: String): Array[Byte] =
    if (s.startsWith(B64Prefix)) {
      // a literal string that merely STARTS with the prefix but isn't
      // valid base64 (e.g. "base64: see attachment", written by the
      // pre-prefix codec) must stay a literal, not crash
      try java.util.Base64.getDecoder.decode(s.substring(B64Prefix.length))
      catch { case _: IllegalArgumentException => s.getBytes(StandardCharsets.UTF_8) }
    } else s.getBytes(StandardCharsets.UTF_8)

  private def featureString(b: Array[Byte], from: Int, to: Int): String = {
    // fast path: pure-ASCII slices (the overwhelmingly common case) are
    // always valid UTF-8 — no decoder object, no copy
    var i = from
    var ascii = true
    while (ascii && i < to) { if ((b(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) {
      val s = new String(b, from, to - from, StandardCharsets.US_ASCII)
      if (!s.startsWith(B64Prefix)) return s
    }
    val slice = java.util.Arrays.copyOfRange(b, from, to)
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val s = dec.decode(ByteBuffer.wrap(slice)).toString
      // keep the mapping bijective: a literal string carrying the
      // reserved prefix is itself re-encoded through base64 form
      if (s.startsWith(B64Prefix))
        B64Prefix + java.util.Base64.getEncoder.encodeToString(slice)
      else s
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        B64Prefix + java.util.Base64.getEncoder.encodeToString(slice)
    }
  }

  private def encodeFeature(f: FeatureValue): Array[Byte] = {
    val list = new ByteArrayOutputStream()
    val fieldNo = f match {
      case BytesFeature(vs) =>
        vs.foreach(v => writeLenDelim(list, 1, featureBytes(v)))
        1
      case FloatFeature(vs) =>
        val bb = ByteBuffer.allocate(4 * vs.size).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(bb.putFloat)
        writeLenDelim(list, 1, bb.array()) // packed
        2
      case Int64Feature(vs) =>
        val packed = new ByteArrayOutputStream()
        vs.foreach(v => writeVarint(packed, v))
        writeLenDelim(list, 1, packed.toByteArray) // packed
        3
    }
    val feat = new ByteArrayOutputStream()
    writeLenDelim(feat, fieldNo, list.toByteArray)
    feat.toByteArray
  }

  // ------------------------------------------------------------- decode

  def deserialize(bytes: Array[Byte]): Array[Byte] = {
    var features = SortedMap.empty[String, FeatureValue]
    forEachField(bytes, 0, bytes.length) { (no, w, _, body, from, to) =>
      if (no == 1 && w == 2) forEachField(body, from, to) { (no2, w2, _, b2, f2, t2) =>
        if (no2 == 1 && w2 == 2) { // one map entry
          var key = ""
          var value: FeatureValue = BytesFeature(Nil)
          forEachField(b2, f2, t2) { (no3, w3, _, b3, f3, t3) =>
            if (no3 == 1 && w3 == 2)
              key = new String(b3, f3, t3 - f3, StandardCharsets.UTF_8)
            else if (no3 == 2 && w3 == 2) value = decodeFeature(b3, f3, t3)
          }
          features += key -> value
        }
      }
    }
    toJson(features).getBytes(StandardCharsets.UTF_8)
  }

  private def decodeFeature(b: Array[Byte], from: Int, to: Int): FeatureValue = {
    var out: FeatureValue = BytesFeature(Nil)
    forEachField(b, from, to) { (no, w, _, body, f, t) =>
      no match {
        case 1 if w == 2 => // BytesList: repeated len-delimited
          val vs = List.newBuilder[String]
          forEachField(body, f, t) { (n2, w2, _, b2, f2, t2) =>
            if (n2 == 1 && w2 == 2) vs += featureString(b2, f2, t2)
          }
          out = BytesFeature(vs.result())
        case 2 if w == 2 => // FloatList: packed or unpacked fixed32
          val vs = List.newBuilder[Float]
          forEachField(body, f, t) { (n2, w2, _, b2, f2, t2) =>
            if (n2 == 1 && (w2 == 2 || w2 == 5)) {
              val bb = ByteBuffer.wrap(b2, f2, t2 - f2).order(ByteOrder.LITTLE_ENDIAN)
              while (bb.remaining() >= 4) vs += bb.getFloat
            }
          }
          out = FloatFeature(vs.result())
        case 3 if w == 2 => // Int64List: packed or unpacked varints
          val vs = List.newBuilder[Long]
          forEachField(body, f, t) { (n2, w2, v2, b2, f2, t2) =>
            if (n2 == 1 && w2 == 0) vs += v2
            else if (n2 == 1 && w2 == 2) {
              var p = f2
              while (p < t2) { val (v, np) = readVarint(b2, p); vs += v; p = np }
            }
          }
          out = Int64Feature(vs.result())
        case _ => ()
      }
    }
    out
  }

  // ------------------------------------------- minimal proto wire I/O

  /** Walk the fields of a message slice. LEN fields (wire 2) pass their
    * body slice; varint fields (wire 0) pass the decoded value with
    * from == to; fixed32/fixed64 pass their 4/8-byte slice. Delivering
    * ALL wire types matters: repeated int64/float list values are legal
    * in BOTH packed (one LEN body) and unpacked (one scalar field per
    * element) encodings, and a conformant reader must accept both. */
  private def forEachField(b: Array[Byte], from: Int, to: Int)(
      f: (Int, Int, Long, Array[Byte], Int, Int) => Unit): Unit = {
    var p = from
    while (p < to) {
      val (tag, p1) = readVarint(b, p)
      val fieldNo = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      wire match {
        case 2 =>
          val (len, p2) = readVarint(b, p1)
          // a declared length past the buffer is CORRUPTION and must be
          // loud — copyOfRange would silently zero-pad the slice
          if (len < 0 || p2 + len > to) throw new IllegalArgumentException(
            s"truncated tf.train.Example: field $fieldNo declares $len bytes " +
              s"but only ${to - p2} remain")
          f(fieldNo, 2, 0L, b, p2, p2 + len.toInt)
          p = p2 + len.toInt
        case 0 =>
          val (v, p2) = readVarint(b, p1)
          f(fieldNo, 0, v, b, p2, p2)
          p = p2
        case 5 => f(fieldNo, 5, 0L, b, p1, p1 + 4); p = p1 + 4
        case 1 => f(fieldNo, 1, 0L, b, p1, p1 + 8); p = p1 + 8
        case w => throw new IllegalArgumentException(
          s"unsupported wire type $w in tf.train.Example bytes")
      }
    }
  }

  // varint/tag primitives shared with the Substrait codec
  private def writeLenDelim(out: ByteArrayOutputStream, fieldNo: Int, body: Array[Byte]): Unit =
    ProtoWire.writeLenDelim(out, fieldNo, body)
  private def writeVarint(out: ByteArrayOutputStream, v: Long): Unit =
    ProtoWire.writeVarint(out, v)
  private def readVarint(b: Array[Byte], from: Int): (Long, Int) =
    ProtoWire.readVarint(b, from)

  // ------------------------------------------------ tiny JSON (no deps)

  private sealed trait FeatureValue
  private case class BytesFeature(vs: List[String]) extends FeatureValue
  private case class FloatFeature(vs: List[Float]) extends FeatureValue
  private case class Int64Feature(vs: List[Long]) extends FeatureValue

  /** Parse a flat JSON object of features. Values: string / number /
    * array of one of those. A hand-rolled parser keeps the codec
    * dependency-free; feature documents are flat by construction (the
    * proto has no nesting either). */
  private def parseJson(s: String): SortedMap[String, FeatureValue] = {
    val p = new JsonParser(s)
    p.ws(); p.expect('{')
    var out = SortedMap.empty[String, FeatureValue]
    p.ws()
    if (!p.peekIs('}')) {
      var more = true
      while (more) {
        p.ws(); val key = p.string(); p.ws(); p.expect(':'); p.ws()
        out += key -> p.featureValue()
        p.ws()
        if (p.peekIs(',')) { p.expect(','); more = true } else more = false
      }
    }
    p.ws(); p.expect('}')
    out
  }

  private final class JsonParser(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def peekIs(c: Char): Boolean = i < s.length && s.charAt(i) == c
    def expect(c: Char): Unit = {
      require(peekIs(c), s"expected '$c' at offset $i in feature JSON")
      i += 1
    }
    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!peekIs('"')) {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"' => sb += '"'; case '\\' => sb += '\\'; case '/' => sb += '/'
            case 'b' => sb += '\b'; case 'f' => sb += '\f'; case 'n' => sb += '\n'
            case 'r' => sb += '\r'; case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb += c
        i += 1
      }
      expect('"')
      sb.result()
    }
    private def number(): Either[Long, Float] = {
      // JSON has no NaN/Infinity literals, but binary32 payloads do —
      // the canonical form this codec EMITS (Float.toString) must parse
      // back, or serialize∘deserialize breaks on non-finite features
      if (s.startsWith("NaN", i)) { i += 3; return Right(Float.NaN) }
      if (s.startsWith("Infinity", i)) { i += 8; return Right(Float.PositiveInfinity) }
      if (s.startsWith("-Infinity", i)) { i += 9; return Right(Float.NegativeInfinity) }
      val start = i
      while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
      val tok = s.substring(start, i)
      if (tok.matches("-?\\d+")) Left(tok.toLong) else Right(tok.toFloat)
    }
    private def scalar(): Either[String, Either[Long, Float]] =
      if (peekIs('"')) Left(string()) else Right(number())
    def featureValue(): FeatureValue = {
      if (peekIs('[')) {
        expect('['); ws()
        var items = List.empty[Either[String, Either[Long, Float]]]
        if (!peekIs(']')) {
          var more = true
          while (more) {
            ws(); items :+= scalar(); ws()
            if (peekIs(',')) { expect(','); more = true } else more = false
          }
        }
        ws(); expect(']')
        fromScalars(items)
      } else fromScalars(List(scalar()))
    }
    private def fromScalars(items: List[Either[String, Either[Long, Float]]]): FeatureValue =
      if (items.forall(_.isLeft)) BytesFeature(items.map(_.left.toOption.get))
      else if (items.forall(v => v.isRight && v.toOption.get.isLeft))
        Int64Feature(items.map(_.toOption.get.left.toOption.get))
      else FloatFeature(items.map {
        case Left(x) => throw new IllegalArgumentException(s"mixed string/number feature: $x")
        case Right(Left(l)) => l.toFloat
        case Right(Right(f)) => f
      })
  }

  private def toJson(features: SortedMap[String, FeatureValue]): String =
    features.map { case (k, v) =>
      val arr = v match {
        case BytesFeature(vs) => vs.map(jsonStr).mkString("[", ",", "]")
        case Int64Feature(vs) => vs.mkString("[", ",", "]")
        case FloatFeature(vs) =>
          // shortest decimal that round-trips binary32 → stable canon
          vs.map(f => java.lang.Float.toString(f)).mkString("[", ",", "]")
      }
      s"${jsonStr(k)}:$arr"
    }.mkString("{", ",", "}")

  private def jsonStr(s: String): String = Jsons.escape(s)
}
