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
  * precision). Deserialize is canonical: keys sorted, values always
  * arrays — so serialize∘deserialize is the identity on proto bytes and
  * deserialize∘serialize is the identity on canonical JSON.
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

  private def encodeFeature(f: FeatureValue): Array[Byte] = {
    val list = new ByteArrayOutputStream()
    val fieldNo = f match {
      case BytesFeature(vs) =>
        vs.foreach(v => writeLenDelim(list, 1, v.getBytes(StandardCharsets.UTF_8)))
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
    forEachField(bytes, 0, bytes.length) { (no, body, from, to) =>
      if (no == 1) forEachField(body, from, to) { (no2, b2, f2, t2) =>
        if (no2 == 1) { // one map entry
          var key = ""
          var value: FeatureValue = BytesFeature(Nil)
          forEachField(b2, f2, t2) { (no3, b3, f3, t3) =>
            if (no3 == 1) key = new String(b3, f3, t3 - f3, StandardCharsets.UTF_8)
            else if (no3 == 2) value = decodeFeature(b3, f3, t3)
          }
          features += key -> value
        }
      }
    }
    toJson(features).getBytes(StandardCharsets.UTF_8)
  }

  private def decodeFeature(b: Array[Byte], from: Int, to: Int): FeatureValue = {
    var out: FeatureValue = BytesFeature(Nil)
    forEachField(b, from, to) { (no, body, f, t) =>
      no match {
        case 1 => // BytesList: repeated len-delimited
          val vs = List.newBuilder[String]
          forEachField(body, f, t) { (n2, b2, f2, t2) =>
            if (n2 == 1) vs += new String(b2, f2, t2 - f2, StandardCharsets.UTF_8)
          }
          out = BytesFeature(vs.result())
        case 2 => // FloatList: packed fixed32
          val vs = List.newBuilder[Float]
          forEachField(body, f, t) { (n2, b2, f2, t2) =>
            if (n2 == 1) {
              val bb = ByteBuffer.wrap(b2, f2, t2 - f2).order(ByteOrder.LITTLE_ENDIAN)
              while (bb.remaining() >= 4) vs += bb.getFloat
            }
          }
          out = FloatFeature(vs.result())
        case 3 => // Int64List: packed varints
          val vs = List.newBuilder[Long]
          forEachField(body, f, t) { (n2, b2, f2, t2) =>
            if (n2 == 1) {
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

  /** Walk the length-delimited fields of a message slice. Only wire type
    * 2 (LEN) occurs in the Example schema; varint fields are tolerated
    * and skipped so foreign protos fail soft, not with a corrupt read. */
  private def forEachField(b: Array[Byte], from: Int, to: Int)(
      f: (Int, Array[Byte], Int, Int) => Unit): Unit = {
    var p = from
    while (p < to) {
      val (tag, p1) = readVarint(b, p)
      val fieldNo = (tag >> 3).toInt
      (tag & 7) match {
        case 2 =>
          val (len, p2) = readVarint(b, p1)
          f(fieldNo, b, p2, p2 + len.toInt)
          p = p2 + len.toInt
        case 0 => p = readVarint(b, p1)._2 // skip varint field
        case 5 => p = p1 + 4               // skip fixed32
        case 1 => p = p1 + 8               // skip fixed64
        case w => throw new IllegalArgumentException(
          s"unsupported wire type $w in tf.train.Example bytes")
      }
    }
  }

  private def writeLenDelim(out: ByteArrayOutputStream, fieldNo: Int, body: Array[Byte]): Unit = {
    writeVarint(out, (fieldNo.toLong << 3) | 2L)
    writeVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write((v & 0x7F).toInt)
  }

  private def readVarint(b: Array[Byte], from: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = from
    while ({
      val x = b(p) & 0xFF
      v |= (x & 0x7FL) << shift; shift += 7; p += 1
      (x & 0x80) != 0
    }) ()
    (v, p)
  }

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

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.result()
  }
}
