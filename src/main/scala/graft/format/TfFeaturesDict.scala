package graft.format

import java.nio.charset.StandardCharsets

import scala.collection.immutable.SortedMap

// no wildcard: org.json4s._ would shadow graft.format.FieldSerializer
// with json4s's unrelated FieldSerializer
import org.json4s.{JArray, JDecimal, JDouble, JInt, JLong, JObject, JString, JValue}
import org.json4s.jackson.JsonMethods

/** TFDS `FeaturesDict` semantics on top of the [[TfExampleSerializer]]
  * wire codec (reference schema/types/tf_features.py:29-64, where the
  * extension type wraps a `tfds.features.FeaturesDict` and
  * `serialize_example` / `deserialize_example` apply it).
  *
  * The reference's contract has three parts, replicated here without
  * TensorFlow:
  *
  *  1. **A declared schema** — dtype + shape per feature, features
  *     possibly NESTED in dicts. TFDS flattens nested names with `/`
  *     in the serialized `tf.train.Example` (`{"a": {"b": …}}` →
  *     feature key `"a/b"`); this codec flattens/re-nests the same way.
  *  2. **Schema-checked (de)serialization** — every declared feature
  *     must be present (and nothing undeclared), values must conform to
  *     the declared dtype, and element counts must match the declared
  *     shape (tensors are stored flattened row-major, exactly like
  *     TFDS; one `-1` wildcard dim is allowed, like TFDS's `None`).
  *  3. **Spec persistence with the schema** — the reference serializes
  *     the FeaturesDict spec into the Arrow extension type's metadata
  *     (`__arrow_ext_serialize__`); here [[TfFeaturesSpec.toJson]]
  *     rides in the field's `StructField.metadata` (see
  *     [[ExtTypes.tfFeaturesDictField]]), so a migrated dataset is
  *     self-describing — no registry call needed to read it back.
  *
  * dtypes: `int64`, `float32`, `string`, and `image` — the
  * encoded-bytes passthrough for image/audio payloads (TFDS stores an
  * encoded image as a single bytes feature; the JSON-side value is the
  * wire codec's `base64:` form). The documented deviation from the
  * reference stands: spec JSON is this codec's own compact form, not
  * TFDS's `FeaturesDict.to_json` class-name envelope.
  */
sealed trait TfFeatureNode

/** A leaf feature: declared dtype and (for tensors) shape. `shape`
  * `Nil` = scalar (exactly one element); one `-1` dim acts as TFDS's
  * `None` (unknown — any count divisible by the known dims). */
final case class TfLeaf(dtype: String, shape: Seq[Int] = Nil) extends TfFeatureNode {
  require(TfLeaf.Dtypes.contains(dtype), s"unsupported dtype $dtype")
  require(shape.count(_ == -1) <= 1, s"at most one unknown dim: $shape")
  require(shape.forall(d => d > 0 || d == -1), s"bad shape $shape")
}
object TfLeaf {
  val Dtypes: Set[String] = Set("int64", "float32", "string", "image")
}

/** A nested dict of features (TFDS sub-FeaturesDict). */
final case class TfDict(children: SortedMap[String, TfFeatureNode]) extends TfFeatureNode
object TfDict {
  def apply(kv: (String, TfFeatureNode)*): TfDict = TfDict(SortedMap(kv: _*))
}

final case class TfFeaturesSpec(root: TfDict) {

  /** `/`-flattened leaves, the key space of the serialized Example. */
  lazy val flat: SortedMap[String, TfLeaf] = {
    def walk(prefix: String, n: TfFeatureNode): SortedMap[String, TfLeaf] = n match {
      case l: TfLeaf => SortedMap(prefix -> l)
      case TfDict(cs) =>
        cs.foldLeft(SortedMap.empty[String, TfLeaf]) { case (acc, (k, c)) =>
          require(!k.contains("/"), s"feature name $k may not contain '/'")
          acc ++ walk(if (prefix.isEmpty) k else s"$prefix/$k", c)
        }
    }
    walk("", root)
  }

  def toJson: String = {
    def render(n: TfFeatureNode): String = n match {
      case TfLeaf(dt, shape) =>
        val sh = if (shape.isEmpty) "" else s""","shape":[${shape.mkString(",")}]"""
        s"""{"dtype":"$dt"$sh}"""
      case TfDict(cs) =>
        cs.map { case (k, c) => s"${Jsons.escape(k)}:${render(c)}" }
          .mkString("{", ",", "}")
    }
    render(root)
  }
}

object TfFeaturesSpec {

  def apply(kv: (String, TfFeatureNode)*): TfFeaturesSpec =
    TfFeaturesSpec(TfDict(kv: _*))

  /** Inverse of [[TfFeaturesSpec.toJson]]. A JSON object with a string
    * `dtype` member is a leaf; any other object is a nested dict.
    * ALSO accepts a verbatim TFDS `FeaturesDict.to_json` envelope (the
    * proto3-JSON feature tree whose nodes carry `pythonClassName` +
    * a oneof content key) — detected by the envelope's string
    * `pythonClassName` root member, which the compact form can never
    * produce (its members are feature OBJECTS), and translated via
    * [[fromTfdsJson]] so a spec exported by real TFDS loads without
    * hand-translation. */
  def fromJson(json: String): TfFeaturesSpec = {
    JsonMethods.parse(json) match {
      case JObject(fields) if fields.exists {
          case ("pythonClassName", JString(_)) => true; case _ => false } =>
        return fromTfdsEnvelope(JObject(fields))
      case _ => ()
    }
    def toNode(v: JValue): TfFeatureNode = v match {
      case JObject(fields) if fields.exists {
          case ("dtype", JString(_)) => true; case _ => false } =>
        val m = fields.toMap
        val dt = m("dtype").asInstanceOf[JString].s
        val shape = m.get("shape") match {
          case Some(JArray(items)) => items.map {
            case JInt(i) => i.toInt
            case other => throw new IllegalArgumentException(s"bad shape dim $other")
          }
          case None => Nil
          case Some(other) => throw new IllegalArgumentException(s"bad shape $other")
        }
        TfLeaf(dt, shape)
      case JObject(fields) =>
        TfDict(SortedMap(fields.map { case (k, c) => k -> toNode(c) }: _*))
      case other =>
        throw new IllegalArgumentException(s"feature spec node must be an object: $other")
    }
    toNode(JsonMethods.parse(json)) match {
      case d: TfDict => TfFeaturesSpec(d)
      case _: TfLeaf => throw new IllegalArgumentException(
        "feature spec root must be a dict of features")
    }
  }

  /** Translate a verbatim TFDS `FeaturesDict.to_json` envelope (the
    * proto3-JSON rendering of tensorflow_datasets' `feature.proto`:
    * each node is `{"pythonClassName": …, <oneof content>: …}`) into
    * this codec's spec. Supported content nodes and their mapping:
    *
    *  - `featuresDict.features` → nested [[TfDict]]
    *  - `tensor {shape, dtype}` → [[TfLeaf]] (dtypes int64 / float32 /
    *    string; proto3 prints int64 shape dims as STRINGS — both forms
    *    accepted; an absent `dimensions` list = scalar)
    *  - `text {}` → string scalar
    *  - `classLabel {numClasses}` → int64 scalar (stored as the label id,
    *    exactly TFDS's wire form)
    *  - `image {…}` → [[TfLeaf]] `image` (ENCODED bytes passthrough —
    *    TFDS stores the encoded payload as one bytes feature)
    *  - `sequence {feature, length}` → the inner leaf with a prepended
    *    unknown (-1) or fixed `length` dim (TFDS serializes a Sequence
    *    as the flattened variable-length tensor). A Sequence OF A DICT
    *    (the `tfds_coco_tutorial` `objects` shape) is translated by
    *    prepending the dim to EVERY leaf under the inner dict — exactly
    *    TFDS's wire form, where `objects: Sequence({area, bbox})`
    *    serializes as per-field aligned lists `objects/area`,
    *    `objects/bbox`
    *  - `BBoxFeature` (by class name) → float32 `[·, 4]`-compatible
    *    leaf (4 normalized corner floats per box)
    *  - `translation {languages}` → [[TfDict]] of language → string
    *    scalar (TFDS serializes a fixed-language Translation as
    *    per-language Text keys); `TranslationVariableLanguages` →
    *    [[TfDict]] of aligned variable-length `language`/`translation`
    *    string lists (it is a Sequence-of-dict underneath, so that IS
    *    its wire form)
    *  - `audio {shape, dtype, sampleRate}` → the sample Tensor in its
    *    WIRE dtype (narrow ints ride int64_list, floats the float32
    *    float_list); sample_rate is decode-side metadata with no wire
    *    footprint; absent shape = `(None,)`
    *  - `video {shape}` → variable/fixed-length list of ENCODED frame
    *    payloads (Sequence(Image) underneath — only the frame-count dim
    *    survives; H/W/C live inside each encoded frame). Payload decode
    *    stays out of scope, exactly as with Image.
    *
    * Remaining unsupported nodes throw with the offending
    * `pythonClassName` so any gap is visible, never silent. */
  def fromTfdsJson(json: String): TfFeaturesSpec =
    JsonMethods.parse(json) match {
      case o: JObject => fromTfdsEnvelope(o)
      case other => throw new IllegalArgumentException(
        s"TFDS features envelope must be an object: $other")
    }

  private def fromTfdsEnvelope(root: JObject): TfFeaturesSpec = {
    def fail(msg: String) = throw new IllegalArgumentException(msg)

    def dims(shape: JValue): Seq[Int] = shape match {
      case JObject(fs) => fs.toMap.get("dimensions") match {
        case Some(JArray(items)) => items.map {
          case JString(s) => s.toInt // proto3 JSON prints int64 as string
          case JInt(i) => i.toInt
          case JLong(l) => l.toInt
          case other => fail(s"bad TFDS shape dimension: $other")
        }
        case None => Nil // empty Shape message = scalar
        case Some(other) => fail(s"bad TFDS dimensions: $other")
      }
      case _ => Nil // absent shape = scalar
    }

    def toNode(v: JValue): TfFeatureNode = {
      val fields = v match {
        case JObject(fs) => fs.toMap
        case other => fail(s"TFDS feature node must be an object: $other")
      }
      def className = fields.get("pythonClassName") match {
        case Some(JString(s)) => s
        case _ => "<unknown>"
      }
      if (fields.contains("featuresDict")) {
        val feats = fields("featuresDict") match {
          case JObject(fs) => fs.toMap.get("features") match {
            case Some(JObject(m)) => m
            case None => Nil
            case Some(other) => fail(s"bad TFDS features map: $other")
          }
          case other => fail(s"bad TFDS featuresDict: $other")
        }
        TfDict(SortedMap(feats.map { case (k, c) => k -> toNode(c) }: _*))
      } else if (fields.contains("tensor")) {
        val t = fields("tensor") match {
          case JObject(fs) => fs.toMap
          case other => fail(s"bad TFDS tensor: $other")
        }
        val dt = t.get("dtype") match {
          // bool rides tf.train.Example's int64_list on the wire —
          // translate to the wire form, exactly like TFDS serializes it
          case Some(JString("bool")) => "int64"
          case Some(JString(s)) => s
          case other => fail(s"bad TFDS tensor dtype: $other")
        }
        if (!TfLeaf.Dtypes.contains(dt))
          fail(s"unsupported TFDS tensor dtype $dt (supported: int64, float32, string, bool)")
        TfLeaf(dt, dims(t.getOrElse("shape", JObject())))
      } else if (fields.contains("text")) {
        TfLeaf("string")
      } else if (fields.contains("classLabel")) {
        TfLeaf("int64")
      } else if (fields.contains("image")) {
        TfLeaf("image")
      } else if (fields.contains("audio")) {
        // Audio is an int-PCM (or float) Tensor underneath: TFDS
        // serializes the decoded samples as one flattened list, shape
        // (None,) or (None, channels); sample_rate/file_format are
        // decode-side metadata with no wire footprint. Narrower sample
        // dtypes ride tf.train.Example's int64_list (and float64 its
        // FLOAT32 float_list), so they translate to the wire dtype.
        val a = fields("audio") match {
          case JObject(fs) => fs.toMap
          case other => fail(s"bad TFDS audio: $other")
        }
        val dt = a.get("dtype") match {
          case Some(JString("int64" | "int32" | "int16" | "uint8" | "bool")) => "int64"
          case Some(JString("float32" | "float64")) => "float32"
          case None => "int64" // TFDS Audio default
          case Some(other) => fail(s"bad TFDS audio dtype: $other")
        }
        val sh = dims(a.getOrElse("shape", JObject()))
        TfLeaf(dt, if (sh.isEmpty) Seq(-1) else sh)
      } else if (fields.contains("video")) {
        // Video is Sequence(Image) underneath: the wire form is a
        // variable-length list of ENCODED frame payloads (the declared
        // H/W/C live inside each encoded frame, not on the wire), so
        // only the leading frame-count dim survives translation.
        // Payload DECODE stays out of scope, exactly as with Image.
        val vf = fields("video") match {
          case JObject(fs) => fs.toMap
          case other => fail(s"bad TFDS video: $other")
        }
        val frames = dims(vf.getOrElse("shape", JObject())).headOption.getOrElse(-1)
        TfLeaf("image", Seq(frames))
      } else if (fields.contains("sequence")) {
        val s = fields("sequence") match {
          case JObject(fs) => fs.toMap
          case other => fail(s"bad TFDS sequence: $other")
        }
        val len = s.get("length") match {
          case Some(JString(l)) => l.toInt
          case Some(JInt(l)) => l.toInt
          case Some(JLong(l)) => l.toInt
          case _ => -1
        }
        val dim = if (len >= 0) len else -1
        // prepend the sequence dim to a leaf; a dict sequence prepends
        // it to every leaf underneath (TFDS's per-field aligned lists)
        def sequenced(n: TfFeatureNode): TfFeatureNode = n match {
          case TfLeaf(dt, shape) =>
            if (dim == -1 && shape.contains(-1)) fail(
              "TFDS sequence over a tensor with an unknown dim is not " +
                "representable (at most one unknown dim per feature)")
            TfLeaf(dt, dim +: shape)
          case TfDict(cs) => TfDict(cs.map { case (k, c) => k -> sequenced(c) })
        }
        sequenced(toNode(s.getOrElse("feature", fail("TFDS sequence without a feature"))))
      } else if (className.endsWith("BBoxFeature") || fields.contains("boundingBox")) {
        // 4 normalized corner floats per box (ymin, xmin, ymax, xmax)
        TfLeaf("float32", Seq(4))
      } else if (fields.contains("translation")) {
        // Translation(languages=[…]) is a dict of language → Text on
        // the wire (TFDS serializes per-language keys `<lang>`); the
        // variable-language variant (TranslationVariableLanguages) is a
        // Sequence({language, translation}) underneath, so its wire
        // form is two ALIGNED variable-length string lists (languages
        // sorted at encode time), independent of any optional
        // `languages` restriction in the envelope
        val t = fields("translation") match {
          case JObject(fs) => fs.toMap
          case other => fail(s"bad TFDS translation: $other")
        }
        if (className.endsWith("TranslationVariableLanguages")) {
          TfDict(SortedMap(
            "language" -> (TfLeaf("string", Seq(-1)): TfFeatureNode),
            "translation" -> (TfLeaf("string", Seq(-1)): TfFeatureNode)))
        } else {
          val langs = t.get("languages") match {
            case Some(JArray(items)) => items.map {
              case JString(l) => l
              case other => fail(s"bad TFDS translation language: $other")
            }
            case _ => fail(s"TFDS translation without a languages list: $className")
          }
          if (langs.isEmpty) fail("TFDS translation with an empty languages list")
          TfDict(SortedMap(langs.map(l => l -> (TfLeaf("string"): TfFeatureNode)): _*))
        }
      } else fail(s"unsupported TFDS feature $className " +
        s"(supported: FeaturesDict, Tensor, Text, ClassLabel, Image, Audio, " +
        s"Video, BBox, Sequence, Translation)")
    }

    toNode(root) match {
      case d: TfDict => TfFeaturesSpec(d)
      case _: TfLeaf => fail("TFDS envelope root must be a FeaturesDict")
    }
  }
}

/** Schema-checked TFDS-style serializer: nested JSON feature documents
  * ↔ `tf.train.Example` bytes with `/`-flattened keys, validated
  * against a declared [[TfFeaturesSpec]] in BOTH directions (the
  * reference's `serialize_example`/`deserialize_example` contract). */
object TfFeaturesDictSerializer {
  /** True when a BARE (unquoted) NaN/Infinity token occurs in the JSON
    * text — one quote-state-aware pass, so string feature values that
    * merely CONTAIN the characters (e.g. "[NaN]", ":Infinity,") never
    * match (a naive regex falsely rejected them). */
  private[graft] def hasBareNonFinite(s: String): Boolean = {
    var i = 0
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1 // skip the escaped character
        else if (c == '"') inStr = false
      } else {
        if (c == '"') inStr = true
        else if ((c == 'N' && s.startsWith("NaN", i)) ||
            (c == 'I' && s.startsWith("Infinity", i))) return true
      }
      i += 1
    }
    false
  }
}

final class TfFeaturesDictSerializer(val spec: TfFeaturesSpec) extends FieldSerializer {

  def serialize(value: Array[Byte]): Array[Byte] = {
    val doc = JsonMethods.parse(new String(value, StandardCharsets.UTF_8))
    val flatVals = flattenDoc(doc)
    checkKeys(flatVals.keySet)
    val flatJson = flatVals.map { case (k, items) =>
      s"${Jsons.escape(k)}:${renderChecked(k, items)}"
    }.mkString("{", ",", "}")
    TfExampleSerializer.serialize(flatJson.getBytes(StandardCharsets.UTF_8))
  }

  def deserialize(bytes: Array[Byte]): Array[Byte] = {
    val flatJson = new String(TfExampleSerializer.deserialize(bytes), StandardCharsets.UTF_8)
    // the base codec round-trips NaN/Infinity floats, but json4s (and
    // strict JSON) cannot represent them — reject with a clear message
    // instead of a jackson parse crash (quote-aware, so strings that
    // merely contain the token text pass through)
    if (TfFeaturesDictSerializer.hasBareNonFinite(flatJson))
      throw new IllegalArgumentException(
        "non-finite float feature values (NaN/Infinity) are not " +
          "supported under a declared FeaturesDict spec")
    val flatVals: Map[String, List[JValue]] = JsonMethods.parse(flatJson) match {
      case JObject(fields) => fields.map {
        case (k, JArray(items)) => k -> items
        case (k, scalar) => k -> List(scalar)
      }.toMap
      case other => throw new IllegalArgumentException(s"flat doc not an object: $other")
    }
    checkKeys(flatVals.keySet)
    // re-nest '/'-joined keys into the declared dict structure, with
    // each leaf's values validated and canonically rendered
    def nest(node: TfFeatureNode, prefix: String): String = node match {
      case _: TfLeaf => renderChecked(prefix, flatVals(prefix))
      case TfDict(cs) =>
        cs.map { case (k, c) =>
          s"${Jsons.escape(k)}:${nest(c, if (prefix.isEmpty) k else s"$prefix/$k")}"
        }.mkString("{", ",", "}")
    }
    nest(spec.root, "").getBytes(StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------- validation

  /** Flatten the nested document to `/`-keys. An object at a path NOT
    * declared as a leaf recurses; anything else is a leaf value. */
  private def flattenDoc(v: JValue): SortedMap[String, List[JValue]] = {
    def walk(prefix: String, v: JValue): SortedMap[String, List[JValue]] =
      (v, spec.flat.contains(prefix)) match {
        case (JObject(fields), false) =>
          val nested = fields.foldLeft(SortedMap.empty[String, List[JValue]]) {
            case (acc, (k, c)) =>
              acc ++ walk(if (prefix.isEmpty) k else s"$prefix/$k", c)
          }
          if (fields.isEmpty && prefix.nonEmpty)
            throw new IllegalArgumentException(
              s"empty dict at $prefix matches no declared feature")
          else nested
        case (JArray(items), _) => SortedMap(prefix -> items)
        case (scalar, _) => SortedMap(prefix -> List(scalar))
      }
    walk("", v)
  }

  private def checkKeys(got: collection.Set[String]): Unit = {
    val want = spec.flat.keySet
    val missing = want -- got
    val extra = got -- want
    require(missing.isEmpty && extra.isEmpty,
      s"feature document does not match the declared FeaturesDict: " +
        s"missing=[${missing.mkString(",")}] undeclared=[${extra.mkString(",")}]")
  }

  private def show(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  /** Validate one flat feature's items against its declared leaf and
    * render them as a flat-codec JSON array (float32 integers forced to
    * carry a decimal point so the wire codec types the list as a
    * float_list, exactly as TFDS would). */
  private def renderChecked(key: String, items: List[JValue]): String = {
    val leaf = spec.flat(key)
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"feature $key: $msg")
    checkShape(leaf, items.size, fail)
    val rendered = leaf.dtype match {
      case "int64" => items.map {
        case v @ (JInt(_) | JLong(_)) => show(v)
        case other => fail(s"expected int64 values, got ${show(other)}")
      }
      case "float32" => items.map {
        case v @ (JInt(_) | JLong(_)) => show(v) + ".0"
        case v @ (JDouble(_) | JDecimal(_)) => show(v)
        case other => fail(s"expected float32 values, got ${show(other)}")
      }
      case "string" | "image" => items.map {
        case v: JString => show(v)
        case other => fail(s"expected ${leaf.dtype} bytes, got ${show(other)}")
      }
    }
    rendered.mkString("[", ",", "]")
  }

  private def checkShape(leaf: TfLeaf, n: Int, fail: String => Nothing): Unit =
    if (leaf.dtype == "image" && leaf.shape.isEmpty) {
      // a shaped image leaf is a LIST of encoded payloads (video
      // frames) and validates through the shape branches below
      if (n != 1) fail(s"an image feature is a single encoded payload, got $n values")
    } else if (leaf.shape.isEmpty) {
      if (n != 1) fail(s"scalar shape [] requires exactly 1 value, got $n")
    } else if (leaf.shape.contains(-1)) {
      // TFDS's None dim admits length 0 (an empty tensor is valid) —
      // only a non-empty count must divide the known dims
      val known = leaf.shape.filter(_ > 0).product
      if (n % known != 0)
        fail(s"$n values do not fit shape [${leaf.shape.mkString(",")}]")
    } else {
      val want = leaf.shape.product
      if (n != want)
        fail(s"shape [${leaf.shape.mkString(",")}] requires $want values, got $n")
    }
}
