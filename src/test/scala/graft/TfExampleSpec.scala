package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.format.{ExtTypes, SerializerRegistry, TfExampleSerializer}

/** TFDS interop codec: JSON feature docs ↔ tf.train.Example proto bytes
  * (reference serializers/tf_features.py:29-64, here as a direct wire-
  * format codec — no TensorFlow). */
class TfExampleSpec extends AnyFunSuite {
  import TestSpark._

  private def json(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  test("serializes to the exact tf.train.Example wire bytes") {
    // {"a":[1]} — hand-assembled proto:
    // Example{features=1: Features{feature=1: entry{key="a", value=
    //   Feature{int64_list=3: Int64List{value=1 packed}}}}}
    val expected = Array(
      0x0A, 0x0C,             // Example.features, 12 bytes
      0x0A, 0x0A,             // Features.feature map entry, 10 bytes
      0x0A, 0x01, 0x61,       // key "a"
      0x12, 0x05,             // value: Feature, 5 bytes
      0x1A, 0x03,             // Feature.int64_list, 3 bytes
      0x0A, 0x01, 0x01        // Int64List.value packed [1]
    ).map(_.toByte)
    assert(TfExampleSerializer.serialize(json("""{"a":[1]}""")).toSeq == expected.toSeq)
  }

  test("round-trips all three feature kinds through proto bytes") {
    val doc = """{"label":[3,7],"score":[0.5],"text":["hi","there"]}"""
    val bytes = TfExampleSerializer.serialize(json(doc))
    val back = new String(TfExampleSerializer.deserialize(bytes), StandardCharsets.UTF_8)
    assert(back == doc)
    // proto-bytes fixpoint: deserialize∘serialize∘deserialize is stable
    assert(TfExampleSerializer.serialize(TfExampleSerializer.deserialize(bytes)).toSeq
      == bytes.toSeq)
  }

  test("canonicalizes scalars, key order and escapes") {
    val messy = """{"z": 1, "a": "x\ny", "m": [2.5, 1]}"""
    val canon = new String(
      TfExampleSerializer.deserialize(TfExampleSerializer.serialize(json(messy))),
      StandardCharsets.UTF_8)
    // sorted keys, array-wrapped scalars, mixed int/float list → floats
    assert(canon == """{"a":["x\ny"],"m":[2.5,1.0],"z":[1]}""")
  }

  test("tf_example-serialized record field round-trips through a table") {
    SerializerRegistry.register(TfExampleSerializer.Name, TfExampleSerializer)
    val docs = Tables.read(spark, sfDir, "documents").filter(col("doc_id") < 50L)
      .select(col("doc_id"),
        encode(to_json(struct(array(col("doc_id")).as("id"),
          array(col("text")).as("text"))), "UTF-8").as("features"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      ExtTypes.serializedField("features", TfExampleSerializer.Name)))
    val loc = java.nio.file.Files.createTempDirectory("graft_tfex_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, schema, Seq("doc_id"), Seq("features"))
    ds.append(docs)

    // on-disk record payloads are genuine proto bytes (start with the
    // Example.features LEN tag), not JSON
    val recDir = new java.io.File(s"$loc/data/records")
    val onDisk = spark.read.parquet(recDir.listFiles().map(_.getAbsolutePath).toIndexedSeq: _*)
      .select("value").limit(1).collect()(0).getAs[Array[Byte]](0)
    assert(onDisk(0) == 0x0A.toByte, "record file does not hold Example proto bytes")

    // logical read returns the canonical JSON with both features intact
    val back = ds.readAll()
      .select(col("doc_id"), decode(col("features"), "UTF-8").as("f"))
      .withColumn("id_back", expr("CAST(get_json_object(f, '$.id[0]') AS BIGINT)"))
    assert(back.count() == 50)
    assert(back.filter(col("id_back") =!= col("doc_id")).isEmpty)
  }

  test("FeaturesDict: nested spec round-trips schema-checked (golden)") {
    import graft.format.{TfFeaturesDictSerializer, TfFeaturesSpec, TfLeaf, TfDict}
    // the reference contract (tf_features.py:29-64): a declared nested
    // FeaturesDict; serialized Examples use '/'-flattened keys
    val spec = TfFeaturesSpec(
      "doc" -> TfDict(
        "title" -> TfLeaf("string"),
        "tokens" -> TfLeaf("int64", Seq(3))),
      "emb" -> TfLeaf("float32", Seq(2, 2)),
      "image" -> TfLeaf("image"))
    // spec JSON golden + identity through fromJson
    assert(spec.toJson ==
      """{"doc":{"title":{"dtype":"string"},"tokens":{"dtype":"int64","shape":[3]}},""" +
      """"emb":{"dtype":"float32","shape":[2,2]},"image":{"dtype":"image"}}""")
    assert(TfFeaturesSpec.fromJson(spec.toJson) == spec)

    val ser = new TfFeaturesDictSerializer(spec)
    val doc =
      """{"doc":{"title":"hello","tokens":[1,2,3]},""" +
      """"emb":[0.5,1,2.5,3],"image":"base64:iVBO"}"""
    val wire = ser.serialize(json(doc))
    // the flat Example carries '/'-joined keys (golden: decode through
    // the RAW codec, which has no nesting) — and the float32 leaf was
    // coerced to a float_list even for its integer-literal elements
    val flat = new String(TfExampleSerializer.deserialize(wire), StandardCharsets.UTF_8)
    assert(flat ==
      """{"doc/title":["hello"],"doc/tokens":[1,2,3],""" +
      """"emb":[0.5,1.0,2.5,3.0],"image":["base64:iVBO"]}""", flat)
    // schema-checked deserialize re-nests canonically
    val back = new String(ser.deserialize(wire), StandardCharsets.UTF_8)
    assert(back ==
      """{"doc":{"title":["hello"],"tokens":[1,2,3]},""" +
      """"emb":[0.5,1.0,2.5,3.0],"image":["base64:iVBO"]}""", back)
    // fixpoint on wire bytes
    assert(ser.serialize(ser.deserialize(wire)).toSeq == wire.toSeq)
  }

  test("FeaturesDict: schema violations fail loudly in both directions") {
    import graft.format.{TfFeaturesDictSerializer, TfFeaturesSpec, TfLeaf}
    val spec = TfFeaturesSpec(
      "n" -> TfLeaf("int64", Seq(2)),
      "s" -> TfLeaf("string"),
      "v" -> TfLeaf("float32", Seq(-1, 2)))
    val ser = new TfFeaturesDictSerializer(spec)
    def bad(doc: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](ser.serialize(json(doc)))
      assert(e.getMessage.contains(frag), s"$doc -> ${e.getMessage}")
    }
    val ok = """{"n":[1,2],"s":"x","v":[1.0,2.0]}"""
    assert(ser.deserialize(ser.serialize(json(ok))).nonEmpty)
    bad("""{"n":[1,2],"s":"x"}""", "missing=[v]")                       // missing feature
    bad("""{"n":[1,2],"s":"x","v":[1.0,2.0],"zz":[1]}""", "undeclared") // undeclared
    bad("""{"n":[1,2,3],"s":"x","v":[1.0,2.0]}""", "shape [2]")         // wrong count
    bad("""{"n":[1,2],"s":"x","v":[1.0,2.0,3.0]}""", "do not fit")      // -1 dim divisibility
    bad("""{"n":[1,2],"s":["a","b"],"v":[1.0,2.0]}""", "exactly 1")     // scalar arity
    bad("""{"n":[1.5,2],"s":"x","v":[1.0,2.0]}""", "expected int64")    // dtype
    bad("""{"n":[1,2],"s":7,"v":[1.0,2.0]}""", "expected string")       // dtype

    // deserialize validates too: an Example missing a declared feature
    val partial = TfExampleSerializer.serialize(json("""{"n":[1,2],"s":["x"]}"""))
    val e = intercept[IllegalArgumentException](ser.deserialize(partial))
    assert(e.getMessage.contains("missing=[v]"))
  }

  test("FeaturesDict: spec travels in field metadata through a table") {
    import graft.format.{TfFeaturesSpec, TfLeaf, TfDict}
    val spec = TfFeaturesSpec(
      "meta" -> TfDict("id" -> TfLeaf("int64")),
      "text" -> TfLeaf("string"))
    val docs = Tables.read(spark, sfDir, "documents").filter(col("doc_id") < 50L)
      .select(col("doc_id"),
        encode(to_json(struct(
          struct(array(col("doc_id")).as("id")).as("meta"),
          array(col("text")).as("text"))), "UTF-8").as("features"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      ExtTypes.tfFeaturesDictField("features", spec)))
    val loc = java.nio.file.Files.createTempDirectory("graft_tffd_").toString + "/tbl"
    val ds = SpaceDataset.create(spark, loc, schema, Seq("doc_id"), Seq("features"))
    ds.append(docs)

    // a FRESH dataset handle (metadata read back from disk) resolves
    // the spec'd serializer from the field metadata alone — no registry
    val ds2 = SpaceDataset.load(spark, loc)
    val back = ds2.readAll()
      .select(col("doc_id"), decode(col("features"), "UTF-8").as("f"))
      .withColumn("id_back", expr("CAST(get_json_object(f, '$.meta.id[0]') AS BIGINT)"))
    assert(back.count() == 50)
    assert(back.filter(col("id_back") =!= col("doc_id")).isEmpty)

    // and a document violating the spec is rejected at append
    val badRows = docs.limit(1).select(col("doc_id") + 100L,
      encode(to_json(struct(array(col("doc_id")).as("wrong"))), "UTF-8").as("features"))
      .toDF("doc_id", "features")
    val e = intercept[Exception](ds2.append(badRows))
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) String.valueOf(t.getMessage)
      else String.valueOf(t.getMessage) + " | " + rootMsg(t.getCause)
    assert(rootMsg(e).contains("FeaturesDict") || rootMsg(e).contains("missing"),
      rootMsg(e).take(500))
  }

  // wire-building helpers shared by the hand-rolled-bytes tests
  private def lenDelim(field: Int, body: Array[Byte]): Array[Byte] =
    Array(((field << 3) | 2).toByte, body.length.toByte) ++ body
  private def exampleWith(key: String, feature: Array[Byte]): Array[Byte] = {
    val entry = lenDelim(1, key.getBytes(StandardCharsets.UTF_8)) ++
      lenDelim(2, feature)
    lenDelim(1, lenDelim(1, entry))
  }

  test("NaN/Infinity floats round-trip through the base codec") {
    val doc = """{"f":[NaN,Infinity,-Infinity,0.5]}"""
    val wire = TfExampleSerializer.serialize(json(doc))
    val back = new String(TfExampleSerializer.deserialize(wire), StandardCharsets.UTF_8)
    assert(back == doc, back)
    assert(TfExampleSerializer.serialize(json(back)).toSeq == wire.toSeq)
    // the spec'd FeaturesDict serializer cannot represent them in
    // strict JSON — clear rejection, not a jackson crash
    import graft.format.{TfFeaturesDictSerializer, TfFeaturesSpec, TfLeaf}
    val ser = new TfFeaturesDictSerializer(
      TfFeaturesSpec("f" -> TfLeaf("float32", Seq(-1))))
    val e = intercept[IllegalArgumentException](ser.deserialize(wire))
    assert(e.getMessage.contains("non-finite"), e.getMessage)
  }

  test("string features CONTAINING NaN/Infinity text are not rejected") {
    // the non-finite guard is quote-aware: only bare tokens count — a
    // legitimate string value like "[NaN]" or ":Infinity," (or one with
    // an escaped quote before it) must round-trip, not throw
    import graft.format.{TfFeaturesDictSerializer, TfFeaturesSpec, TfLeaf}
    val ser = new TfFeaturesDictSerializer(
      TfFeaturesSpec("s" -> TfLeaf("string"), "x" -> TfLeaf("float32")))
    for (v <- Seq("[NaN]", ":Infinity,", """esc\" NaN""")) {
      val doc = s"""{"s":${org.json4s.jackson.JsonMethods.compact(
        org.json4s.JString(v))},"x":0.5}"""
      val wire = ser.serialize(json(doc))
      val back = new String(ser.deserialize(wire), StandardCharsets.UTF_8)
      assert(back.contains("NaN") || back.contains("Infinity"), back)
    }
    // and the bare-token scanner itself
    assert(TfFeaturesDictSerializer.hasBareNonFinite("""{"f":[NaN]}"""))
    assert(TfFeaturesDictSerializer.hasBareNonFinite("""{"f":-Infinity}"""))
    assert(!TfFeaturesDictSerializer.hasBareNonFinite("""{"f":["NaN"]}"""))
    // escaped quote inside the string must not flip the quote state
    assert(!TfFeaturesDictSerializer.hasBareNonFinite("""{"f":"a\"NaN"}"""))
  }

  test("a verbatim TFDS FeaturesDict.to_json envelope loads and round-trips") {
    import graft.format.{TfFeaturesDictSerializer, TfFeaturesSpec, TfLeaf}
    // envelope text as tensorflow_datasets emits it: proto3 JSON of its
    // feature.proto — per-node pythonClassName + oneof content, int64
    // shape dims rendered as strings
    val envelope =
      """{
        |  "pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
        |  "featuresDict": {
        |    "features": {
        |      "id": {
        |        "pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
        |        "tensor": {"shape": {}, "dtype": "int64", "encoding": "none"}
        |      },
        |      "embedding": {
        |        "pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
        |        "tensor": {"shape": {"dimensions": ["4"]}, "dtype": "float32", "encoding": "none"}
        |      },
        |      "caption": {
        |        "pythonClassName": "tensorflow_datasets.core.features.text_feature.Text",
        |        "text": {}
        |      },
        |      "label": {
        |        "pythonClassName": "tensorflow_datasets.core.features.class_label_feature.ClassLabel",
        |        "classLabel": {"numClasses": "10"}
        |      },
        |      "img": {
        |        "pythonClassName": "tensorflow_datasets.core.features.image_feature.Image",
        |        "image": {"shape": {"dimensions": ["-1", "-1", "3"]}, "dtype": "uint8",
        |                  "encodingFormat": "png"}
        |      },
        |      "tokens": {
        |        "pythonClassName": "tensorflow_datasets.core.features.sequence_feature.Sequence",
        |        "sequence": {
        |          "feature": {
        |            "pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
        |            "tensor": {"shape": {}, "dtype": "int64", "encoding": "none"}
        |          },
        |          "length": "-1"
        |        }
        |      },
        |      "meta": {
        |        "pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
        |        "featuresDict": {"features": {
        |          "source": {
        |            "pythonClassName": "tensorflow_datasets.core.features.text_feature.Text",
        |            "text": {}
        |          }
        |        }}
        |      }
        |    }
        |  }
        |}""".stripMargin
    val spec = TfFeaturesSpec.fromTfdsJson(envelope)
    assert(spec.flat.keySet == Set(
      "caption", "embedding", "id", "img", "label", "meta/source", "tokens"))
    assert(spec.flat("embedding") == TfLeaf("float32", Seq(4)))
    assert(spec.flat("tokens") == TfLeaf("int64", Seq(-1)))
    assert(spec.flat("img") == TfLeaf("image"))
    assert(spec.flat("label") == TfLeaf("int64"))
    assert(spec.flat("id") == TfLeaf("int64"))
    // the generic entry point auto-detects the envelope
    assert(TfFeaturesSpec.fromJson(envelope) == spec)
    // and the translated spec drives a bijective (de)serialize
    val ser = new TfFeaturesDictSerializer(spec)
    val doc = """{"caption":"a cat","embedding":[0.5,1.5,-2.0,3.25],"id":7,""" +
      """"img":"base64:iVBORw==","label":3,"meta":{"source":"web"},"tokens":[1,2,3]}"""
    val wire = ser.serialize(json(doc))
    val back = new String(ser.deserialize(wire), StandardCharsets.UTF_8)
    assert(back.contains(""""meta":{"source":["web"]}"""), back)
    assert(ser.serialize(json(back)).toSeq == wire.toSeq, "re-serialize changed the wire")
    // unsupported nodes name the offending class (Audio/Video became
    // supported in round 10, so the probe uses a genuinely unknown node)
    val bad = envelope.replace(
      "text_feature.Text\",\n            \"text\": {}",
      "dataset_feature.Dataset\",\n            \"dataset\": {}")
    val e = intercept[IllegalArgumentException](TfFeaturesSpec.fromTfdsJson(bad))
    assert(e.getMessage.contains("dataset_feature.Dataset"), e.getMessage)
  }

  test("TFDS coco-tutorial shape: Sequence of dict, BBoxFeature, ClassLabel, bool") {
    import graft.format.{TfFeaturesDictSerializer, TfFeaturesSpec, TfLeaf}
    // the reference's tfds_coco_tutorial FeaturesDict: an image record
    // with a variable-length `objects` Sequence of a dict (area, bbox,
    // id, is_crowd, label) — TFDS serializes it as per-field aligned
    // lists objects/area, objects/bbox, … which is exactly how the
    // translated spec flattens
    val envelope =
      """{
        |  "pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
        |  "featuresDict": {"features": {
        |    "image": {
        |      "pythonClassName": "tensorflow_datasets.core.features.image_feature.Image",
        |      "image": {"shape": {"dimensions": ["-1","-1","3"]}, "dtype": "uint8"}
        |    },
        |    "image_id": {
        |      "pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
        |      "tensor": {"shape": {}, "dtype": "int64", "encoding": "none"}
        |    },
        |    "objects": {
        |      "pythonClassName": "tensorflow_datasets.core.features.sequence_feature.Sequence",
        |      "sequence": {
        |        "feature": {
        |          "pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
        |          "featuresDict": {"features": {
        |            "area": {
        |              "pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
        |              "tensor": {"shape": {}, "dtype": "int64", "encoding": "none"}
        |            },
        |            "bbox": {
        |              "pythonClassName": "tensorflow_datasets.core.features.bounding_boxes.BBoxFeature",
        |              "boundingBox": {}
        |            },
        |            "is_crowd": {
        |              "pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
        |              "tensor": {"shape": {}, "dtype": "bool", "encoding": "none"}
        |            },
        |            "label": {
        |              "pythonClassName": "tensorflow_datasets.core.features.class_label_feature.ClassLabel",
        |              "classLabel": {"numClasses": "80"}
        |            }
        |          }}
        |        },
        |        "length": "-1"
        |      }
        |    }
        |  }}
        |}""".stripMargin
    val spec = TfFeaturesSpec.fromTfdsJson(envelope)
    assert(spec.flat.keySet == Set("image", "image_id", "objects/area",
      "objects/bbox", "objects/is_crowd", "objects/label"))
    assert(spec.flat("objects/area") == TfLeaf("int64", Seq(-1)))
    assert(spec.flat("objects/bbox") == TfLeaf("float32", Seq(-1, 4)))
    assert(spec.flat("objects/is_crowd") == TfLeaf("int64", Seq(-1))) // bool = int64 wire
    assert(spec.flat("objects/label") == TfLeaf("int64", Seq(-1)))
    assert(spec.flat("image") == TfLeaf("image"))
    // a two-object record round-trips bijectively through the wire
    val ser = new TfFeaturesDictSerializer(spec)
    val doc = """{"image":"base64:aGVsbG8=","image_id":42,"objects":{""" +
      """"area":[100,200],"bbox":[0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8],""" +
      """"is_crowd":[0,1],"label":[17,3]}}"""
    val wire = ser.serialize(json(doc))
    val back = new String(ser.deserialize(wire), StandardCharsets.UTF_8)
    assert(ser.serialize(json(back)).toSeq == wire.toSeq, "re-serialize changed the wire")
    assert(back.contains(""""area":[100,200]"""), back)
  }

  test("TFDS Translation envelope: dict of language -> Text; variable variant is aligned lists") {
    import graft.format.{TfFeaturesDictSerializer, TfFeaturesSpec, TfLeaf}
    // the wmt-style features.json TFDS exports for a fixed-language
    // Translation (proto3 JSON of feature.proto's translation node)
    val envelope =
      """{
        |  "pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
        |  "featuresDict": {"features": {
        |    "translation": {
        |      "pythonClassName": "tensorflow_datasets.core.features.translation_feature.Translation",
        |      "translation": {"languages": ["de", "en"]}
        |    },
        |    "id": {
        |      "pythonClassName": "tensorflow_datasets.core.features.tensor_feature.Tensor",
        |      "tensor": {"shape": {}, "dtype": "int64", "encoding": "none"}
        |    }
        |  }}
        |}""".stripMargin
    val spec = TfFeaturesSpec.fromTfdsJson(envelope)
    assert(spec.flat.keySet == Set("id", "translation/de", "translation/en"))
    assert(spec.flat("translation/de") == TfLeaf("string"))
    assert(spec.flat("translation/en") == TfLeaf("string"))
    // a sentence pair round-trips bijectively through the wire
    val ser = new TfFeaturesDictSerializer(spec)
    val doc = """{"id":7,"translation":{"de":"Hallo Welt","en":"Hello world"}}"""
    val wire = ser.serialize(json(doc))
    val back = new String(ser.deserialize(wire), StandardCharsets.UTF_8)
    assert(back.contains(""""de":["Hallo Welt"]"""), back)
    assert(ser.serialize(json(back)).toSeq == wire.toSeq, "re-serialize changed the wire")
    // the variable-language variant is a Sequence({language,
    // translation}) underneath — its wire form is two ALIGNED
    // variable-length string lists, regardless of any languages
    // restriction in the envelope
    val varEnvelope = envelope.replace(
      """"translation": {"languages": ["de", "en"]}""",
      """"translation": {}""")
      .replace("translation_feature.Translation",
        "translation_feature.TranslationVariableLanguages")
    val varSpec = TfFeaturesSpec.fromTfdsJson(varEnvelope)
    assert(varSpec.flat.keySet ==
      Set("id", "translation/language", "translation/translation"))
    assert(varSpec.flat("translation/language") == TfLeaf("string", Seq(-1)))
    val varSer = new TfFeaturesDictSerializer(varSpec)
    val varDoc = """{"id":7,"translation":{"language":["de","en","en"],""" +
      """"translation":["Hallo Welt","Hello world","Hi world"]}}"""
    val varWire = varSer.serialize(json(varDoc))
    val varBack = new String(varSer.deserialize(varWire), StandardCharsets.UTF_8)
    assert(varBack.contains(""""language":["de","en","en"]"""), varBack)
    assert(varBack.contains(""""Hi world""""), varBack)
    assert(varSer.serialize(json(varBack)).toSeq == varWire.toSeq,
      "re-serialize changed the wire")
    // a restricted variable-language envelope (languages given) keeps
    // the SAME aligned-list wire form
    val restricted = envelope.replace("translation_feature.Translation",
      "translation_feature.TranslationVariableLanguages")
    assert(TfFeaturesSpec.fromTfdsJson(restricted).flat.keySet ==
      Set("id", "translation/language", "translation/translation"))
  }

  test("TFDS Audio and Video envelopes translate to their wire forms and round-trip") {
    import graft.format.{TfFeaturesDictSerializer, TfFeaturesSpec, TfLeaf}
    // speech_commands-style Audio (int64 PCM samples, unknown length)
    // plus a Video clip (Sequence(Image) underneath: a variable-length
    // list of ENCODED frame payloads — H/W/C live inside each frame)
    val envelope =
      """{
        |  "pythonClassName": "tensorflow_datasets.core.features.features_dict.FeaturesDict",
        |  "featuresDict": {"features": {
        |    "audio": {
        |      "pythonClassName": "tensorflow_datasets.core.features.audio_feature.Audio",
        |      "audio": {"shape": {"dimensions": ["-1"]}, "dtype": "int64", "sampleRate": 16000}
        |    },
        |    "clip": {
        |      "pythonClassName": "tensorflow_datasets.core.features.video_feature.Video",
        |      "video": {"shape": {"dimensions": ["-1", "64", "64", "3"]}}
        |    },
        |    "label": {
        |      "pythonClassName": "tensorflow_datasets.core.features.class_label_feature.ClassLabel",
        |      "classLabel": {"numClasses": 12}
        |    }
        |  }}
        |}""".stripMargin
    val spec = TfFeaturesSpec.fromTfdsJson(envelope)
    assert(spec.flat("audio") == TfLeaf("int64", Seq(-1)))
    assert(spec.flat("clip") == TfLeaf("image", Seq(-1)))
    assert(spec.flat("label") == TfLeaf("int64"))

    // frame payloads with non-UTF-8 bytes (0xFF lead) keep the base64:
    // form through the round-trip
    val ser = new TfFeaturesDictSerializer(spec)
    val doc = """{"audio":[12,-7,0,44,13],"clip":["base64:/wAB","base64:/wID"],"label":3}"""
    val wire = ser.serialize(json(doc))
    val back = new String(ser.deserialize(wire), StandardCharsets.UTF_8)
    assert(back.contains(""""audio":[12,-7,0,44,13]"""), back)
    assert(back.contains(""""base64:/wID""""), back)
    assert(ser.serialize(json(back)).toSeq == wire.toSeq, "re-serialize changed the wire")

    // float audio (e.g. normalized samples) maps to the float32 wire
    // list; absent shape defaults to (None,)
    val floatEnv = envelope
      .replace(""""shape": {"dimensions": ["-1"]}, "dtype": "int64", "sampleRate": 16000""",
        """"dtype": "float64", "sampleRate": 16000""")
    assert(TfFeaturesSpec.fromTfdsJson(floatEnv).flat("audio") == TfLeaf("float32", Seq(-1)))

    // a FIXED-length video validates its frame count
    val fixedEnv = envelope.replace(""""dimensions": ["-1", "64", "64", "3"]""",
      """"dimensions": ["2", "64", "64", "3"]""")
    val fixedSer = new TfFeaturesDictSerializer(TfFeaturesSpec.fromTfdsJson(fixedEnv))
    fixedSer.serialize(json(doc)) // 2 frames: fits
    val bad = doc.replace(""","clip":["base64:/wAB","base64:/wID"]""",
      ""","clip":["base64:/wAB"]""")
    val e = intercept[IllegalArgumentException](fixedSer.serialize(json(bad)))
    assert(e.getMessage.contains("clip"), e.getMessage)
  }

  test("FeaturesDict: an empty tensor fits a -1 (None) dim") {
    import graft.format.{TfFeaturesDictSerializer, TfFeaturesSpec, TfLeaf}
    val ser = new TfFeaturesDictSerializer(
      TfFeaturesSpec("v" -> TfLeaf("float32", Seq(-1, 2)), "s" -> TfLeaf("string")))
    val wire = ser.serialize(json("""{"v":[],"s":"x"}"""))
    val back = new String(ser.deserialize(wire), StandardCharsets.UTF_8)
    assert(back == """{"s":["x"],"v":[]}""", back)
  }

  test("non-UTF-8 byte payloads round-trip via the base64: form") {
    // an Example with a bytes_list holding raw PNG-ish bytes
    val raw = Array(0x89.toByte, 0x50.toByte, 0x4E.toByte, 0xFF.toByte, 0x00.toByte)
    val example = exampleWith("img", lenDelim(1, lenDelim(1, raw)))
    val json = new String(TfExampleSerializer.deserialize(example),
      StandardCharsets.UTF_8)
    val b64 = java.util.Base64.getEncoder.encodeToString(raw)
    assert(json == s"""{"img":["base64:$b64"]}""", json)
    // and serialize restores the EXACT original bytes (identity on wire)
    assert(TfExampleSerializer.serialize(json.getBytes(StandardCharsets.UTF_8))
      .toSeq == example.toSeq)
    // a literal string that happens to carry the prefix stays bijective
    val lit = """{"k":["base64:aGk="]}""" // decodes to "hi"
    val rt = new String(TfExampleSerializer.deserialize(
      TfExampleSerializer.serialize(lit.getBytes(StandardCharsets.UTF_8))),
      StandardCharsets.UTF_8)
    assert(rt == """{"k":["hi"]}""", rt) // canonical form of the same bytes
  }

  test("unpacked repeated int64/float list encodings are accepted") {
    // Int64List{value: 1, 2, 300} UNPACKED: three varint fields (wire 0)
    val unpackedInts = Array(
      (1 << 3).toByte, 1.toByte,
      (1 << 3).toByte, 2.toByte,
      (1 << 3).toByte, 0xAC.toByte, 0x02.toByte) // 300 varint
    val intFeature = lenDelim(3, unpackedInts)
    // FloatList{value: 1.5f} UNPACKED: one fixed32 field (wire 5)
    val bb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(1.5f)
    val unpackedFloat = Array(((1 << 3) | 5).toByte) ++ bb.array()
    val floatFeature = lenDelim(2, unpackedFloat)
    val ints = new String(TfExampleSerializer.deserialize(
      exampleWith("n", intFeature)), StandardCharsets.UTF_8)
    assert(ints == """{"n":[1,2,300]}""", ints)
    val floats = new String(TfExampleSerializer.deserialize(
      exampleWith("f", floatFeature)), StandardCharsets.UTF_8)
    assert(floats == """{"f":[1.5]}""", floats)
  }

  test("a literal string merely starting with base64: stays a literal") {
    // written by the pre-prefix codec: NOT valid base64 after the colon
    val json = """{"note":["base64: see attachment"]}"""
    val wire = TfExampleSerializer.serialize(json.getBytes(StandardCharsets.UTF_8))
    val back = new String(TfExampleSerializer.deserialize(wire), StandardCharsets.UTF_8)
    // canonical form re-encodes the reserved prefix through base64, but
    // the BYTES round-trip losslessly (serialize of the canonical form
    // restores the identical wire bytes)
    val b64 = java.util.Base64.getEncoder
      .encodeToString("base64: see attachment".getBytes(StandardCharsets.UTF_8))
    assert(back == s"""{"note":["base64:$b64"]}""", back)
    assert(TfExampleSerializer.serialize(back.getBytes(StandardCharsets.UTF_8))
      .toSeq == wire.toSeq)
  }

  test("truncated wire bytes fail loudly instead of zero-padding") {
    val raw = Array(0x89.toByte, 0xFF.toByte, 0x01.toByte)
    val example = exampleWith("img", lenDelim(1, lenDelim(1, raw)))
    val truncated = example.dropRight(2) // cut into the declared payload
    val e = intercept[IllegalArgumentException](
      TfExampleSerializer.deserialize(truncated))
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }
}
