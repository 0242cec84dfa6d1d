package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.views._

class SubstraitSpec extends AnyFunSuite {
  import TestSpark._

  test("read-only plan matches the hand-computed substrait wire bytes") {
    // Plan{relations(3): PlanRel{root(2): RelRoot{input(1): Rel{read(1):
    //   ReadRel{named_table(7): NamedTable{names(1): "t"}}}}}}
    val expected = Array(
      0x1A, 0x0B,             // Plan.relations, len 11
      0x12, 0x09,             //   PlanRel.root, len 9
      0x0A, 0x07,             //     RelRoot.input, len 7
      0x0A, 0x05,             //       Rel.read, len 5
      0x3A, 0x03,             //         ReadRel.named_table, len 3
      0x0A, 0x01, 0x74        //           NamedTable.names = "t"
    ).map(_.toByte)
    assert(SubstraitPlans.encode(ReadTable("t")).toSeq == expected.toSeq)
  }

  test("read → filter → map chain round-trips through substrait bytes") {
    val plan = MapNode("select_exprs", Map("exprs" -> "doc_id;;n_chars * 2 AS n2"),
      FilterNode("filter_expr", Map("expr" -> "n_chars > 100"),
        ReadTable("/tmp/some/table")))
    val bytes = SubstraitPlans.encode(plan)
    assert(SubstraitPlans.decode(bytes) == plan)
    // base64 path too (what the metadata stores)
    assert(SubstraitPlans.decodeBase64(SubstraitPlans.encodeBase64(plan)) == plan)
  }

  test("params with '=' in the value survive the enum-arg encoding") {
    val plan = FilterNode("filter_expr", Map("expr" -> "a = 1 AND b >= 2"),
      ReadTable("t"))
    assert(SubstraitPlans.decode(SubstraitPlans.encode(plan)) == plan)
  }

  test("anchors follow the reference builder: one URI decl per function, both from 1") {
    val plan = MapNode("m2", Map.empty,
      FilterNode("f1", Map.empty, ReadTable("t")))
    val bytes = SubstraitPlans.encode(plan)
    // walk-order registration: the outer map registers first (anchor 1),
    // the inner filter second (anchor 2) — mirror what decode resolves
    val round = SubstraitPlans.decode(bytes)
    assert(round == plan)
    // the wire must carry exactly two extension_uris (field 1) and two
    // extension declarations (field 2)
    def countTopLevel(field: Int): Int = {
      var i = 0; var n = 0
      def varint(): Long = {
        var v = 0L; var s = 0
        while ({ val b = bytes(i); i += 1; v |= (b & 0x7fL) << s; s += 7
                 (b & 0x80) != 0 }) ()
        v
      }
      while (i < bytes.length) {
        val t = varint(); val f = (t >>> 3).toInt
        assert((t & 7) == 2)
        val len = varint().toInt
        i += len
        if (f == field) n += 1
      }
      n
    }
    assert(countTopLevel(1) == 2, "extension_uris")
    assert(countTopLevel(2) == 2, "extensions")
    assert(countTopLevel(3) == 1, "relations")
  }

  test("base_schema rides in ReadRel and is transparent to the loader") {
    import org.apache.spark.sql.types._
    val schema = graft.format.FieldIds.assign(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("txt", StringType),
      StructField("meta", StructType(Seq(
        StructField("w", IntegerType), StructField("v", DoubleType)))),
      StructField("emb", ArrayType(FloatType)))))
    val plan = FilterNode("filter_expr", Map("expr" -> "id > 0"), ReadTable("t"))
    val bytes = SubstraitPlans.encode(plan, loc => Some(schema))
    // DFS names: list items contribute no name (schema/substrait.py:48-50)
    assert(SubstraitPlans.baseSchemaNames(bytes).contains(
      Seq("id", "txt", "meta", "w", "v", "emb")))
    // the loader reads only named_table — decode is unaffected
    assert(SubstraitPlans.decode(bytes) == plan)
    // without a schema resolver there is no base_schema
    assert(SubstraitPlans.baseSchemaNames(SubstraitPlans.encode(plan)).isEmpty)
  }

  test("fuzz: random read/filter/map chains with adversarial params round-trip") {
    val rnd = new scala.util.Random(7)
    def randString(n: Int): String =
      (1 to n).map(_ => rnd.nextPrintableChar()).mkString +
        (if (rnd.nextBoolean()) "=;\n\"\\🦉" else "") // separators, quotes, utf-8
    for (trial <- 1 to 50) {
      var plan: ViewPlan = ReadTable("/t/" + randString(rnd.nextInt(30)))
      for (_ <- 0 until rnd.nextInt(6)) {
        val params = (0 until rnd.nextInt(4))
          .map(i => s"k$i${randString(3)}" -> randString(rnd.nextInt(40))).toMap
        plan =
          if (rnd.nextBoolean()) MapNode("m" + randString(5), params, plan)
          else FilterNode("f" + randString(5), params, plan)
      }
      val back = SubstraitPlans.decode(SubstraitPlans.encode(plan))
      assert(back == plan, s"trial $trial: $plan vs $back")
    }
  }

  test("join plans refuse substrait encoding, like the reference loader") {
    val j = JoinNode(ReadTable("a"), ReadTable("b"), "k")
    assertThrows[UnsupportedOperationException](SubstraitPlans.encode(j))
  }

  test("materialized view persists the substrait sidecar and loads from it alone") {
    import org.apache.spark.sql.functions._
    val loc = java.nio.file.Files.createTempDirectory("graft_subst_").toString
    val src = Tables.read(spark, sfDir, "documents").limit(50)
    val srcDs = graft.core.SpaceDataset.create(
      spark, s"$loc/src", src.schema, Seq("doc_id"))
    srcDs.append(src)
    val v = View.ofDataset(srcDs)
      .filterExpr("n_chars > 100")
      .selectExprs("doc_id", "n_chars")
    val mv = v.materialize(spark, s"$loc/mv", Seq("doc_id"))
    val meta = mv.dataset.storage.metadata
    assert(meta.logicalPlanSubstrait.isDefined)
    // the sidecar carries the SOURCE table's schema as base_schema
    val wire = java.util.Base64.getDecoder.decode(meta.logicalPlanSubstrait.get)
    assert(SubstraitPlans.baseSchemaNames(wire)
      .contains(src.schema.fieldNames.toSeq))
    // the sidecar alone reconstructs the identical plan
    val fromWire = SubstraitPlans.decodeBase64(meta.logicalPlanSubstrait.get)
    assert(fromWire == mv.plan)
    // and a plan-equivalent MV loaded from the wire bytes computes the
    // same rows as the JSON-loaded one
    val a = new View(fromWire).toDF(spark)
    val b = mv.view.toDF(spark)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
