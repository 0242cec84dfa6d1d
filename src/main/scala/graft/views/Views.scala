package graft.views

import scala.collection.concurrent.TrieMap

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.core.SpaceDataset

/** Lazy transform DAG over datasets (reference `View`
  * `/root/reference/python/src/space/core/views.py:42-244`): map / filter
  * / one-key join nodes compiling to DataFrame lineage.
  *
  * Plan persistence: the reference cloudpickles Python UDFs
  * (transform/plans.py:55-66); Scala closures cannot be persisted, so a
  * transform is either (a) one of the built-in expression transforms
  * (`select_exprs`, `filter_expr` — arbitrary Spark SQL expressions,
  * fully serializable) or (b) a named class registered in
  * [[TransformRegistry]] / loadable by FQCN. This is the documented
  * semantic deviation of SURVEY.md §7.3 "UDF persistence".
  *
  * The plan serializes to a compact JSON tree (read/map/filter/join
  * nodes) instead of Substrait — plan round-trip fidelity is what the
  * reference's tests pin down, not the wire format (SURVEY.md §2.6).
  */
sealed trait ViewPlan {
  /** Compile to a DataFrame reading CURRENT source state. */
  def toDF(spark: SparkSession): DataFrame = this match {
    case ReadTable(location) => SpaceDataset.load(spark, location).readAll()
    case MapNode(name, params, input) =>
      TransformRegistry.resolve(name).apply(input.toDF(spark), params)
    case FilterNode(name, params, input) =>
      TransformRegistry.resolve(name).apply(input.toDF(spark), params)
    case j: JoinNode => JoinExec.run(spark, j)
  }

  /** Apply only the TRANSFORM pipeline of this view to a change batch
    * coming from the (single) source table — `process_source`
    * (udfs.py:102-104). Join views cannot process changes
    * (transform/join.py:108-109: reference raises the same). */
  def processSource(spark: SparkSession, batch: DataFrame): DataFrame = this match {
    case ReadTable(_) => batch
    case MapNode(name, params, input) =>
      TransformRegistry.resolve(name).apply(input.processSource(spark, batch), params)
    case FilterNode(name, params, input) =>
      TransformRegistry.resolve(name).apply(input.processSource(spark, batch), params)
    case _: JoinNode =>
      throw new UnsupportedOperationException("join views do not support incremental refresh")
  }

  /** The single source table location (for refresh); fails on joins. */
  def sourceLocation: String = this match {
    case ReadTable(l) => l
    case MapNode(_, _, i) => i.sourceLocation
    case FilterNode(_, _, i) => i.sourceLocation
    case _: JoinNode =>
      throw new UnsupportedOperationException("join views have no single source")
  }

  def containsJoin: Boolean = this match {
    case ReadTable(_) => false
    case MapNode(_, _, i) => i.containsJoin
    case FilterNode(_, _, i) => i.containsJoin
    case _: JoinNode => true
  }

  def json: String = JsonMethods.compact(JsonMethods.render(ViewPlan.toJValue(this)))
}

final case class ReadTable(location: String) extends ViewPlan
final case class MapNode(transform: String, params: Map[String, String], input: ViewPlan) extends ViewPlan
final case class FilterNode(transform: String, params: Map[String, String], input: ViewPlan) extends ViewPlan

/** One-key join with per-side field selection and `reference_read`
  * (views.py:183-224): a side with referenceRead=true keeps record-field
  * ADDRESS structs in the output instead of payloads. `None` fields =
  * all fields of that side. */
final case class JoinNode(
    left: ViewPlan,
    right: ViewPlan,
    key: String,
    leftFields: Option[List[String]] = None,
    rightFields: Option[List[String]] = None,
    leftReferenceRead: Boolean = false,
    rightReferenceRead: Boolean = false) extends ViewPlan

object ViewPlan {

  def toJValue(p: ViewPlan): JValue = p match {
    case ReadTable(l) => JObject("type" -> JString("read"), "location" -> JString(l))
    case MapNode(n, ps, i) => JObject("type" -> JString("map"), "name" -> JString(n),
      "params" -> JObject(ps.toList.map { case (k, v) => k -> (JString(v): JValue) }),
      "input" -> toJValue(i))
    case FilterNode(n, ps, i) => JObject("type" -> JString("filter"), "name" -> JString(n),
      "params" -> JObject(ps.toList.map { case (k, v) => k -> (JString(v): JValue) }),
      "input" -> toJValue(i))
    case JoinNode(l, r, k, lf, rf, lref, rref) => JObject(List(
      "type" -> (JString("join"): JValue),
      "left" -> toJValue(l), "right" -> toJValue(r), "key" -> JString(k)) ++
      lf.map(f => "left_fields" -> (JArray(f.map(JString(_))): JValue)).toList ++
      rf.map(f => "right_fields" -> (JArray(f.map(JString(_))): JValue)).toList ++
      (if (lref) List("left_reference_read" -> (JBool(true): JValue)) else Nil) ++
      (if (rref) List("right_reference_read" -> (JBool(true): JValue)) else Nil))
  }

  /** `load_view` analog (udfs.py:249-266): unknown node type → error. */
  def fromJson(s: String): ViewPlan = fromJValue(JsonMethods.parse(s))

  private def fromJValue(j: JValue): ViewPlan = {
    def str(f: String): String = (j \ f) match {
      case JString(v) => v
      case other => throw new IllegalArgumentException(s"bad plan field $f: $other")
    }
    def params: Map[String, String] = (j \ "params") match {
      case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }
    str("type") match {
      case "read" => ReadTable(str("location"))
      case "map" => MapNode(str("name"), params, fromJValue(j \ "input"))
      case "filter" => FilterNode(str("name"), params, fromJValue(j \ "input"))
      case "join" =>
        def fieldList(name: String): Option[List[String]] = (j \ name) match {
          case JArray(vs) => Some(vs.collect { case JString(v) => v })
          case _ => None
        }
        def bool(name: String): Boolean = (j \ name) match {
          case JBool(v) => v
          case _ => false
        }
        JoinNode(fromJValue(j \ "left"), fromJValue(j \ "right"), str("key"),
          fieldList("left_fields"), fieldList("right_fields"),
          bool("left_reference_read"), bool("right_reference_read"))
      case other => throw new IllegalArgumentException(s"unknown plan node: $other")
    }
  }
}

/** A named, persistable DataFrame transform. Implementations must be
  * stateless; params carry all configuration. */
trait Transform extends Serializable {
  def apply(df: DataFrame, params: Map[String, String]): DataFrame
}

/** Registry of persistable transforms (the Scala answer to the
  * reference's pickled-UDF registry, metadata.proto:195-202). Names with
  * dots resolve as FQCNs of [[Transform]] classes. */
object TransformRegistry {
  private val registry = TrieMap.empty[String, Transform]

  // percent-escape each expression before joining with ";;": a literal
  // ';' inside an expression (e.g. concat(a, ';;', b)) would otherwise
  // corrupt the persisted plan when split back. Escaping removes every
  // raw ';' from the parts, so the delimiter can never appear inside one.
  private[views] def escExpr(e: String): String =
    e.replace("%", "%25").replace(";", "%3B")
  private[views] def unescExpr(e: String): String =
    e.replace("%3B", ";").replace("%25", "%")

  // `escaped=1` marks plans whose parts were percent-escaped at write
  // time; without it the parts are taken verbatim — so a plan persisted
  // before escaping existed keeps its meaning on replay instead of
  // being "unescaped". Plans written by the one intermediate build that
  // escaped WITHOUT writing the flag are indistinguishable from a
  // pre-escaping plan whose expression contains a literal '%3B'/'%25':
  // executing either reading would silently change ONE of them (a ';'
  // replays as a selectExpr parse error; a '%' literal shifts value).
  // There is no marker to dispatch on, so an unflagged expr carrying
  // either sequence REFUSES to run — re-materialize the view from its
  // definition to get a flagged plan.
  register("select_exprs", (df, params) => {
    val parts = params("exprs").split(";;").toIndexedSeq
    if (!params.get("escaped").contains("1")) {
      val tainted = parts.filter(p => p.contains("%3B") || p.contains("%25"))
      if (tainted.nonEmpty) throw new IllegalStateException(
        "select_exprs plan has no 'escaped' flag but contains the escape " +
          s"sequence %3B/%25 in: ${tainted.mkString(", ")} — it was either " +
          "written by a build that escaped without flagging (unescaping is " +
          "required) or contains those characters literally (unescaping " +
          "would corrupt it). Cannot tell apart; re-materialize this view " +
          "so the plan is persisted with escaped=1.")
    }
    df.selectExpr(
      (if (params.get("escaped").contains("1")) parts.map(unescExpr) else parts): _*)
  })
  register("filter_expr", (df, params) => df.filter(expr(params("expr"))))

  def register(name: String, t: (DataFrame, Map[String, String]) => DataFrame): Unit =
    registry.put(name, new Transform {
      def apply(df: DataFrame, params: Map[String, String]): DataFrame = t(df, params)
    })

  def resolve(name: String): Transform =
    registry.get(name).orElse(loadClass(name)).getOrElse {
      // a view materialized by the Python reference persists its UDF as
      // a cloudpickle blob (metadata.proto:195-202, transform/udfs.py:
      // 216-246) — unexecutable on a JVM by construction. Name the
      // conversion path instead of failing generically.
      val hint =
        if (name.endsWith(".pkl") || name.toLowerCase.contains("pickle"))
          " — this view's transform is a cloudpickled Python UDF, which " +
            "cannot execute on the JVM. Re-materialize the view with a " +
            "registered transform (TransformRegistry.register, or the " +
            "fully-qualified class name of a Transform) over the same " +
            "source table; the source and its snapshots read as-is."
        else
          " (register with TransformRegistry.register(name, fn), or use " +
            "the fully-qualified class name of a Transform)"
      throw new IllegalArgumentException(s"transform $name not registered$hint")
    }

  private def loadClass(name: String): Option[Transform] =
    if (!name.contains(".")) None
    else scala.util.Try(
      Class.forName(name).getDeclaredConstructor().newInstance().asInstanceOf[Transform]
    ).toOption
}

/** Builder-style user API over plans (views.py:126-224). */
final class View(val plan: ViewPlan) {
  def mapTransform(name: String, params: Map[String, String]): View =
    new View(MapNode(name, params, plan))
  def selectExprs(exprs: String*): View =
    mapTransform("select_exprs",
      Map("exprs" -> exprs.map(TransformRegistry.escExpr).mkString(";;"),
        "escaped" -> "1"))
  def filterTransform(name: String, params: Map[String, String]): View =
    new View(FilterNode(name, params, plan))
  def filterExpr(e: String): View =
    filterTransform("filter_expr", Map("expr" -> e))
  /** One-key inner join (views.py:183-224). Each side may project fields
    * (`None` = all; the key is auto-added; at least one non-key field is
    * required) and may ask for `referenceRead`: record fields of that
    * side stay ADDRESS structs in the output instead of payloads. */
  def join(
      other: View,
      key: String,
      leftFields: Option[Seq[String]] = None,
      rightFields: Option[Seq[String]] = None,
      leftReferenceRead: Boolean = false,
      rightReferenceRead: Boolean = false): View =
    new View(JoinNode(plan, other.plan, key,
      leftFields.map(_.toList), rightFields.map(_.toList),
      leftReferenceRead, rightReferenceRead))

  def toDF(spark: SparkSession): DataFrame = plan.toDF(spark)

  /** Create the MV table at `location` and run the initial full
    * computation (views.py:113-123 + first refresh). */
  def materialize(
      spark: SparkSession,
      location: String,
      primaryKeys: Seq[String],
      recordFields: Seq[String] = Nil,
      writeClusterBy: Seq[String] = Nil): MaterializedView = {
    val mv = MaterializedView.create(spark, location, this, primaryKeys,
      recordFields, writeClusterBy)
    mv.refresh()
    mv
  }
}

object View {
  def ofTable(location: String): View = new View(ReadTable(location))
  def ofDataset(ds: SpaceDataset): View = ofTable(ds.location)
}
