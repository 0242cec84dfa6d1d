package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Makes float/double ±0.0 predicates SOUND through parquet pushdown.
  *
  * Spark SQL evaluates `-0.0 = 0.0` as true, but parquet-mr's row-group
  * filters disagree: the stats filter compares with the TYPE-DEFINED
  * TOTAL ORDER (where `-0.0 < +0.0`) and the dictionary filter probes a
  * boxed set (where `Double.equals(-0.0, 0.0)` is false). A pushed
  * `v = 0.0` therefore DROPS every row group whose zeros are all stored
  * as `-0.0` — vanilla Spark silently returns no rows for them
  * (reproduced on Spark 4.1 / parquet-mr: a dict-encoded file of
  * {-0.0, 1.5, 2.5} answers `v = 0.0` with 0 rows pushed, 1000 rows
  * unpushed). The same total-order skew makes `v >= 0.0` lose
  * `-0.0`-only groups and `v <= -0.0` lose `+0.0`-only groups.
  *
  * The fix is a semantics-preserving predicate rewrite, applied to
  * every Filter condition before pushdown:
  *
  *  - `v = ±0.0`  →  `v >= -0.0 AND v <= +0.0` (the closed range holds
  *    exactly the two zero encodings in BOTH orders: primitively the
  *    bounds collapse to `= 0`, and under parquet's total order the
  *    range straddles both bit patterns, so no tier can drop a
  *    zero-bearing group). NaN stays excluded: Spark orders NaN above
  *    every value, so `NaN <= +0.0` is false. Null propagates as
  *    before (`null AND null = null`).
  *  - `v <=> ±0.0` → `IsNotNull(v) AND range` (false, not null, on
  *    null input — survives negation contexts like `NOT(v <=> 0.0)`).
  *  - `v IN (…, ±0.0, …)` / InSet → zero candidates split out into the
  *    range, rest keep the IN (null/absent semantics line up: the OR
  *    of a null IN and a false range is null, as before).
  *  - `v >= +0.0` → `v >= -0.0`; `v <= -0.0` → `v <= +0.0` (widen the
  *    bound to the total-order-smaller/larger zero; primitively equal
  *    literals, so row results are untouched).
  *
  * Strict bounds (`>`, `<`) and mixed-sign bounds are already sound —
  * their primitive match set coincides with the total-order one on
  * every input including zeros and NaN — and are left alone. Rewrites
  * only fire on deterministic left sides (duplicating a
  * non-deterministic expression would change its evaluation count).
  *
  * Installed by [[graft.GraftExtensions]]; [[graft.core.ReadOp]] also
  * applies [[rewrite]] directly to `read(filter=…)` predicates so the
  * dataset API is sound even on sessions built without the extension.
  * The rewrite is idempotent (results only contain the already-sound
  * bound forms), so running both is harmless.
  */
object FloatingZeroRewrite extends Rule[LogicalPlan] {

  /** NOTE: Catalyst's `Literal.equals` itself treats -0.0 and +0.0 as
    * EQUAL, so a rewritten condition `fastEquals` the original — guards
    * and convergence checks must not use equality to detect the
    * rewrite. We gate on "mentions a float/double zero literal" instead
    * and rebuild unconditionally (the rewrite is a fixed point of
    * itself, so the batch still converges). */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f: Filter if mentionsFpZero(f.condition) =>
      f.copy(condition = rewrite(f.condition))
  }

  /** Cheap pre-check: any ±0.0 float/double value anywhere? (InSet
    * carries raw values, not Literal children.) */
  def mentionsFpZero(e: Expression): Boolean =
    e.exists {
      case l: Literal => isZeroLit(l)
      case InSet(_, hset) => hset.exists(anyZero)
      case _ => false
    }

  /** True for either encoding of zero of a float/double literal. */
  private def isZeroLit(e: Expression): Boolean = e match {
    case Literal(f: Float, FloatType) => f == 0.0f
    case Literal(d: Double, DoubleType) => d == 0.0d
    case _ => false
  }
  /** +0.0 exactly (raw bits), the total-order-LARGER zero. */
  private def isPosZeroLit(e: Expression): Boolean = e match {
    case Literal(f: Float, FloatType) => java.lang.Float.floatToRawIntBits(f) == 0
    case Literal(d: Double, DoubleType) => java.lang.Double.doubleToRawLongBits(d) == 0L
    case _ => false
  }
  /** -0.0 exactly (raw bits), the total-order-SMALLER zero. */
  private def isNegZeroLit(e: Expression): Boolean =
    isZeroLit(e) && !isPosZeroLit(e)

  /** [-0.0, +0.0] in the zero literal's own type. */
  private def zeroRange(a: Expression, z: Expression): Expression = {
    val (neg, pos) = z.dataType match {
      case FloatType => (Literal(-0.0f), Literal(0.0f))
      case _ => (Literal(-0.0d), Literal(0.0d))
    }
    And(GreaterThanOrEqual(a, neg), LessThanOrEqual(a, pos))
  }
  private def flipZero(z: Expression): Literal = z.dataType match {
    case FloatType => if (isPosZeroLit(z)) Literal(-0.0f) else Literal(0.0f)
    case _ => if (isPosZeroLit(z)) Literal(-0.0d) else Literal(0.0d)
  }

  /** Column-API predicates arrive PRE-analysis as UnresolvedFunction
    * nodes ('`>=`('v, 0.0)); resolve the comparison/boolean shells to
    * their typed forms first so the rewrite can see them. This is the
    * same normalization the membership-pruning planner applies — the
    * analyzer resolves these functions to exactly these operators. */
  private def norm(e: Expression): Expression = e match {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      (f.nameParts.map(_.toLowerCase).mkString("."), f.arguments) match {
        case ("=", Seq(l, r)) => EqualTo(norm(l), norm(r))
        case ("==", Seq(l, r)) => EqualTo(norm(l), norm(r))
        case ("<=>", Seq(l, r)) => EqualNullSafe(norm(l), norm(r))
        case (">=", Seq(l, r)) => GreaterThanOrEqual(norm(l), norm(r))
        case ("<=", Seq(l, r)) => LessThanOrEqual(norm(l), norm(r))
        case (">", Seq(l, r)) => GreaterThan(norm(l), norm(r))
        case ("<", Seq(l, r)) => LessThan(norm(l), norm(r))
        case ("and", Seq(l, r)) => And(norm(l), norm(r))
        case ("or", Seq(l, r)) => Or(norm(l), norm(r))
        case ("not", Seq(c)) => Not(norm(c))
        case ("in", a +: vs) if vs.nonEmpty => In(norm(a), vs.map(norm))
        case _ => e.mapChildren(norm)
      }
    case _ => e.mapChildren(norm)
  }

  /** Normalize-then-rewrite for pre-analysis predicates (dataset API). */
  def rewriteUnresolved(cond: Expression): Expression =
    if (mentionsFpZero(cond)) rewrite(norm(cond)) else cond

  def rewrite(cond: Expression): Expression = cond.transformUp {
    case EqualTo(a, z) if isZeroLit(z) && a.deterministic => zeroRange(a, z)
    case EqualTo(z, a) if isZeroLit(z) && a.deterministic => zeroRange(a, z)
    case EqualNullSafe(a, z) if isZeroLit(z) && a.deterministic =>
      And(IsNotNull(a), zeroRange(a, z))
    case EqualNullSafe(z, a) if isZeroLit(z) && a.deterministic =>
      And(IsNotNull(a), zeroRange(a, z))
    case In(a, list) if a.deterministic && list.exists(isZeroLit) =>
      val (zeros, rest) = list.partition(isZeroLit)
      val r = zeroRange(a, zeros.head)
      if (rest.isEmpty) r else Or(In(a, rest), r)
    case InSet(a, hset) if a.deterministic && hset.exists(anyZero) =>
      val rest = hset.filterNot(anyZero)
      val r = a.dataType match {
        case FloatType => zeroRange(a, Literal(0.0f))
        case _ => zeroRange(a, Literal(0.0d))
      }
      if (rest.isEmpty) r else Or(InSet(a, rest), r)
    // Total-order-unsound inclusive bounds: widen to the equal-valued
    // opposite-sign zero (a >= +0.0 must admit stored -0.0; a <= -0.0
    // must admit stored +0.0). The widened form MUST be structurally
    // different from the input — Catalyst's Literal.equals treats ±0.0
    // as EQUAL, so an in-place literal flip `fastEquals` the original
    // and every enclosing TreeNode.mapChildren keeps the OLD child,
    // silently discarding the rewrite. `NOT(a < -0.0)` is the
    // negation-equivalent (NaN: Spark orders it above all values, so
    // `NaN < -0.0` is false and the NOT yields true, matching
    // `NaN >= 0.0`; null propagates through both forms); Spark's own
    // BooleanSimplification later collapses it to `a >= -0.0` as a
    // structural change that survives, and un-simplified it still
    // pushes down soundly as not(lt).
    case GreaterThanOrEqual(a, z) if isPosZeroLit(z) =>
      Not(LessThan(a, flipZero(z)))
    case LessThanOrEqual(a, z) if isNegZeroLit(z) =>
      Not(GreaterThan(a, flipZero(z)))
    case GreaterThanOrEqual(z, a) if isNegZeroLit(z) => // -0.0 >= a ≡ a <= -0.0
      Not(GreaterThan(a, flipZero(z)))
    case LessThanOrEqual(z, a) if isPosZeroLit(z) => // +0.0 <= a ≡ a >= +0.0
      Not(LessThan(a, flipZero(z)))
  }

  private def anyZero(v: Any): Boolean = v match {
    case f: java.lang.Float => f.floatValue() == 0.0f
    case d: java.lang.Double => d.doubleValue() == 0.0d
    case _ => false
  }
}
