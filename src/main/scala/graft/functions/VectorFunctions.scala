package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float|double>` embedding columns as pure
  * Column expressions (`zip_with`/`aggregate` are codegen'd; no UDF), so
  * similarity search composes with pushdown/pruning like any projection. */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. Mismatched lengths FAIL LOUDLY:
    * `zip_with` pads the shorter side with nulls, which would make the
    * product NULL and every downstream `cosine >= threshold` verify
    * filter silently DROP the pair — silent recall loss from one
    * truncated embedding (the LSH sketch kernels already throw on this;
    * the exact-verify path must match). Null ARRAYS still flow through
    * as null, unchanged. */
  def dot(a: Column, b: Column): Column = {
    val mismatch = size(a).isNotNull && size(b).isNotNull && size(a) =!= size(b)
    when(mismatch, raise_error(concat(
        lit("vector length mismatch: "), size(a).cast("string"),
        lit(" vs "), size(b).cast("string"))).cast("double"))
      .otherwise(aggregate(
        zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; 0 for zero vectors. The
    * numerator and the norm product are each [[TextFunctions.bound]] so
    * they evaluate once — and binding the NUMERATOR (not just the
    * norms) also means the mismatched-length check in [[dot]] always
    * fires: a `when(d === 0, 0.0)` over only the norms would
    * short-circuit past it for zero vectors, silently passing a
    * mismatched pair as score 0. */
  def cosine(a: Column, b: Column): Column =
    TextFunctions.bound(dot(a, b)) { num =>
      TextFunctions.bound(norm(a) * norm(b)) { d =>
        when(d === 0.0, lit(0.0)).otherwise(num / d)
      }
    }

  /** Sign-bit sketch against `planes` (array of array<double>): bit i set
    * iff dot(v, planes[i]) >= 0. Random-hyperplane LSH: P(bits equal) =
    * 1 - θ/π, so near-duplicate vectors collide with high probability.
    * Native single-pass expression — the per-plane HOF formulation spends
    * seconds in analysis/codegen on a 64-plane sketch. */
  def hyperplaneSketch(v: Column, planes: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.graftshim.HyperplaneSketchExpr(v, planes)

  /** Deterministic pseudo-random unit-free hyperplanes (seeded LCG —
    * stable across runs/JVMs so sketches are reproducible). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var state = seed
    def next(): Double = {
      // LCG (Numerical Recipes constants), mapped to [-1, 1)
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(numPlanes)(Seq.fill(dim)(next()))
  }
}
