package graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.{ColumnExpr, SimHash64Expr, SortedIntersectCount}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{LangId, TextFunctions => TF, VectorFunctions => VF}

/** SQL surface of the graft function library, packaged as a standard
  * `SparkSessionExtensions` injector:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_quality_score(text) FROM docs")
  * }}}
  *
  * Two kinds of entries:
  *  - native Catalyst expressions (`graft_simhash64`,
  *    `graft_sorted_intersect_count`) inject directly;
  *  - `Column`-composition functions (tokens/quality/fingerprint/…)
  *    inject through the Column↔Expression bridge — the SQL function is
  *    exactly the DataFrame-API function, one implementation, and the
  *    whole pipeline stays codegen'd (these compose built-in HOFs; no
  *    UDF boundary anywhere).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => {
          require(exprs.size == arity, s"$name expects $arity argument(s)")
          builder(exprs)
        }))
    }
    // merge-on-read soundness for SQL reads: relations over
    // vector-carrying snapshots swap to the masked read plan. Injected
    // BEFORE the row-level rule so a MERGE SOURCE over a vector-carrying
    // table is masked before the command captures its plan (targets are
    // skipped — their machinery masks internally).
    ext.injectResolutionRule(org.apache.spark.sql.graftshim.GraftDvMaskRule)
    // SQL row-level parity: UPDATE / MERGE INTO on graft catalog tables
    // resolve to the SpaceDataset CoW machinery (DELETE already works
    // through DSv2 SupportsDelete without any rule)
    ext.injectResolutionRule(org.apache.spark.sql.graftshim.GraftRowLevelSqlRule)
    // ±0.0 parquet-pushdown soundness: vanilla Spark drops row groups
    // whose zeros are stored with the other sign bit (see
    // FloatingZeroRewrite scaladoc for the reproduction)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graftshim.FloatingZeroRewrite)
  }
}

object GraftExtensions {

  /** Register the same function set on an ALREADY-RUNNING session (the
    * extensions config only applies at session construction). Also
    * installs the ±0.0 pushdown-soundness rewrite as an extra
    * optimization (idempotent). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    all.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        exprs => {
          require(exprs.size == arity, s"$name expects $arity argument(s)")
          builder(exprs)
        },
        "scala_udf")
    }
    val zr = org.apache.spark.sql.graftshim.FloatingZeroRewrite
    if (!spark.experimental.extraOptimizations.contains(zr))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ zr
  }

  private def col(e: Expression): Column = ColumnExpr.column(e)
  private def expr(c: Column): Expression = ColumnExpr.catalystExpression(c)

  /** A literal-int argument (e.g. an n-gram width): SQL callers pass a
    * constant; anything non-foldable is a user error. */
  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => other.eval(null) match {
      case i: Int => i
      case _ => throw new IllegalArgumentException(s"$name must be a literal int")
    }
  }

  /** (name, arity, builder). */
  private[graft] val all: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash64", 1, es => SimHash64Expr(es.head)),
    ("graft_sorted_intersect_count", 2, es => SortedIntersectCount(es(0), es(1))),
    ("graft_tokens", 1, es => expr(TF.tokens(col(es.head)))),
    ("graft_token_count", 1, es => expr(TF.tokenCount(col(es.head)))),
    ("graft_bpe_token_count", 1, es => expr(TF.approxBpeTokenCount(col(es.head)))),
    ("graft_quality_score", 1, es => expr(TF.qualityScore(col(es.head)))),
    ("graft_stopword_ratio", 1, es => expr(TF.stopwordRatio(col(es.head)))),
    ("graft_fingerprint", 1, es => expr(TF.fingerprint(col(es.head)))),
    ("graft_lang_id", 1, es => expr(LangId.langId(col(es.head)))),
    ("graft_word_shingle_hashes", 2,
      es => expr(TF.wordShingleHashes(col(es.head), litInt(es(1), "n")))),
    ("graft_minhash", 2,
      es => expr(TF.minhashSignature(col(es.head), litInt(es(1), "numHashes")))),
    ("graft_jaccard_sorted", 2, es => expr(TF.jaccardSorted(col(es(0)), col(es(1))))),
    ("graft_hamming64", 2, es => expr(TF.hammingDistance64(col(es(0)), col(es(1))))),
    ("graft_cosine", 2, es => expr(VF.cosine(col(es(0)), col(es(1))))),
    ("graft_dot", 2, es => expr(VF.dot(col(es(0)), col(es(1))))),
    // the deterministic split/mix kernel: graft_mix_bucket(id, buckets)
    // — SQL users build stable train/valid/test splits and sampling
    // decisions with the exact arithmetic the curation ops use. The
    // kernel itself folds ids into [0, 2^31) (round 6), so arbitrary
    // int64 keys — hash-derived ids included — never overflow the
    // multiply on any surface.
    ("graft_mix_bucket", 2, es => {
      val buckets = litInt(es(1), "buckets")
      require(buckets > 0, "graft_mix_bucket: buckets must be positive")
      expr(graft.operators.Curation.mixBucket(col(es.head), buckets))
    }),
    // Bloom-sketch pair (Spark's own runtime-filter expressions, surfaced
    // as functions): graft_bloom_agg(longCol, estimatedItems) builds one
    // compact bloom binary DISTRIBUTED (map-side partial sketches OR-merged
    // in the final agg — no driver collect), and
    // graft_might_contain(bloomBinary, longValue) tests membership in
    // codegen. The bloom argument must be a constant or a scalar subquery
    // (enforced by the expression itself) — the idiomatic use is
    //   graft_might_contain((SELECT graft_bloom_agg(k, n) FROM small), k)
    // which ships the sketch through Spark's subquery broadcast machinery.
    // This is the prefilter shape for membership sets too large to
    // broadcast exactly (e.g. benchmark-shingle decontamination at corpus
    // scale): bloom drops ~all non-members map-side, the exact join only
    // sees the survivors.
    ("graft_bloom_agg", 2, es => new BloomFilterAggregate(es(0), es(1))),
    ("graft_might_contain", 2, es => BloomFilterMightContain(es(0), es(1))))
}
