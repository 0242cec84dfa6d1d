package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, all
  * as pure `Column` expressions (higher-order functions, codegen'd — no
  * UDF in the hot path). Designed to run inside a single projection over
  * a 100 TB documents table: no shuffle, no explode unless a query
  * explicitly asks for token-level output.
  *
  * Note on ANSI mode (Spark 4 default ON): rolling-hash accumulators use
  * `xxhash64` chaining rather than multiply-accumulate so no integral
  * overflow can throw.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed (split of a trailing-space
    * string yields a tail ""). */
  /** Whitespace tokens, native kernel (one static call in codegen).
    * Output is identical to `filter(split(c, "\\s+"), _ != "")` — the
    * previous HOF form, whose ArrayFilter lambda never codegens and
    * whose StringSplit re-runs a regex per row (guide: eliminate
    * non-codegen expressions from the hot path). */
  def tokens(c: Column): Column =
    org.apache.spark.sql.graftshim.TokenizeExpr(c)

  /** Token count without materializing the array (`size(tokens(c))`
    * semantics, incl. NULL → NULL). */
  def tokenCount(c: Column): Column =
    org.apache.spark.sql.graftshim.TokenCountExpr(c)

  def distinctTokenRatio(c: Column): Column =
    bound(tokens(c)) { ts =>
      val n = size(ts)
      when(n === 0, lit(0.0))
        .otherwise(size(array_distinct(ts)).cast("double") / n)
    }

  /** English stopwords (small, embedded list — heuristic quality cue). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "was",
    "from", "but", "not", "they", "his", "her", "she", "he", "you", "we")

  def stopwordRatio(c: Column): Column =
    // token COUNT is case-insensitive (whitespace split), so one
    // lowered tokenization serves both numerator and denominator
    bound(tokens(lower(c))) { ts =>
      val n = size(ts)
      val stops = filter(ts, t => array_contains(lit(Stopwords.toArray), t))
      when(n === 0, lit(0.0)).otherwise(size(stops).cast("double") / n)
    }

  def punctRatio(c: Column): Column = {
    val len = length(c)
    when(len === 0, lit(0.0)).otherwise(
      (len - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double") / len)
  }

  def digitRatio(c: Column): Column = {
    val len = length(c)
    when(len === 0, lit(0.0)).otherwise(
      (len - length(regexp_replace(c, "[0-9]", ""))).cast("double") / len)
  }

  /** Mean token length. */
  def avgTokenLen(c: Column): Column =
    bound(tokens(c)) { ts =>
      val n = size(ts)
      val total = aggregate(transform(ts, t => length(t)), lit(0),
        (acc, x) => acc + x)
      when(n === 0, lit(0.0)).otherwise(total.cast("double") / n)
    }

  /** Composite quality score in [0,1] — the standard cheap heuristics
    * (length saturation, lexical diversity, low punctuation/digit noise,
    * sane token lengths) combined multiplicatively. The token array goes
    * through [[bound]] ONCE and every sub-score derives from it —
    * lambda-bearing subtrees are exempt from Catalyst subexpression
    * elimination, so composing the ratio helpers directly would re-run
    * the \s+ tokenization ~8× per row on the documents hot path. */
  def qualityScore(c: Column): Column =
    bound(tokens(c)) { ts =>
      val n = size(ts)
      val lengthScore = least(lit(1.0), n.cast("double") / 50.0)
      val diversity = when(n === 0, lit(0.0))
        .otherwise(size(array_distinct(ts)).cast("double") / n)
      val noise = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 5 - digitRatio(c) * 5)
      val totalLen = aggregate(transform(ts, t => length(t)), lit(0),
        (acc, x) => acc + x)
      val avgLen = when(n === 0, lit(0.0)).otherwise(totalLen.cast("double") / n)
      val wordShape = when(avgLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.5))
      round(lengthScore * (lit(0.5) + diversity * 0.5) * noise * wordShape, 4)
    }

  /** BPE-ish sub-token count: whitespace tokens plus extra units for long
    * words (a cheap stand-in for a real tokenizer's token count: every
    * started run of 4 chars beyond the first 4 costs one more token). */
  def approxBpeTokenCount(c: Column): Column =
    aggregate(transform(tokens(c), t => greatest(lit(1),
      ceil(length(t).cast("double") / 4.0).cast("int"))), lit(0), (acc, x) => acc + x)

  /** Order-sensitive rolling document fingerprint: xxhash64-chained over
    * tokens (overflow-free under ANSI mode). */
  def fingerprint(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, x) => xxhash64(acc, x))

  /** Word n-gram shingles: ["a b c","b c d",...]; documents shorter than
    * `n` tokens yield their full token join as the single shingle.
    * `tokens(c)` MUST go through [[bound]]: the per-shingle lambda
    * references the token array, and project collapsing would otherwise
    * re-inline the whole regexp tokenization into every lambda call —
    * O(words²) regexp work per document. */
  def wordShingles(c: Column, n: Int): Column = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    bound(tokens(c)) { ts =>
      val k = size(ts)
      when(k <= n, array(concat_ws(" ", ts)))
        .otherwise(transform(sequence(lit(1), k - (n - 1)),
          i => concat_ws(" ", slice(ts, i, lit(n)))))
    }
  }

  /** SORTED distinct 64-bit hashes of the word shingles — the set the
    * MinHash / Jaccard pipeline actually operates on. Hashing each
    * shingle ONCE up front makes every downstream op (per-seed min-hash
    * mixing, set intersection, shuffle) long-typed: ~10× cheaper than
    * re-hashing strings, exact w.h.p. (64-bit collisions ~1e-12 at
    * corpus scale). Sorted so the verify stage can use the
    * allocation-free merge intersection ([[jaccardSorted]]). Native
    * expression ([[ShingleOps.shingleHashes]] kernel): same shingle-set
    * semantics as the string pipeline ([[wordShingles]] + xxhash64),
    * but one static call in codegen. */
  def wordShingleHashes(c: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.WordShingleHashesExpr(c, n)

  /** Jaccard over pre-SORTED distinct long arrays: |∩| by linear merge
    * (native expression), |∪| = |A|+|B|-|∩|. */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = org.apache.spark.sql.graftshim.SortedIntersectCount(a, b)
    val uni = size(a) + size(b) - inter
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni)
  }

  /** MinHash signature over pre-hashed shingles: `numHashes` independent
    * splitmix64 seed mixes, min per seed (native expression). */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    org.apache.spark.sql.graftshim.MinHashSigExpr(shingleHashes, numHashes)

  /** Evaluate `input` ONCE and pass it as a bound lambda variable into
    * `f`. Catalyst's project collapsing happily inlines a projected
    * expression into every lambda that references it — nesting an O(n)
    * pipeline inside an O(k) transform then costs O(n·k) PER ROW (the
    * minhash signature went 98s → 3s at sf0.1 from this alone). The
    * single-element `transform` forces one evaluation. */
  def bound(input: Column)(f: Column => Column): Column =
    element_at(transform(array(input), f), 1)

  /** Jaccard similarity of the DISTINCT-element sets of two arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni)
  }

  /** 64-bit SimHash over the token multiset — a native Catalyst
    * expression (`SimHash64Expr`): stays inside whole-stage codegen,
    * no per-row Scala conversion. */
  def simhash64(tokensCol: Column): Column =
    org.apache.spark.sql.graftshim.SimHash64Expr(tokensCol)

  def hammingDistance64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}

object SimHash {
  import net.jpountz.xxhash.XXHashFactory

  private[functions] lazy val factory = XXHashFactory.fastestInstance()

  def hash64(bytes: Array[Byte]): Long =
    factory.hash64().hash(bytes, 0, bytes.length, 0L)

  def hash64(s: String): Long = hash64(s.getBytes("UTF-8"))

  /** Static entry point used by [[SimHash64Expr]]'s generated code —
    * operates directly on Catalyst's ArrayData/UTF8String (no
    * conversions). */
  def hashArrayData(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = hash64(arr.getUTF8String(j).getBytes)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
