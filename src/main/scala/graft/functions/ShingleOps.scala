package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the native shingle/minhash expressions
  * ([[org.apache.spark.sql.graftshim.WordShingleHashesExpr]] /
  * [[org.apache.spark.sql.graftshim.MinHashSigExpr]]). Called directly
  * from generated code, so the whole-stage-codegen output is one static
  * call instead of a deeply nested HOF tree (which janino compiles
  * slowly and Catalyst re-evaluates per lambda).
  *
  * Semantics contract (what the DuckDB oracle can observe): the HASH
  * values are engine-internal, but the induced shingle SET must be
  * isomorphic to the string-shingle set — tokenization on `\s+` runs
  * (Java regex `\s` = ASCII 9-13 and space), shingles = `n` consecutive
  * tokens joined by a single space, docs with ≤ n tokens yield one
  * shingle of all tokens — INCLUDING zero tokens, which yield the one
  * empty shingle (`concat_ws` of no tokens), exactly like the string
  * pipeline and the DuckDB oracle SQL: two empty documents are
  * identical and must score Jaccard 1. Any injective hash preserves
  * Jaccard; xxhash64
  * collisions (~1e-12 at corpus scale) are the standard exactness
  * caveat (same as the prior `xxhash64(shingle_string)` pipeline).
  */
object ShingleOps {

  private def isSpace(b: Byte): Boolean = b == 32 || (b >= 9 && b <= 13)

  /** Sorted distinct 64-bit hashes of the word `n`-gram shingles of
    * `text`. Token boundaries are byte ranges (safe in UTF-8: ASCII
    * whitespace bytes never occur inside multi-byte sequences); tokens
    * are copied once into a normalized single-space buffer and each
    * shingle hashes a contiguous slice of it — zero string allocation. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length

    // pass 1: token [start,end) offsets in the raw bytes
    var nTokens = 0
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) { nTokens += 1; while (i < len && !isSpace(bytes(i))) i += 1 }
    }
    if (nTokens == 0) {
      // one EMPTY shingle, isomorphic to the string pipeline's
      // array(concat_ws(" ", [])) = [""] — not an empty set, which
      // would make empty-vs-empty Jaccard 0 instead of 1
      val h = SimHash.factory.hash64().hash(Array.emptyByteArray, 0, 0, 0L)
      return ArrayData.toArrayData(Array(h))
    }

    // pass 2: normalized buffer (tokens joined by single spaces) +
    // per-token start offsets within it
    val norm = new Array[Byte](len)
    val tokStart = new Array[Int](nTokens + 1)
    var w = 0
    var t = 0
    i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        if (t > 0) { norm(w) = ' '; w += 1 }
        tokStart(t) = w
        while (i < len && !isSpace(bytes(i))) { norm(w) = bytes(i); w += 1; i += 1 }
        t += 1
      }
    }
    tokStart(nTokens) = w + 1 // sentinel: start of one-past-last token

    val nShingles = if (nTokens <= n) 1 else nTokens - n + 1
    val hashes = new Array[Long](nShingles)
    val h64 = SimHash.factory.hash64()
    var s = 0
    while (s < nShingles) {
      val start = tokStart(s)
      val endTok = math.min(s + n, nTokens)
      val end = tokStart(endTok) - 1 // strip the joining space / sentinel
      hashes(s) = h64.hash(norm, start, end - start, 0L)
      s += 1
    }

    java.util.Arrays.sort(hashes)
    var uniq = 0
    i = 0
    while (i < nShingles) {
      if (i == 0 || hashes(i) != hashes(i - 1)) { hashes(uniq) = hashes(i); uniq += 1 }
      i += 1
    }
    ArrayData.toArrayData(
      if (uniq == nShingles) hashes else java.util.Arrays.copyOf(hashes, uniq))
  }

  /** Whitespace tokens of `text` as an array of strings — the native
    * kernel behind [[graft.functions.TextFunctions.tokens]]. Semantics
    * are EXACTLY `filter(split(text, "\\s+"), _ != "")` (Java regex
    * `\s` = ASCII 9–13 and space): non-empty maximal runs of
    * non-whitespace bytes, in order. The HOF form evaluates through
    * interpreted `StringSplit`/`ArrayFilter` (higher-order lambdas
    * never codegen) with a regex compile per batch — this is one
    * static call in generated code and one pass over the bytes. Byte
    * slicing is UTF-8-safe: ASCII whitespace bytes never occur inside
    * multi-byte sequences. Each token COPIES its bytes ([[UTF8String
    * .fromBytes]]) — a zero-copy view over the parquet page buffer
    * would alias memory the scanner recycles. */
  def tokenize(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTokens = 0
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) { nTokens += 1; while (i < len && !isSpace(bytes(i))) i += 1 }
    }
    if (nTokens == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val toks = new Array[Any](nTokens)
    var t = 0
    i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isSpace(bytes(i))) i += 1
        toks(t) = UTF8String.fromBytes(bytes, start, i - start)
        t += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(toks)
  }

  /** Token COUNT of `text` without materializing the token array —
    * `size(tokens(text))` is the hot shape of the BM25/posting
    * pipelines (document length), and the count needs no allocation
    * at all. */
  def tokenCount(text: UTF8String): Int = {
    val bytes = text.getBytes
    val len = bytes.length
    var n = 0
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) { n += 1; while (i < len && !isSpace(bytes(i))) i += 1 }
    }
    n
  }

  /** splitmix64 finalizer (public-domain constants) — the per-seed mix
    * for minhash signatures. */
  private def mix(h: Long, seed: Long): Long = {
    var z = h + seed * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature: for each of `numHashes` seeds, the minimum of the
    * seed-mixed shingle hashes. An EMPTY input array yields all
    * Long.MaxValue — defensive only: [[shingleHashes]] never emits an
    * empty array (zero tokens produce the one empty-shingle hash, so
    * two empty documents share a real signature and verify at
    * Jaccard 1, exactly like the string pipeline and the oracle SQL —
    * do NOT "restore" empty-set semantics here, that was the pre-fix
    * divergence). */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val k = shingles.numElements()
    // inputTypes admit nullable-element arrays; getLong on a null slot
    // would silently read 0 and poison the signature — fail loudly
    var chk = 0
    while (chk < k) {
      if (shingles.isNullAt(chk))
        throw new IllegalArgumentException(
          s"null element at $chk in minhash shingle array")
      chk += 1
    }
    val sig = new Array[Long](numHashes)
    var s = 0
    while (s < numHashes) {
      var mn = Long.MaxValue
      var i = 0
      while (i < k) {
        val m = mix(shingles.getLong(i), s + 1)
        if (m < mn) mn = m
        i += 1
      }
      sig(s) = mn
      s += 1
    }
    ArrayData.toArrayData(sig)
  }
}
