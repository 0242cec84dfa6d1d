package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.format.RowBitmap

/** The process-wide delete-vector cache is bounded by RETAINED BYTES,
  * not entry count (ADVICE r11): a many-table driver cannot grow its
  * heap one full vector map per table. */
class DvCacheSpec extends AnyFunSuite {

  /** A vector map weighing roughly `mb` megabytes of base64 payload. */
  private def bigMap(tag: String, mb: Int): Map[String, RowBitmap] = {
    val b64 = "A" * (mb * 1024 * 512) // chars → ~2 bytes/char retained
    Map(s"data/$tag.parquet" -> RowBitmap(s"data/$tag.parquet",
      allRows = false, numRows = 1L, bitmapB64 = Some(b64)))
  }

  test("byte-weighted eviction keeps the retained total under the cap") {
    val before = Storage.dvCacheRetainedBytes
    // ~40 MB apiece: 10 loads = ~400 MB offered against a 256 MB cap
    (0 until 10).foreach { i =>
      val m = bigMap(s"dvcache_spec_$i", 40)
      val got = Storage.dvCacheGet(s"/dvcache/spec/$i", () => m)
      assert(got eq m)
    }
    assert(Storage.dvCacheRetainedBytes <= 256L * 1024 * 1024,
      s"retained ${Storage.dvCacheRetainedBytes} bytes exceeds the cap")
    assert(Storage.dvCacheRetainedBytes > before,
      "recent entries must still be cached")
    // a hit serves the cached instance
    val probe = bigMap("dvcache_spec_9", 40)
    assert(!(Storage.dvCacheGet("/dvcache/spec/9", () => probe) eq probe),
      "the most recent entry must be a cache hit")
  }

  test("a map too large to ever fit is served uncached, evicting nothing wholesale") {
    val key = "/dvcache/spec/huge"
    val m = bigMap("dvcache_huge", 300) // ~600 MB retained > 256 MB cap
    val got = Storage.dvCacheGet(key, () => m)
    assert(got eq m)
    // not cached: a second load invokes the loader again
    val m2 = bigMap("dvcache_huge", 1)
    assert(Storage.dvCacheGet(key, () => m2) eq m2)
  }
}
