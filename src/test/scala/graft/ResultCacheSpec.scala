package graft

import graft.serve.ResultCache
import org.scalatest.funsuite.AnyFunSuite

class ResultCacheSpec extends AnyFunSuite {

  test("hit/miss, TTL expiry, graph invalidation") {
    var now = 0L
    val cache = new ResultCache[Int](maxEntries = 10, ttlMillis = 100, clock = () => now)
    val k = cache.key("g1", "MATCH (n)  RETURN n LIMIT 5", Map("a" -> 1))
    assert(cache.get(k).isEmpty)
    cache.put(k, 42)
    assert(cache.get(k).contains(42))
    now = 150
    assert(cache.get(k).isEmpty) // expired
    cache.put(k, 43)
    cache.invalidateGraph("g1")
    assert(cache.get(k).isEmpty)
    val (hits, misses, size) = cache.stats
    assert(hits === 1 && misses === 3 && size === 0)
  }

  test("key normalizes whitespace and orders params") {
    val c = new ResultCache[Int]()
    assert(c.key("g", "MATCH (n)\n  RETURN n", Map("b" -> 2, "a" -> 1)) ===
      c.key("g", "MATCH (n) RETURN n", Map("a" -> 1, "b" -> 2)))
  }

  test("capacity eviction drops oldest entries") {
    val c = new ResultCache[Int](maxEntries = 3, ttlMillis = 10000)
    (1 to 5).foreach(i => c.put(s"k$i", i))
    assert(c.get("k1").isEmpty && c.get("k2").isEmpty)
    assert(c.get("k5").contains(5))
  }

  test("getOrCompute computes once per key") {
    val c = new ResultCache[Int]()
    var computed = 0
    val v1 = c.getOrCompute("k") { computed += 1; 7 }
    val v2 = c.getOrCompute("k") { computed += 1; 8 }
    assert(v1 === 7 && v2 === 7 && computed === 1)
  }

  test("cacheable: reads with bounded results only") {
    assert(ResultCache.cacheable("MATCH (n) RETURN count(n)"))
    assert(ResultCache.cacheable("MATCH (n) RETURN n LIMIT 50"))
    assert(!ResultCache.cacheable("MATCH (n) RETURN n")) // streaming
    assert(!ResultCache.cacheable("CREATE (n:X {a: 1})")) // write
  }
}
