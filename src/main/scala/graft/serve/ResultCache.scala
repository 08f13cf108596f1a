package graft.serve

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Query-result cache (SURVEY §4: execution_strategies.py:267-283
  * `should_use_cache` + the Redis/Valkey result cache). In-process
  * LRU+TTL keyed by (graphId, normalized query, params); the reference
  * caches only read queries below the streaming threshold — the same
  * policy gate lives in [[cacheable]]. On a real deployment the store
  * is external (Redis); this class is the driver-local tier. */
final class ResultCache[V](
    maxEntries: Int = 1000,
    ttlMillis: Long = 5 * 60 * 1000,
    clock: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(value: V, at: Long, seq: Long)
  private val entries = new ConcurrentHashMap[String, Entry]()
  private val seqGen = new AtomicLong(0)
  private val hitCount = new AtomicLong(0)
  private val missCount = new AtomicLong(0)

  def key(graphId: String, query: String, params: Map[String, Any] = Map.empty): String = {
    val normalized = query.trim.replaceAll("\\s+", " ")
    // Length-prefix every component so values containing the separators
    // ('=', ';', '|') cannot collide: Map("a"->"1;b=2") and
    // Map("a"->"1","b"->"2") must produce distinct keys.
    def enc(s: String): String = s"${s.length}:$s"
    val p = params.toSeq.sortBy(_._1)
      .map { case (k, v) => enc(k) + "=" + enc(String.valueOf(v)) }
      .mkString(";")
    s"${enc(graphId)}|${enc(normalized)}|$p"
  }

  def get(k: String): Option[V] = {
    val e = entries.get(k)
    if (e == null) { missCount.incrementAndGet(); None }
    else if (clock() - e.at > ttlMillis) {
      entries.remove(k, e); missCount.incrementAndGet(); None
    } else { hitCount.incrementAndGet(); Some(e.value) }
  }

  def put(k: String, v: V): Unit = {
    entries.put(k, Entry(v, clock(), seqGen.incrementAndGet()))
    // LRU-ish eviction: drop oldest-inserted beyond capacity (a full
    // LRU would track access order; insertion order is the reference
    // cache's behavior for its short TTLs)
    while (entries.size() > maxEntries) {
      val oldest = entries.entrySet().stream()
        .min(java.util.Comparator.comparingLong[java.util.Map.Entry[String, Entry]](_.getValue.seq))
      if (oldest.isPresent) entries.remove(oldest.get().getKey) else return
    }
  }

  def getOrCompute(k: String)(compute: => V): V =
    get(k).getOrElse { val v = compute; put(k, v); v }

  def invalidateGraph(graphId: String): Unit = {
    val prefix = s"${graphId.length}:$graphId|" // same encoding as key()
    val it = entries.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(prefix)) it.remove()
  }

  def stats: (Long, Long, Int) = (hitCount.get(), missCount.get(), entries.size())
}

object ResultCache {

  /** The reference's caching policy: read-only queries with small
    * expected results (streaming results are never cached). */
  def cacheable(query: String): Boolean = {
    QueryGovernance.classify(query) == QueryGovernance.QueryKind.Read && {
      val shape = QueryGovernance.analyze(query)
      !shape.requiresStreaming
    }
  }
}
