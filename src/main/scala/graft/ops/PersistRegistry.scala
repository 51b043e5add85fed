package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded LRU registry for the query surface's ad-hoc `persist()` sites
  * (MinHash band keys / signature tables, SimHash signatures, embedding
  * signature buckets). Each site previously persisted directly and relied
  * on CacheManager plan-dedup plus MEMORY_AND_DISK eviction for
  * boundedness — correct per distinct dir, but a long-lived session
  * touching many dirs accumulated cache entries without limit. This
  * registry is the same discipline the IVF index cache applies
  * (graft.queries.VectorOps.ivfCache): entries keyed per (session, tag),
  * LRU-bounded at [[MaxEntries]] live persisted plans, stopped sessions
  * swept on every access, and an eager [[invalidatePrefix]] for callers
  * that rewrite a dir and want the old cache released immediately.
  *
  * Correctness is never at stake: an evicted (or stale) entry just
  * recomputes from lineage. The registry bounds cluster cache pressure,
  * it does not change results.
  */
object PersistRegistry {
  private final case class Entry(df: DataFrame,
      lastUsed: java.util.concurrent.atomic.AtomicLong)

  val MaxEntries = 16

  private val entries =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Entry]
  private val tick = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Persist-and-register `df` under `tag` (callers embed the input dir in
    * the tag so distinct inputs get distinct entries), or return the
    * already-registered frame for this (session, tag). On an insert race
    * the loser's duplicate `persist` call was a CacheManager no-op (same
    * canonicalized plan), so nothing is unpersisted — the winner's entry
    * owns the cache.
    */
  def cached(tag: String, df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    evictStopped()
    val key = (df.sparkSession, tag)
    val entry = entries.getOrElse(key, {
      val fresh = Entry(df.persist(level),
        new java.util.concurrent.atomic.AtomicLong(0L))
      entries.putIfAbsent(key, fresh).getOrElse(fresh)
    })
    entry.lastUsed.set(tick.incrementAndGet())
    evictLruOver(MaxEntries)
    entry.df
  }

  /** Eagerly release every entry whose tag starts with `prefix` for this
    * session — call after rewriting the files a cached frame reads (the
    * cache serves the materialized data, not the files, until released).
    */
  def invalidatePrefix(spark: SparkSession, prefix: String): Unit =
    entries.keys
      .filter(k => (k._1 eq spark) && k._2.startsWith(prefix))
      .foreach { k =>
        entries.remove(k).foreach(e => scala.util.Try(e.df.unpersist()))
      }

  private def evictStopped(): Unit =
    entries.keys.filter(_._1.sparkContext.isStopped).foreach { k =>
      entries.remove(k).foreach(e => scala.util.Try(e.df.unpersist()))
    }

  private def evictLruOver(cap: Int): Unit =
    while (entries.size > cap) {
      entries.toSeq.minByOption(_._2.lastUsed.get()) match {
        case Some((lru, _)) =>
          entries.remove(lru).foreach(e => scala.util.Try(e.df.unpersist()))
        case None => return
      }
    }

  /** Test hook: number of live entries for a session. */
  private[graft] def liveCount(spark: SparkSession): Int =
    entries.keys.count(_._1 eq spark)
}
