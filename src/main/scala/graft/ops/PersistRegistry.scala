package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Bounded LRU registry for the query surface's ad-hoc `persist()` sites
  * (MinHash band keys / signature tables, SimHash signatures, embedding
  * signature buckets). Each site previously persisted directly and relied
  * on CacheManager plan-dedup plus MEMORY_AND_DISK eviction for
  * boundedness — correct per distinct dir, but a long-lived session
  * touching many dirs accumulated cache entries without limit. Entries are
  * keyed per (session, tag), LRU-bounded at [[MaxEntries]] live persisted
  * plans, stopped sessions swept on every access, with an eager
  * [[invalidatePrefix]] for callers that rewrite a dir and want the old
  * cache released immediately. The machinery is the shared [[SessionLru]]
  * (`releaseOnRaceLoss = false`: on an insert race the loser's duplicate
  * `persist` was a CacheManager no-op for the same canonicalized plan, so
  * releasing it would unpersist the winner's data).
  *
  * Correctness is never at stake: an evicted (or stale) entry just
  * recomputes from lineage. The registry bounds cluster cache pressure,
  * it does not change results.
  */
object PersistRegistry {
  val MaxEntries = 16

  private val lru = new SessionLru[DataFrame](MaxEntries,
    df => df.unpersist(), releaseOnRaceLoss = false)

  /** Persist-and-register `df` under `tag` (callers embed the input dir in
    * the tag so distinct inputs get distinct entries), or return the
    * already-registered frame for this (session, tag).
    *
    * `sourcePath`: the file/dir the plan reads. When set, the entry is
    * fingerprinted against its listing ([[SessionLru.pathFingerprint]]) so
    * a rewrite of the input is observed on the next access instead of
    * serving the stale materialized data — required for any cache whose
    * consumers themselves re-read the path (e.g. ClusterOps fingerprints
    * its label cache on documents.parquet and rebuilds through q12's band
    * keys; without a matching fingerprint here the rebuild would join
    * fresh shingles against stale persisted band keys).
    */
  def cached(tag: String, df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      sourcePath: String = ""): DataFrame = {
    val fp = if (sourcePath.isEmpty) ""
      else SessionLru.pathFingerprint(df.sparkSession, sourcePath)
    lru.getOrBuild(df.sparkSession, tag, fp)(df.persist(level))
  }

  /** By-name variant of [[cached]] for expensive-to-CONSTRUCT frames: on a
    * registry hit the builder never runs, so any nested registry entries
    * the build would create (e.g. verifyPairs' per-evaluation candidate
    * persist) are not churned through the LRU on every call. Semantics are
    * otherwise identical to [[cached]], including the sourcePath
    * fingerprint staleness check.
    */
  def cachedLazy(spark: SparkSession, tag: String, sourcePath: String = "",
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      (build: => DataFrame): DataFrame = {
    val fp = if (sourcePath.isEmpty) ""
      else SessionLru.pathFingerprint(spark, sourcePath)
    lru.getOrBuild(spark, tag, fp)(build.persist(level))
  }

  private val uniq = new java.util.concurrent.atomic.AtomicLong()

  /** Persist-and-register `df` under a fresh, never-reused tag — for
    * frames consumed several times within ONE query evaluation (e.g. a
    * candidate-pair frame feeding both id-restriction sides and the final
    * score join) where no stable cross-call cache key exists. Each call
    * creates its own entry, so nothing is ever shared or fingerprinted;
    * the LRU bound alone keeps the live persisted set finite.
    */
  def cachedUnique(tagPrefix: String, df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    cached(s"$tagPrefix#${uniq.incrementAndGet()}", df, level)

  /** Eagerly release every entry whose tag starts with `prefix` for this
    * session — call after rewriting the files a cached frame reads (the
    * cache serves the materialized data, not the files, until released).
    */
  def invalidatePrefix(spark: SparkSession, prefix: String): Unit =
    lru.invalidatePrefix(spark, prefix)

  /** Test hook: number of live entries for a session. */
  private[graft] def liveCount(spark: SparkSession): Int =
    lru.liveCount(spark)
}
