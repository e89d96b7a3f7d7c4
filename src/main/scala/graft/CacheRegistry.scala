package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for persisted relations shared across gated
  * queries (minhash signatures, simhash fingerprints, quantized vectors,
  * per-doc prefix arrays, …).
  *
  * Why it exists: each gated query function rebuilds its DataFrame from
  * scratch per call, so a bare `.persist()` at the shared-relation site
  * re-registers an identical plan with the CacheManager on every call —
  * a stream of "Asked to cache already cached data" warnings and, across
  * a 50-query Verify/Bench session, a cache whose lifecycle nobody owns
  * (round-5 bench showed unrelated queries degrading >2× under that
  * churn). The registry makes the lifecycle explicit: ONE persisted
  * DataFrame instance per (session, key), built lazily, reused by every
  * consumer, releasable by key or wholesale.
  *
  * Keys are semantic ("dedup.sigCols:<sfDir>") rather than plan-derived:
  * two calls that build the same relation for the same fixture dir share
  * an entry even though their plan objects differ.
  */
object CacheRegistry {
  private val frames = new ConcurrentHashMap[String, DataFrame]()

  private def k(spark: SparkSession, key: String): String =
    s"${System.identityHashCode(spark)}:$key"

  /** Return the session's persisted frame for `key`, building + persisting
    * it on first use. MEMORY_AND_DISK: evictable under pressure, never OOM.
    *
    * get + putIfAbsent rather than computeIfAbsent: builders nest (a
    * registered relation may itself consume another registered relation —
    * simhashPairs builds on simhash), and computeIfAbsent holds the bucket
    * lock across the build, turning that nesting into
    * IllegalStateException("Recursive update"). The unlocked race is
    * benign: a losing duplicate build is unpersisted before the winner is
    * returned, so exactly one persisted instance survives per key.
    */
  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val fullKey = k(spark, key)
    val existing = frames.get(fullKey)
    if (existing != null) existing
    else {
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      val raced = frames.putIfAbsent(fullKey, built)
      if (raced == null) built else { built.unpersist(false); raced }
    }
  }

  /** Unpersist and drop one entry (no-op if absent). Blocking=false: let
    * executors free blocks asynchronously.
    */
  def release(spark: SparkSession, key: String): Unit =
    Option(frames.remove(k(spark, key))).foreach(_.unpersist(false))

  /** Unpersist and drop every entry registered for this session. */
  def releaseAll(spark: SparkSession): Unit = {
    val prefix = s"${System.identityHashCode(spark)}:"
    val it = frames.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) { e.getValue.unpersist(false); it.remove() }
    }
  }
}
