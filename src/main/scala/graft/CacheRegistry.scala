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
  // Checkpoint-backed entries additionally hold localCheckpoint RDD
  // blocks that a Dataset.unpersist does NOT release (the persist cache
  // and the checkpointed RDD are separate storage entries); release paths
  // run these cleanups so the registry's lifecycle contract stays
  // complete for cachedCheckpointed entries (r18 advisory).
  private val cleanups = new ConcurrentHashMap[String, () => Unit]()

  private def k(spark: SparkSession, key: String): String =
    s"${System.identityHashCode(spark)}:$key"

  /** Unpersist every checkpoint RDD a frame's analyzed plan wraps (the
    * lazy `localCheckpoint` output is a LogicalRDD over a persisted RDD).
    */
  private def unpersistCheckpointRdds(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(false)
      case _ => ()
    }

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

  /** [[cached]] for a lineage-truncated relation: the built plan is cut
    * behind a LAZY `localCheckpoint` before persisting, so consumers embed
    * a one-node LogicalRDD instead of the full build lineage (guide §3.3
    * — the r18 fix for multi-embedded pair caches whose per-run
    * re-analysis cost ~1.1 s of driver time per consumer). Unlike a bare
    * `build.localCheckpoint` inside [[cached]], the checkpoint RDD is
    * tracked here so release/releaseAll free its blocks too.
    *
    * Caveats (r18 advisory, documented contract): under AQE the "lazy"
    * checkpoint is only plan-lazy — Dataset.checkpoint calls
    * `physicalPlan.execute()`, and AdaptiveSparkPlanExec materializes all
    * non-final query stages at frame-CONSTRUCTION time, so the build's
    * shuffles run when the first consumer constructs, not when it
    * executes (fine for the bench/verify drivers, which always execute).
    * And a truncated lineage cannot be recomputed: on a cluster, losing
    * an executor that held checkpoint blocks makes the relation
    * unrecoverable — this entry point is for session-scoped derived
    * relations whose rebuild-from-parquet is the session restart itself.
    */
  def cachedCheckpointed(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val fullKey = k(spark, key)
    val existing = frames.get(fullKey)
    if (existing != null) existing
    else {
      val cp = build.localCheckpoint(false)
      val built = cp.persist(StorageLevel.MEMORY_AND_DISK)
      val raced = frames.putIfAbsent(fullKey, built)
      if (raced == null) {
        cleanups.put(fullKey, () => unpersistCheckpointRdds(cp))
        built
      } else {
        built.unpersist(false)
        unpersistCheckpointRdds(cp)
        raced
      }
    }
  }

  /** Unpersist and drop one entry (no-op if absent). Blocking=false: let
    * executors free blocks asynchronously.
    */
  def release(spark: SparkSession, key: String): Unit = {
    val fullKey = k(spark, key)
    Option(frames.remove(fullKey)).foreach(_.unpersist(false))
    Option(cleanups.remove(fullKey)).foreach(_.apply())
  }

  /** Unpersist and drop every entry registered for this session. */
  def releaseAll(spark: SparkSession): Unit = {
    val prefix = s"${System.identityHashCode(spark)}:"
    val it = frames.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) { e.getValue.unpersist(false); it.remove() }
    }
    val ic = cleanups.entrySet().iterator()
    while (ic.hasNext) {
      val e = ic.next()
      if (e.getKey.startsWith(prefix)) { e.getValue.apply(); ic.remove() }
    }
  }
}
