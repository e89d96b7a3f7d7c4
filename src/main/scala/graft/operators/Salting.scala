package graft.operators

import graft.Shapes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative stand-in for the reference's skew-aware partitioner family
  * (SURVEY.md §2.6 T3–T7, T10–T11: PKG 2-choice, advanced PKG head/tail
  * split, dynamic-d, hybrid HH↔APK).
  *
  * Those partitioners exist to keep one hot key from pinning a reducer.
  * In Spark the partial aggregate already absorbs per-key skew before the
  * shuffle, so for the reference's own queries nothing extra is needed —
  * but when the aggregation state itself is heavy (large maps, big
  * distinct sets), the idiomatic equivalent is explicit two-stage salting:
  *
  *   stage 1: groupBy(key, salt = pmod(hash-ish, d)) — partial result per
  *            salt replica; the d replicas spread a hot key over d
  *            reducers (exactly PKG's d-choice load split,
  *            stateless/src/main/scala/mypartitioner/
  *            PartialKeyPartitioner.scala:10-37)
  *   stage 2: groupBy(key) — merge the d partials.
  *
  * The salt is derived from a row-deterministic column (not rand()) so
  * results are reproducible and retry-safe under speculative execution.
  * `d` mirrors the reference's dynamic-d formula d = ⌊p1·m⌋+1 clamped to
  * [2,30] (stateless/src/main/scala/cluster/PartialKeyDynamicJoin.scala:57).
  */
object Salting {

  /** Salt choices, reference default neighborhood (d=2 is plain PKG). */
  val D = 4

  /** Salted per-(z, ltw) windowed count — same semantics (and oracle) as
    * RefQueries.q3WindowedCount, demonstrating the salted two-stage plan:
    * partial count per (z, ltw, salt), then merge per (z, ltw).
    */
  def saltedWindowedCount(spark: SparkSession, sfDir: String): DataFrame =
    Shapes.withLtw(Shapes.zxEvents(spark, sfDir), Shapes.LogicTimeSlotMs)
      .withColumn("salt", pmod(col("x") + col("event_time"), lit(D)))
      .groupBy("z", "ltw", "salt").agg(count(lit(1)).as("pcnt"))
      .groupBy("z", "ltw").agg(sum("pcnt").as("cnt"))

  /** Identical result contract to q3_windowed_count — the salt must never
    * change the answer, only the shuffle layout.
    */
  val saltedWindowedCountSql: String = RefQueries.q3CountSql

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q3_windowed_count_salted" -> (saltedWindowedCount _))

  val oracles: Map[String, String] = Map(
    "q3_windowed_count_salted" -> saltedWindowedCountSql)
}
