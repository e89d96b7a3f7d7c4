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
  *
  * Two replica-count policies, both gated against the same oracle:
  *   - [[D]], a STATIC default (the fixed-d PKG configuration,
  *     `q3_windowed_count_salted`);
  *   - [[dynamicD]], the reference's measured-skew formula d = ⌊p1·m⌋+1
  *     clamped to [2, 30]
  *     (stateless/src/main/scala/cluster/PartialKeyDynamicJoin.scala:57-58
  *     computes p1 = max key count / rows seen and d = (p1·m).toInt + 1
  *     per input partition per batch; the clamp is the 30-entry seeds
  *     table lookup in PartialKeyDynamicConfig.scala:11-33, floor 2 =
  *     plain PKG). Here the skew is measured PER WINDOW — the unit the
  *     adaptive loop decides over — instead of per input partition:
  *     `q3_windowed_count_salted_dynamic` below is the batch face, and
  *     streaming/AdaptiveAgg.scala re-derives d each micro-batch from
  *     the same stats that drive its HH↔APK strategy switch.
  */
object Salting {

  /** Static salt-replica default (d=2 is plain PKG; 4 = a mid-range
    * fixed-d configuration). The dynamic policy below replaces this
    * wherever measured skew is available.
    */
  val D = 4

  /** Reference clamp bounds: at least 2 (plain PKG), at most the
    * 30-entry seeds table (PartialKeyDynamicConfig.scala:11-33).
    */
  val DMin = 2
  val DMax = 30

  /** d = ⌊p1·m⌋ + 1 clamped to [DMin, DMax], exact integer arithmetic:
    * ⌊p1·m⌋ = (maxCnt·m) div total (p1 = maxCnt/total, the max key
    * share). PartialKeyDynamicJoin.scala:57-58 verbatim, with the
    * getSeeds clamp applied.
    */
  def dynamicD(maxCnt: Long, total: Long, m: Int): Int = {
    require(total > 0, s"dynamicD: empty relation (total=$total)")
    val d = (maxCnt * m / total).toInt + 1
    math.max(DMin, math.min(d, DMax))
  }

  /** Salted per-(z, ltw) windowed count — same semantics (and oracle) as
    * RefQueries.q3WindowedCount, demonstrating the salted two-stage plan:
    * partial count per (z, ltw, salt), then merge per (z, ltw).
    */
  def saltedWindowedCount(spark: SparkSession, sfDir: String): DataFrame =
    Shapes.withLtw(Shapes.zxEvents(spark, sfDir), Shapes.LogicTimeSlotMs)
      .withColumn("salt", pmod(col("x") + col("event_time"), lit(D)))
      .groupBy("z", "ltw", "salt").agg(count(lit(1)).as("pcnt"))
      .groupBy("z", "ltw").agg(sum("pcnt").as("cnt"))

  /** Dynamic-d variant: one stats pass derives each window's replica
    * count from its measured skew (the [[dynamicD]] formula, m =
    * EngineConfig.numMappers like the adaptive loop), the |windows|-row
    * decision relation broadcasts onto the raw events, and the salt
    * modulus is the per-window `d` column. Same oracle as the plain and
    * static-salt forms — the replica count must never change the answer,
    * only how wide a hot window's partials spread. Scale shape: the
    * stats pass is the same two-phase (ltw, z) aggregate the skew-stats
    * query runs (8-byte keys), the decision join is broadcast, and the
    * salted aggregate shuffles once per stage exactly like the static
    * form.
    */
  /** The stats pass alone: the |windows|-row per-window replica-count
    * relation (two-phase (ltw, z) count → per-ltw total/max → the
    * [[dynamicD]] formula as a column). Exposed so SkewBench can time
    * the decision cost SEPARATELY from the salted aggregate it feeds —
    * the r13 table's 1.09× skewed ratio on the dynamic twin needed
    * attribution (stats pass vs salted agg).
    */
  private[graft] def dynamicDRel(raw: DataFrame, m: Int): DataFrame =
    raw.groupBy("ltw", "z").agg(count(lit(1)).as("cnt"))
      .groupBy("ltw").agg(sum("cnt").as("total"), max("cnt").as("max_cnt"))
      .select(col("ltw"),
        expr(s"greatest(${DMin}L, least(max_cnt * ${m}L div total + 1L, ${DMax}L))")
          .as("d"))

  def dynamicSaltedWindowedCount(spark: SparkSession, sfDir: String): DataFrame = {
    val m = graft.EngineConfig.default.numMappers
    val raw = Shapes.withLtw(Shapes.zxEvents(spark, sfDir), Shapes.LogicTimeSlotMs)
    raw.join(broadcast(dynamicDRel(raw, m)), "ltw")
      .withColumn("salt", pmod(col("x") + col("event_time"), col("d")))
      .groupBy("z", "ltw", "salt").agg(count(lit(1)).as("pcnt"))
      .groupBy("z", "ltw").agg(sum("pcnt").as("cnt"))
  }

  /** Identical result contract to q3_windowed_count — the salt must never
    * change the answer, only the shuffle layout.
    */
  val saltedWindowedCountSql: String = RefQueries.q3CountSql

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q3_windowed_count_salted" -> (saltedWindowedCount _),
    "q3_windowed_count_salted_dynamic" -> (dynamicSaltedWindowedCount _))

  val oracles: Map[String, String] = Map(
    "q3_windowed_count_salted" -> saltedWindowedCountSql,
    "q3_windowed_count_salted_dynamic" -> saltedWindowedCountSql)
}
