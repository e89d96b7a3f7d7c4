package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NULL-semantics parity gates — the engine-behavior class the rest of the
  * suite cannot see, because the shared fixtures carry no NULLs (round-8
  * verdict gap). Every query here synthesizes NULLs deterministically from
  * real fixture columns with `nullif`, pushes them through one classic
  * null-sensitive shape, and emits a NULL-FREE result (coalesce sentinels)
  * so the driver's sort+hash compare never has to define NULL ordering.
  *
  * The shapes cover the standard ANSI rules an engine swap most often
  * breaks (reference: its C++ aggregation loop skips nothing — it has no
  * NULL concept at all, stateless/src/main/scala/cluster/HashJoin.scala
  * treats every field as present; Spark and DuckDB must instead agree on
  * SQL semantics):
  *
  *   - aggregate skipping: count(*) vs count(col); sum/min/max ignore
  *     NULL inputs, return NULL on all-NULL groups;
  *   - grouping: NULL keys form ONE group (null = null for GROUP BY);
  *   - equi-joins: NULL keys match NOTHING (null != null for ON), inner
  *     drops them, left null-pads them;
  *   - DISTINCT: NULLs collapse to one value (null = null for DISTINCT),
  *     while count(DISTINCT col) still skips them.
  *
  * All outputs are exact integers — no FP anywhere — and each shape is a
  * single scan + one grouped aggregate / one shuffle join: the NULL
  * handling rides the same codegen'd operators as the production queries,
  * so the gate checks the real execution path, not a special case.
  */
object NullSemantics {

  // Deterministic NULL injection: ~1 in 10 event rows gets a NULL key,
  // ~1 in 7 a NULL value — enough NULLs per group/key to make every
  // branch (skipped input, NULL-key group, unmatched join row) non-empty
  // at all SFs.
  private val nullableEventsSpark =
    """SELECT event_id,
      |  nullif(user_id % 50, 3) AS k,
      |  nullif(CAST(floor(value) AS BIGINT), 2) AS v
      |FROM events""".stripMargin

  private val nullableEventsDuck =
    """SELECT event_id,
      |  nullif(user_id % 50, 3) AS k,
      |  nullif(CAST(floor(value) AS BIGINT), 2) AS v
      |FROM events""".stripMargin

  private def nullableEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id"),
      nullif(pmod(col("user_id"), lit(50)), lit(3)).as("k"),
      nullif(floor(col("value")).cast("long"), lit(2)).as("v"))

  // ------------------------------------------------------------------
  // Aggregate NULL skipping: per key-group (the NULL key group included),
  // count(*) counts rows, count(v)/sum/min/max skip NULL inputs. The
  // coalesce sentinels (-1) only fire on an all-NULL group — and that
  // firing is itself part of the contract (both engines must agree the
  // group aggregates to NULL).
  // ------------------------------------------------------------------
  def nullAgg(spark: SparkSession, sfDir: String): DataFrame =
    nullableEvents(spark, sfDir)
      .groupBy(coalesce(col("k"), lit(-1L)).as("key_s"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("v")).as("n_nonnull"),
        coalesce(sum("v"), lit(-1L)).as("sum_v"),
        coalesce(min("v"), lit(-1L)).as("min_v"),
        coalesce(max("v"), lit(-1L)).as("max_v"),
        countDistinct(col("v")).as("n_distinct_v"))

  val nullAggSql: String =
    s"""SELECT coalesce(k, -1) AS key_s, count(*) AS n_rows,
       |  count(v) AS n_nonnull,
       |  CAST(coalesce(sum(v), -1) AS BIGINT) AS sum_v,
       |  coalesce(min(v), -1) AS min_v,
       |  coalesce(max(v), -1) AS max_v,
       |  count(DISTINCT v) AS n_distinct_v
       |FROM ($nullableEventsDuck)
       |GROUP BY k""".stripMargin

  // ------------------------------------------------------------------
  // NULL grouping vs NULL joining — the asymmetry at the heart of ANSI
  // NULL semantics, in one result: grouping on k puts every NULL-key row
  // into ONE group (seen above), while an equi-join on the same k matches
  // NONE of them. Left side: the nullable events; right side: the key
  // spine derived from customer (non-NULL by construction). Inner-join
  // semantics are derivable from the left-join columns (matched =
  // n_matched), so one left join gates both.
  // ------------------------------------------------------------------
  def nullJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val left = nullableEvents(spark, sfDir)
    // Key spine with a gap: customers keep keys 0..39 only, so non-NULL
    // keys 40..49 exercise the unmatched-but-non-NULL left-join branch,
    // distinct from the NULL-key branch.
    val right = Tables.customer(spark, sfDir)
      .select(pmod(col("c_custkey"), lit(50)).as("k"))
      .where(col("k") < 40)
      .groupBy("k").agg(count(lit(1)).as("n_cust"))
    left.join(right, Seq("k"), "left")
      .agg(count(lit(1)).as("n_left"),
        count(col("k")).as("n_nonnull_key"),
        sum(when(col("n_cust").isNotNull, 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("k").isNotNull && col("n_cust").isNull, 1L).otherwise(0L))
          .as("n_unmatched_nonnull"),
        coalesce(sum(col("n_cust")), lit(-1L)).as("sum_matched_cust"))
  }

  val nullJoinSql: String =
    s"""WITH l AS ($nullableEventsDuck),
       |r AS (
       |  SELECT k, count(*) AS n_cust FROM (
       |    SELECT c_custkey % 50 AS k FROM customer)
       |  WHERE k < 40 GROUP BY k)
       |SELECT count(*) AS n_left,
       |  count(l.k) AS n_nonnull_key,
       |  CAST(sum(CASE WHEN r.n_cust IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |  CAST(sum(CASE WHEN l.k IS NOT NULL AND r.n_cust IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unmatched_nonnull,
       |  CAST(coalesce(sum(r.n_cust), -1) AS BIGINT) AS sum_matched_cust
       |FROM l LEFT JOIN r ON l.k = r.k""".stripMargin

  // ------------------------------------------------------------------
  // DISTINCT NULL collapse: all (NULL, NULL) pairs are ONE distinct row,
  // (NULL, v) pairs one per v — DISTINCT treats NULLs as equal where the
  // join above treated them as unequal. Output is the sentinel-encoded
  // distinct pair set itself (small: ≤ 50 × value-domain).
  // ------------------------------------------------------------------
  def nullDistinct(spark: SparkSession, sfDir: String): DataFrame =
    nullableEvents(spark, sfDir)
      .select("k", "v").distinct()
      .select(coalesce(col("k"), lit(-1L)).as("k_s"),
        coalesce(col("v"), lit(-1L)).as("v_s"))

  val nullDistinctSql: String =
    s"""SELECT coalesce(k, -1) AS k_s, coalesce(v, -1) AS v_s
       |FROM (SELECT DISTINCT k, v FROM ($nullableEventsDuck))""".stripMargin

  // Spark-dialect twins for the SQL face (SqlQueries): the shapes are
  // ANSI enough that the texts mirror the DuckDB oracles nearly verbatim
  // — which is itself the point: the same SQL must mean the same thing
  // on both engines, NULLs included.
  val nullAggSparkSql: String =
    s"""SELECT coalesce(k, -1) AS key_s, count(*) AS n_rows,
       |  count(v) AS n_nonnull,
       |  CAST(coalesce(sum(v), -1) AS BIGINT) AS sum_v,
       |  coalesce(min(v), -1) AS min_v,
       |  coalesce(max(v), -1) AS max_v,
       |  count(DISTINCT v) AS n_distinct_v
       |FROM ($nullableEventsSpark)
       |GROUP BY k""".stripMargin

  val nullJoinSparkSql: String =
    s"""WITH l AS ($nullableEventsSpark),
       |r AS (
       |  SELECT k, count(*) AS n_cust FROM (
       |    SELECT c_custkey % 50 AS k FROM customer)
       |  WHERE k < 40 GROUP BY k)
       |SELECT count(*) AS n_left,
       |  count(l.k) AS n_nonnull_key,
       |  CAST(sum(CASE WHEN r.n_cust IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |  CAST(sum(CASE WHEN l.k IS NOT NULL AND r.n_cust IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unmatched_nonnull,
       |  CAST(coalesce(sum(r.n_cust), -1) AS BIGINT) AS sum_matched_cust
       |FROM l LEFT JOIN r ON l.k = r.k""".stripMargin

  val nullDistinctSparkSql: String =
    s"""SELECT coalesce(k, -1) AS k_s, coalesce(v, -1) AS v_s
       |FROM (SELECT DISTINCT k, v FROM ($nullableEventsSpark))""".stripMargin

  // ------------------------------------------------------------------
  // NULL-SAFE equality — the deliberate opposite of the join above:
  // Spark's `<=>` and DuckDB's `IS NOT DISTINCT FROM` treat NULL as a
  // matchable value, so the NULL-key rows that n_null_join dropped now
  // pair with each other. Self-join of the distinct key relation under
  // both operators in one result: n_eq (plain =) must exclude the NULL
  // key, n_nullsafe_eq must include it — the gate pins that both
  // engines' null-safe operator means the same thing.
  // ------------------------------------------------------------------
  def nullSafeEq(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = nullableEvents(spark, sfDir).select("k").distinct()
    val eq = keys.as("a").join(keys.as("b"), col("a.k") === col("b.k"))
      .agg(count(lit(1)).as("n")).select(col("n").as("n_eq"))
    val nse = keys.as("a").join(keys.as("b"), col("a.k") <=> col("b.k"))
      .agg(count(lit(1)).as("n")).select(col("n").as("n_nullsafe_eq"))
    eq.crossJoin(nse)
  }

  val nullSafeEqSql: String =
    s"""WITH keys AS (SELECT DISTINCT k FROM ($nullableEventsDuck)),
       |eq AS (SELECT count(*) AS n_eq FROM keys a JOIN keys b ON a.k = b.k),
       |nse AS (SELECT count(*) AS n_nullsafe_eq
       |        FROM keys a JOIN keys b ON a.k IS NOT DISTINCT FROM b.k)
       |SELECT n_eq, n_nullsafe_eq FROM eq CROSS JOIN nse""".stripMargin

  val nullSafeEqSparkSql: String =
    s"""WITH keys AS (SELECT DISTINCT k FROM ($nullableEventsSpark)),
       |eq AS (SELECT count(*) AS n_eq FROM keys a JOIN keys b ON a.k = b.k),
       |nse AS (SELECT count(*) AS n_nullsafe_eq
       |        FROM keys a JOIN keys b ON a.k <=> b.k)
       |SELECT n_eq, n_nullsafe_eq FROM eq CROSS JOIN nse""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n_null_agg" -> (nullAgg _),
    "n_null_join" -> (nullJoin _),
    "n_null_distinct" -> (nullDistinct _),
    "n_null_safe_eq" -> (nullSafeEq _))

  val oracles: Map[String, String] = Map(
    "n_null_agg" -> nullAggSql,
    "n_null_join" -> nullJoinSql,
    "n_null_distinct" -> nullDistinctSql,
    "n_null_safe_eq" -> nullSafeEqSql)
}
