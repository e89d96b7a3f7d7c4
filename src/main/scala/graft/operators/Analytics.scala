package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic warehouse-analytics queries over the TPC-H-ish star schema —
  * capabilities a user migrating off the reference would run next to the
  * stream queries (scan → filter → join → multi-measure agg → top-n).
  *
  * Exactness rule: money columns are DOUBLE in the fixtures; summing
  * doubles is partial-aggregation-order dependent, so every summed
  * measure is first cast to DECIMAL(18,2) — decimal addition is exact and
  * associative, so Spark's partial/final split and DuckDB's single-pass
  * sum agree bit-for-bit. The final outputs are cast back to DOUBLE
  * (exact → nearest double is deterministic) because the gate reads
  * Spark parquet decimals and DuckDB decimals through different Python
  * dtypes and would flag equal values as mismatched.
  */
object Analytics {

  /** TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) —
    * quantity/price/discounted sums and row count.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("decimal(18,2)").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        // Keep the full scale-4 product exact — rounding each row to 2
        // decimals hits exact .xx50 halves where engine rounding modes
        // differ; the exact sum is cast once, to double, with no rounding.
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .as("disc_price"))
      .groupBy("l_returnflag", "l_linestatus")
      // Sums stay at DECIMAL(38,x) until the final DOUBLE cast: narrowing
      // to (18,2)/(28,4) NULLs on overflow in Spark (non-ANSI) while
      // DuckDB errors — at 100× the fixtures the two engines would
      // diverge. (38,x) holds any realistic corpus sum exactly.
      .agg(
        sum("qty").cast("decimal(38,2)").cast("double").as("sum_qty"),
        sum("price").cast("decimal(38,2)").cast("double").as("sum_price"),
        sum("disc_price").cast("decimal(38,4)").cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_price,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Top-5 customers by exact (decimal) order revenue per market segment —
    * join + grouped agg + deterministic windowed top-n (ties broken by
    * customer key). The join side is the dimension (broadcast); top-n via
    * rank runs on the grouped (small) relation.
    */
  val TopN = 5L

  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    val revenue = o.groupBy("o_custkey")
      // (38,2): a (18,2) result cast would NULL on overflow at scale.
      .agg(sum("price").cast("decimal(38,2)").as("revenue_dec"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
    revenue
      // Rank on the exact decimal; expose the value as double (the gate
      // reads Spark decimals and DuckDB decimals through different dtypes).
      .withColumn("revenue", col("revenue_dec").cast("double"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("c_mktsegment")
          .orderBy(col("revenue_dec").desc, col("c_custkey"))))
      .where(col("rnk") <= TopN)
      .select(col("c_mktsegment"), col("rnk"), col("c_custkey"),
        col("revenue"), col("n_orders"))
  }

  val topCustomersSql: String =
    s"""SELECT c_mktsegment, rnk, c_custkey, revenue, n_orders FROM (
       |  SELECT c.c_mktsegment, c.c_custkey,
       |    CAST(r.revenue_dec AS DOUBLE) AS revenue, r.n_orders,
       |    row_number() OVER (PARTITION BY c.c_mktsegment
       |      ORDER BY r.revenue_dec DESC, c.c_custkey) AS rnk
       |  FROM (
       |    SELECT o_custkey,
       |      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue_dec,
       |      count(*) AS n_orders
       |    FROM orders GROUP BY o_custkey) r
       |  JOIN customer c ON r.o_custkey = c.c_custkey)
       |WHERE rnk <= $TopN""".stripMargin

  // ------------------------------------------------------------------
  // Rollup reporting: order counts by (segment, priority) with subtotal
  // and grand-total rows — GROUPING SETS capability. Rollup NULLs are
  // coalesced to 'ALL' on both engines so the gate never compares NULL
  // ordering semantics.
  // ------------------------------------------------------------------
  def revenueRollup(spark: SparkSession, sfDir: String): DataFrame = {
    // SQL front door (spark.sql over parquet file paths): the Dataset
    // rollup API trips Spark's ambiguous-self-join detection on the
    // re-tagged grouping attributes; the SQL path resolves cleanly and
    // demonstrates the engine's plain-SQL entry point.
    Tables.load(spark, sfDir, "orders") // ensures nanosAsLong-style confs
    spark.sql(
      s"""SELECT coalesce(c_mktsegment, 'ALL') AS segment,
         |       coalesce(o_orderpriority, 'ALL') AS priority,
         |       count(*) AS n_orders
         |FROM parquet.`$sfDir/orders.parquet` o
         |JOIN parquet.`$sfDir/customer.parquet` c ON o.o_custkey = c.c_custkey
         |GROUP BY ROLLUP(c_mktsegment, o_orderpriority)""".stripMargin)
  }

  val revenueRollupSql: String =
    """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY ROLLUP(c_mktsegment, o_orderpriority)""".stripMargin

  // ------------------------------------------------------------------
  // ANN evaluation: per-query recall of the LSH top-k against the
  // brute-force top-k (integer hit counts — the measurement a pipeline
  // runs before trusting the approximate path at scale).
  // ------------------------------------------------------------------
  def lshRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = Similarity.cosineTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.lshTopK(spark, sfDir)
      .select(col("query_id").as("a_query"), col("neighbor_id").as("a_neighbor"))
    exact.join(approx,
        col("query_id") === col("a_query") && col("neighbor_id") === col("a_neighbor"),
        "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k"),
        sum(when(col("a_neighbor").isNotNull, 1L).otherwise(0L)).as("hits"))
  }

  val lshRecallSql: String =
    s"""WITH exact AS (${Similarity.cosineTopKSql}),
       |approx AS (${Similarity.lshTopKSql})
       |SELECT e.query_id, count(*) AS k,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
       |FROM exact e LEFT JOIN approx a
       |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |GROUP BY e.query_id""".stripMargin

  // ------------------------------------------------------------------
  // Time-series similarity over the event stream (cf. "Time Series
  // Similarity Search for Streaming Data in Distributed Systems", EDBT
  // 2019 — PAPERS.md): each key z gets a daily-count profile vector;
  // pairwise profile similarity via the exact-integer dot/cosine
  // machinery. Key space is small (grouped relation), so the pairwise
  // stage is trivially broadcastable; the heavy part — building profiles
  // — is one two-phase aggregation over the stream.
  // ------------------------------------------------------------------
  def timeseriesSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.VectorOps.longDot
    import graft.Shapes
    val counts = Shapes.withLtw(Shapes.zxEvents(spark, sfDir), Shapes.LogicTimeSlotMs)
      .groupBy("z", "ltw").agg(count(lit(1)).as("cnt"))
    // Dense day-aligned profiles over the global [lo, hi] day range —
    // missing days are explicit zeros so vector positions line up.
    val bounds = counts.agg(min("ltw").as("lo"), max("ltw").as("hi"))
    val profiles = counts
      .groupBy("z")
      .agg(map_from_entries(collect_list(struct(col("ltw"), col("cnt")))).as("m"))
      .crossJoin(broadcast(bounds))
      .withColumn("profile",
        expr("transform(sequence(lo, hi), d -> coalesce(element_at(m, d), 0L))"))
      .withColumn("norm", longDot(col("profile"), col("profile")))
    profiles.as("a").join(profiles.as("b"), col("a.z") < col("b.z"))
      .select(col("a.z").as("z_a"), col("b.z").as("z_b"),
        longDot(col("a.profile"), col("b.profile")).as("dot"),
        col("a.norm").as("na"), col("b.norm").as("nb"))
  }

  val timeseriesSimilaritySql: String =
    s"""WITH counts AS (
       |  SELECT event_type AS z, epoch_ms(ts) // ${graft.Shapes.LogicTimeSlotMs} AS ltw,
       |         count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |bounds AS (SELECT min(ltw) AS lo, max(ltw) AS hi FROM counts),
       |profiles AS (
       |  SELECT z,
       |    list_transform(range(lo, hi + 1),
       |      d -> CAST(coalesce(vals[list_position(ltws, d)], 0) AS BIGINT)) AS profile
       |  FROM (SELECT z, list(ltw ORDER BY ltw) AS ltws, list(cnt ORDER BY ltw) AS vals
       |        FROM counts GROUP BY z) CROSS JOIN bounds),
       |np AS (
       |  SELECT z, profile,
       |    CAST(list_sum(list_transform(range(1, len(profile) + 1),
       |      i -> profile[i] * profile[i])) AS BIGINT) AS norm
       |  FROM profiles)
       |SELECT a.z AS z_a, b.z AS z_b,
       |  CAST(list_sum(list_transform(range(1, len(a.profile) + 1),
       |    i -> a.profile[i] * b.profile[i])) AS BIGINT) AS dot,
       |  a.norm AS na, b.norm AS nb
       |FROM np a JOIN np b ON a.z < b.z""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a_pricing_summary" -> (pricingSummary _),
    "a_top_customers" -> (topCustomers _),
    "a_revenue_rollup" -> (revenueRollup _),
    "a_timeseries_similarity" -> (timeseriesSimilarity _),
    "s_lsh_recall" -> (lshRecall _))

  val oracles: Map[String, String] = Map(
    "a_pricing_summary" -> pricingSummarySql,
    "a_top_customers" -> topCustomersSql,
    "a_revenue_rollup" -> revenueRollupSql,
    "a_timeseries_similarity" -> timeseriesSimilaritySql,
    "s_lsh_recall" -> lshRecallSql)
}
