package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL face of the reference query family: every q1–q4 shape as a
  * `spark.sql` text over registered temp views — the one idiom a query
  * engine must speak that the Column-API forms alone don't prove. The
  * graft native expressions are already SQL-reachable through
  * [[GraftExtensions]]; this adds the RELATIONS (base fixture tables
  * plus the two reference parse shapes `graft_pw` / `graft_zx` as SQL
  * views), so a user can sit at a SQL prompt and run the whole
  * reference surface with no Scala.
  *
  * These are not new operators: SqlParitySpec pins each text
  * result-equal to its gated DataFrame twin (same Catalyst planner
  * underneath — the spec proves the two surfaces describe the same
  * logical plan family, pushdowns and partial aggregates included).
  * Window ids stay integer `event_time div slot`, heavy-hitter
  * thresholds stay the integer `cnt*60 > total` predicate — the same
  * parity rules as everywhere (functions/Parity.scala).
  */
object SqlQueries {

  private val slot = Shapes.LogicTimeSlotMs

  /** Register the fixture tables + parse-shape views for `sfDir` in the
    * session catalog. The `events.ts` adapter mirrors
    * [[Shapes.eventTimeMs]]: epoch-nanos LongType (the fixture parquet
    * under `nanosAsLong`) divides to ms; a timestamp-typed column goes
    * through unix_millis.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("customer")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.region(spark, sfDir).createOrReplaceTempView("region")
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    val et = {
      import org.apache.spark.sql.types.LongType
      spark.table("events").schema("ts").dataType match {
        case LongType => "ts div 1000000"
        case _        => "unix_millis(CAST(ts AS TIMESTAMP))"
      }
    }
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW graft_pw AS
         |SELECT $et AS event_time, pmod(user_id, 3) AS port, event_type AS word
         |FROM events""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW graft_zx AS
         |SELECT $et AS event_time, event_type AS z,
         |  CAST(floor(value) AS BIGINT) AS x
         |FROM events""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW graft_events AS
         |SELECT $et AS event_time, event_id, user_id, event_type, value
         |FROM events""".stripMargin)
  }

  /** Reference query name → Spark SQL text. Keys match the gated
    * `SparkEntry.queries` names, so the parity spec pairs them directly.
    */
  val sql: Map[String, String] = Map(
    "q1_min_count_per_port" ->
      """SELECT word, min(cnt) AS min_cnt FROM (
        |  SELECT word, port, count(*) AS cnt FROM graft_pw GROUP BY word, port)
        |GROUP BY word""".stripMargin,
    "q2_windowed_min_complete" ->
      s"""SELECT word, ltw,
         |  CASE WHEN count(*) = ${Shapes.PortsNum} THEN min(cnt)
         |       ELSE CAST(0 AS BIGINT) END AS min_cnt
         |FROM (
         |  SELECT word, event_time div ${slot}L AS ltw, port, count(*) AS cnt
         |  FROM graft_pw GROUP BY word, ltw, port)
         |GROUP BY word, ltw""".stripMargin,
    "q3_windowed_count" ->
      s"""SELECT z, event_time div ${slot}L AS ltw, count(*) AS cnt
         |FROM graft_zx GROUP BY z, ltw""".stripMargin,
    "q3_windowed_max" ->
      s"""SELECT z, event_time div ${slot}L AS ltw, max(x) AS max_x
         |FROM graft_zx GROUP BY z, ltw""".stripMargin,
    "q3_windowed_sum" ->
      s"""SELECT z, event_time div ${slot}L AS ltw, sum(x) AS sum_x
         |FROM graft_zx GROUP BY z, ltw""".stripMargin,
    "q3_sliding_count" ->
      s"""SELECT z, hop, count(*) AS cnt FROM (
         |  SELECT z, explode(sequence(ltw - 1, ltw)) AS hop FROM (
         |    SELECT z, event_time div ${slot}L AS ltw FROM graft_zx))
         |GROUP BY z, hop""".stripMargin,
    "q3_heavy_hitters" ->
      s"""WITH counts AS (
         |  SELECT event_time div ${slot}L AS ltw, z, count(*) AS cnt
         |  FROM graft_zx GROUP BY ltw, z),
         |totals AS (SELECT ltw, sum(cnt) AS total FROM counts GROUP BY ltw)
         |SELECT c.ltw, c.z, c.cnt AS cnt
         |FROM counts c JOIN totals t ON c.ltw = t.ltw
         |WHERE c.cnt * 60 > t.total""".stripMargin,
    "q4_star_cardinality" ->
      """SELECT z, c0 * c1 * c2 AS card FROM (
        |  SELECT word AS z,
        |    sum(CASE WHEN port = 0 THEN 1L ELSE 0L END) AS c0,
        |    sum(CASE WHEN port = 1 THEN 1L ELSE 0L END) AS c1,
        |    sum(CASE WHEN port = 2 THEN 1L ELSE 0L END) AS c2
        |  FROM graft_pw GROUP BY word)""".stripMargin,
    "q4_windowed_cardinality" ->
      s"""SELECT z, ltw, c0 * c1 * c2 AS card FROM (
         |  SELECT word AS z, event_time div ${slot}L AS ltw,
         |    sum(CASE WHEN port = 0 THEN 1L ELSE 0L END) AS c0,
         |    sum(CASE WHEN port = 1 THEN 1L ELSE 0L END) AS c1,
         |    sum(CASE WHEN port = 2 THEN 1L ELSE 0L END) AS c2
         |  FROM graft_pw GROUP BY word, ltw)""".stripMargin,
    "q4_star_join" ->
      """SELECT c_mktsegment, count(*) AS li_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_amplify" ->
      s"""SELECT z, event_time div ${slot}L AS ltw, count(*) AS cnt FROM (
         |  SELECT z, event_time, explode(array_repeat(1, 3)) AS dup
         |  FROM graft_zx)
         |GROUP BY z, ltw""".stripMargin,
    // Warehouse analytics family — the same decimal-exact arithmetic as
    // the Column forms (identical CASTs, so the final doubles are
    // bit-equal; see functions/Parity).
    "a_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "a_regional_revenue" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "a_brand_revenue" ->
      """SELECT p_brand,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        |  sum(CAST(floor(l_quantity) AS BIGINT)) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "a_market_share" ->
      """WITH by_nation AS (
        |  SELECT year(o_orderdate) AS o_year, n_name,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |      AS DECIMAL(38,4)) AS rev_dec
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2)
        |SELECT CAST(o_year AS BIGINT) AS o_year, n_name,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(rev_dec AS DOUBLE) /
        |    CAST(CAST(sum(rev_dec) OVER (PARTITION BY o_year) AS DECIMAL(38,4)) AS DOUBLE)
        |    AS share
        |FROM by_nation""".stripMargin,
    "a_daily_active" ->
      """SELECT event_time div 86400000 AS day,
        |  count(DISTINCT user_id) AS dau, count(*) AS n_events
        |FROM graft_events GROUP BY 1""".stripMargin)

  /** Run one reference query through the SQL surface. */
  def run(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(sql(name))
  }
}
