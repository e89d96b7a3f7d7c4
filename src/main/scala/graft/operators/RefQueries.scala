package graft.operators

import graft.{Shapes, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's four query shapes (SURVEY.md §2.1), re-expressed
  * as declarative Spark SQL plans. Every hand-rolled two-phase aggregation
  * in the reference (partial/final `mapPartitions` + explicit
  * `partitionBy`, e.g. stateless/cluster/PartialKeyJoin.scala:51-82)
  * becomes a plain `groupBy` — Catalyst's HashAggregateExec plans the
  * partial/final split and the map-side combine automatically, which is
  * also what absorbs key skew that the reference needed PKG/APK
  * partitioners for.
  */
object RefQueries {

  /** Q1 — per-dataset grouped min-of-counts
    * ("minimum count of each word in each port",
    * stateless/src/main/scala/cluster/HashJoin.scala:11-12, 51-62).
    *
    * Scale: two shuffles (word,port) then (word); the first aggregation
    * partial-aggregates map-side so the shuffle carries at most
    * |words|×|ports| rows per input partition regardless of data size.
    */
  def q1MinCountPerPort(spark: SparkSession, sfDir: String): DataFrame =
    Shapes.portWordEvents(spark, sfDir)
      .groupBy("word", "port").agg(count(lit(1)).as("cnt"))
      .groupBy("word").agg(min("cnt").as("min_cnt"))

  val q1Sql: String =
    """SELECT word, min(cnt) AS min_cnt FROM (
      |  SELECT event_type AS word, user_id % 3 AS port, count(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |) GROUP BY word""".stripMargin
}
