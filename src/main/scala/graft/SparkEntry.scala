package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is exposed twice: as a named DataFrame query
  * in [[queries]] and as equivalent DuckDB SQL in [[oracleSql]]. Column
  * names/aliases are kept identical on both sides (the driver's compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.q1MinCountPerPort(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline extensions (text analysis, dedup, ANN).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ Salting.queries ++ Curation.queries ++ Analytics.queries ++
      NullSemantics.queries ++ graft.multimodal.Multimodal.queries ++
      graft.sources.JsonLines.queries ++ Graph.queries ++ Layout.queries ++
      Sketches.queries ++ Retrieval.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RefQueries.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Salting.oracles ++ Curation.oracles ++ Analytics.oracles ++
      NullSemantics.oracles ++ graft.multimodal.Multimodal.oracles ++
      graft.sources.JsonLines.oracles ++ Graph.oracles ++ Layout.oracles ++
      Sketches.oracles ++ Retrieval.oracles
}
