package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the shared parquet fixtures (TESTDATA.md).
  *
  * All gated queries read these tables; nothing is synthesized. Paths are
  * `\$sfDir/<name>.parquet`, one file per table, so at cluster scale the
  * same loaders would point at a partitioned directory instead — the query
  * code is unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(MICROS) in the live fixtures
    // (arrives as TimestampType); earlier fixture generations used
    // TIMESTAMP(NANOS), which Spark only reads with the legacy conf (as
    // epoch-nanos Long). Shapes.eventTimeMs dispatches on whichever type
    // arrives, so keep the conf set defensively — a no-op for micros —
    // in case the fixture generation or calling session changes.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
