package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference engine's actual wire format: Kafka messages whose value
  * is a `;`-joined batch of space-delimited records
  * (`stateless/src/main/scala/cluster/HashJoin.scala:45-48,66` —
  * `.flatMap(_._2.split(";"))` then `split(" ")`), with the source id as
  * the message key in the one-group/star modules
  * (`star-join-stateless/src/main/scala/cluster/HHJoin.scala:39-45`).
  *
  * These parsers take any (key, value) string relation — a Kafka batch
  * read, `spark.readStream.format("kafka")`, a MemoryStream of raw lines,
  * or a text file — and produce the engine's two record shapes. Pure
  * narrow projections: explode + split pipeline into the scan, fully
  * codegen'd, no shuffle.
  */
object WireFormat {

  /** `"<ts> <port> <word>"` records from `;`-joined message values
    * → (event_time, port, word). Blank segments (trailing `;`) drop.
    */
  def parsePortWord(messages: Dataset[String]): DataFrame =
    messages.toDF("value")
      .select(explode(split(col("value"), ";")).as("rec"))
      .where(length(trim(col("rec"))) > 0)
      .select(split(col("rec"), " ").as("f"))
      .select(
        element_at(col("f"), 1).cast("long").as("event_time"),
        element_at(col("f"), 2).cast("int").as("port"),
        element_at(col("f"), 3).as("word"))

  /** The permissive parser above assumes the reference's generator-fed
    * wellformed streams — under ANSI mode (Spark 4 default) one malformed
    * numeric ABORTS the whole job mid-stream. This strict variant
    * tolerates malformed input (`try_cast`), enforces the 3-field shape,
    * and routes violations to a side relation with the raw segment
    * preserved (the dead-letter pattern): at 100 TB you audit and replay
    * rejects; the pipeline never stops and never silently drops. Both
    * branches are narrow projections off the same exploded relation.
    */
  def parsePortWordWithRejects(messages: Dataset[String]): (DataFrame, DataFrame) = {
    val rec = messages.toDF("value")
      .select(explode(split(col("value"), ";")).as("rec"))
      .where(length(trim(col("rec"))) > 0)
      .select(col("rec"), split(col("rec"), " ").as("f"))
      .withColumn("event_time", expr("try_cast(element_at(f, 1) AS BIGINT)"))
      .withColumn("port", expr("try_cast(element_at(f, 2) AS INT)"))
      .withColumn("word", element_at(col("f"), 3))
    val ok = size(col("f")) === 3 &&
      col("event_time").isNotNull && col("port").isNotNull && col("word").isNotNull
    (rec.where(ok).select("event_time", "port", "word"),
      rec.where(!ok).select(col("rec").as("raw")))
  }

  /** Keyed wire form: (sourceId, `"<ts> <z> <x>;..."`) → (event_time,
    * relation, z, x) — the star-join/one-group shape where the Kafka key
    * carries the relation id.
    */
  def parseKeyedZx(messages: Dataset[(String, String)]): DataFrame =
    messages.toDF("key", "value")
      .select(col("key").cast("int").as("relation"),
        explode(split(col("value"), ";")).as("rec"))
      .where(length(trim(col("rec"))) > 0)
      .select(col("relation"), split(col("rec"), " ").as("f"))
      .select(
        element_at(col("f"), 1).cast("long").as("event_time"),
        col("relation"),
        element_at(col("f"), 2).as("z"),
        element_at(col("f"), 3).cast("long").as("x"))
}
