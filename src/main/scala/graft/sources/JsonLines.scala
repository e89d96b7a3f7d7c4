package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines ingestion for the documents shape — the format most raw
  * text corpora actually arrive in. Built on the engine's native JSON
  * machinery (`from_json` with PERMISSIVE mode and a corrupt-record
  * column), so parsing is a codegen'd per-row projection into the scan:
  * no UDFs, no shuffle, and malformed lines ROUTE instead of failing the
  * job — the same dead-letter discipline as [[WireFormat.parsePortWord]]'s
  * blank-segment drop, but with the rejected payload preserved for
  * inspection.
  *
  * The gated query `p_jsonl_roundtrip` proves losslessness end-to-end:
  * the documents table is serialized to JSON lines with `to_json` and
  * parsed back with [[parse]]; the DuckDB oracle is simply the original
  * table, so a hash match IS the proof that encode→parse is the
  * identity on real data (ids, text, lang, source — every value and
  * every row). At 100 TB the parse is scan-bound and embarrassingly
  * parallel; schema mismatches surface as dead-letter rows, never as a
  * stage failure.
  */
object JsonLines {

  /** The documents wire schema plus the corrupt-record sink column. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("_corrupt", StringType)))

  /** Parse a relation of raw JSON lines (column `line`) into the
    * documents shape. Well-formed rows carry NULL `_corrupt`; malformed
    * rows carry the offending payload there with NULL fields — split
    * downstream with [[wellFormed]] / [[deadLetters]]. The raw `line`
    * rides along so dead letters that ARE valid JSON but fail the
    * contract (no doc_id, null struct) still keep their original
    * payload — `_corrupt` only captures lines the JSON parser itself
    * rejected.
    */
  def parse(lines: DataFrame): DataFrame =
    lines.select(col("line"), from_json(col("line"), docSchema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
      .select(col("r.doc_id"), col("r.text"), col("r.lang"),
        col("r.source"), col("r._corrupt"), col("line"))

  def wellFormed(parsed: DataFrame): DataFrame =
    parsed.where(col("_corrupt").isNull && col("doc_id").isNotNull)
      .drop("_corrupt", "line")

  def deadLetters(parsed: DataFrame): DataFrame =
    parsed.where(col("_corrupt").isNotNull || col("doc_id").isNull)
      .select(coalesce(col("_corrupt"), col("line")).as("payload"))

  /** Gated round trip: documents → JSON lines → parsed documents. The
    * oracle is the original table — equality proves the identity.
    */
  def roundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val lines = Tables.documents(spark, sfDir)
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"))).as("line"))
    wellFormed(parse(lines))
  }

  val roundTripSql: String =
    "SELECT doc_id, text, lang, source FROM documents"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p_jsonl_roundtrip" -> (roundTrip _))

  val oracles: Map[String, String] = Map(
    "p_jsonl_roundtrip" -> roundTripSql)
}
