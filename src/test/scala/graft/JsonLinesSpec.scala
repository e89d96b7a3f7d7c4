package graft

import graft.sources.JsonLines
import org.apache.spark.sql.functions._

class JsonLinesSpec extends SparkSpec {

  test("JSONL round trip is the identity on a real fixture") {
    val dir = writeFixture(documents = Seq(
      doc(0, "plain words here"),
      doc(7, "text with \"quotes\" and a \\ backslash", lang = "de", source = "src9"),
      doc(9, "unicode: éü中")))
    val got = rows(JsonLines.roundTrip(spark, dir))
    val want = rows(Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source"))
    assert(got === want)
  }

  test("malformed lines route to dead letters; well-formed rows survive") {
    val s = spark
    import s.implicits._
    val lines = Seq(
      """{"doc_id": 1, "text": "good", "lang": "en", "source": "s"}""",
      "not json at all",
      """{"text": "valid json but no id"}""").toDF("line")
    val parsed = JsonLines.parse(lines)
    val ok = JsonLines.wellFormed(parsed).collect()
    assert(ok.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    assert(ok.head.getAs[String]("text") === "good")
    val dead = JsonLines.deadLetters(parsed).collect()
    assert(dead.length === 2)
    assert(dead.exists(_.getAs[String]("payload").contains("not json")))
    // Valid-JSON-but-contract-violating rows keep their ORIGINAL payload
    // too (the _corrupt column is NULL for them — the raw line fills in).
    assert(dead.exists(_.getAs[String]("payload") ===
      """{"text": "valid json but no id"}"""))
  }
}
