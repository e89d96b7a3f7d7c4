package graft

import graft.sources.{KafkaSource, WireFormat}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Kafka wire rows as the connector delivers them (key/value BINARY plus
  * routing metadata) — top-level so Spark encoders see it.
  */
case class KafkaWireRow(
    key: Array[Byte], value: Array[Byte], topic: String, partition: Int,
    offset: Long, timestamp: java.sql.Timestamp, timestampType: Int)

/** S1 (Kafka direct source) proof, brokerless: the record adapters take
  * ANY relation with Kafka's wire schema, so a handwritten DataFrame (and
  * a MemoryStream) with `key BINARY, value BINARY, topic, partition,
  * offset, timestamp` drives the full parse path end-to-end — exactly the
  * contract of the reference's direct stream
  * (`stateless/src/main/scala/cluster/HashJoin.scala:64-66` value wire
  * batches; keyed form
  * `star-join-stateless/src/main/scala/cluster/HHJoin.scala:39-45`).
  * [[KafkaSource.reader]] itself is asserted on plan construction only
  * (format + connector options) — the connector jar is absent offline.
  */
class KafkaSourceSpec extends SparkSpec {

  private def wireRow(key: String, value: String, offset: Long): KafkaWireRow =
    KafkaWireRow(
      if (key == null) null else key.getBytes("UTF-8"),
      value.getBytes("UTF-8"),
      "graft-in", 0, offset, new java.sql.Timestamp(offset), 0)

  private def kafkaBatch(rows: Seq[KafkaWireRow]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF()
  }

  test("portWordRecords parses `;`-joined wire batches from Kafka values") {
    val df = kafkaBatch(Seq(
      wireRow(null, "10 0 alpha;20 0 alpha;30 1 alpha", 0L),
      // Trailing `;` makes a blank segment — must drop, not null-row.
      wireRow(null, "40 2 alpha;50 0 beta;", 1L)))
    val got = rows(KafkaSource.portWordRecords(df))
    assert(got === Set(
      Seq(10L, 0, "alpha"), Seq(20L, 0, "alpha"), Seq(30L, 1, "alpha"),
      Seq(40L, 2, "alpha"), Seq(50L, 0, "beta")))
  }

  test("keyedZxRecords reads the relation id from the Kafka message key") {
    val df = kafkaBatch(Seq(
      wireRow("1", "100 a 7;200 b 8", 0L),
      wireRow("2", "300 a 9", 1L)))
    val got = rows(KafkaSource.keyedZxRecords(df))
    assert(got === Set(
      Seq(100L, 1, "a", 7L), Seq(200L, 1, "b", 8L), Seq(300L, 2, "a", 9L)))
  }

  test("end-to-end: wire batches through the Q1 plan match the hand count") {
    val df = kafkaBatch(Seq(
      wireRow(null, "10 0 alpha;20 0 alpha;30 1 alpha", 0L),
      wireRow(null, "40 2 alpha;50 0 beta;", 1L)))
    val q1 = graft.operators.RefQueries.q1Plan(KafkaSource.portWordRecords(df))
    // alpha: counts (2,1,1) over ports 0,1,2 → min 1; beta: port 0 only → 1.
    assert(rows(q1) === Set(Seq("alpha", 1L), Seq("beta", 1L)))
  }

  test("adapters compose unchanged over a streaming relation with the wire schema") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[KafkaWireRow]
    val query = KafkaSource.portWordRecords(input.toDF())
      .writeStream.format("memory").queryName("kafka_wire_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(wireRow(null, "10 0 alpha;20 1 beta", 0L)))
      query.processAllAvailable()
      input.addData(Seq(wireRow(null, "30 2 gamma;", 1L)))
      query.processAllAvailable()
      val got = s.table("kafka_wire_stream").collect().map(_.toSeq).toSet
      assert(got === Set(
        Seq(10L, 0, "alpha"), Seq(20L, 1, "beta"), Seq(30L, 2, "gamma")))
    } finally query.stop()
  }

  test("reader configures the kafka format and connector options") {
    val r = KafkaSource.reader(spark, brokers = "broker1:9092,broker2:9092",
      topics = "events-in", startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(50000L))
    // The DataStreamReader keeps source + options in private fields; the
    // connector jar is absent offline, so assert plan construction by
    // reflecting over the instance state rather than calling load().
    def fieldValues(o: AnyRef): Seq[Any] = {
      var c: Class[_] = o.getClass
      val vs = Seq.newBuilder[Any]
      while (c != null) {
        c.getDeclaredFields.foreach { f =>
          f.setAccessible(true)
          vs += f.get(o)
        }
        c = c.getSuperclass
      }
      vs.result()
    }
    val state = fieldValues(r).map(String.valueOf).mkString("\n")
    assert(state.contains("kafka"), "format must be kafka")
    for (opt <- Seq("broker1:9092,broker2:9092", "events-in", "earliest", "50000"))
      assert(state.contains(opt), s"missing connector option value: $opt")
    // Backpressure knob is optional — absent unless requested.
    val bare = fieldValues(
      KafkaSource.reader(spark, "b:9092", "t")).map(String.valueOf).mkString("\n")
    assert(!bare.contains("maxOffsetsPerTrigger"))
    assert(bare.contains("latest"))
  }

  test("reference topology end to end: keyed wire stream → relation split → stream star join") {
    import graft.streaming.StreamingParity
    import graft.streaming.StreamingParity.ZxEvent
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    // The reference's actual deployment: ONE Kafka topic, message key =
    // relation id, star join across the three relations
    // (star-join-stateless/src/main/scala/cluster/HHJoin.scala:39-78).
    // Here the single wire stream splits into three branches (each with
    // its own watermark inside streamStarJoin) joined per (z, window).
    val input = MemoryStream[KafkaWireRow]
    val parsed = KafkaSource.keyedZxRecords(input.toDF())
    def rel(i: Int) = parsed.where(col("relation") === i)
      .select(col("event_time"), col("z"), col("x")).as[ZxEvent]
    val query = StreamingParity.streamStarJoin(rel(0), rel(1), rel(2))
      .writeStream.format("memory").queryName("wire_star")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      input.addData(Seq(
        wireRow("0", "10 K 1;20 K 2;30 M 3", 0L),
        wireRow("1", "40 K 10", 1L),
        wireRow("2", "50 K 100;60 K 101", 2L)))
      query.processAllAvailable()
      val got = s.table("wire_star").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val expected = for (xa <- Set(1L, 2L); xc <- Set(100L, 101L))
        yield ("K", 0L, xa, 10L, xc)
      assert(got === expected)
    } finally query.stop()
  }

  test("WireFormat and KafkaSource agree (adapter is a pure relay)") {
    val s = spark
    import s.implicits._
    val df = kafkaBatch(Seq(wireRow("3", "7 z 11;8 y 12", 0L)))
    val direct = WireFormat.parseKeyedZx(
      df.select(col("key").cast("string"), col("value").cast("string"))
        .as[(String, String)])
    assert(rows(KafkaSource.keyedZxRecords(df)) === rows(direct))
  }
}
