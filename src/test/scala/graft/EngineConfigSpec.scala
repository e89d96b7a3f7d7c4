package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** S5 config loader: the reference's stream.json schema
  * (my-common/src/main/scala/myutils/MyUtils.scala:14-56) parsed to the
  * typed EngineConfig, plus the spark.conf overlay face.
  */
class EngineConfigSpec extends SparkSpec {

  private val referenceShapedJson =
    """{
      |  "brokers":"broker-a:9092,broker-b:9092",
      |  "topics":"lch3,aux",
      |  "batch_duration":4,
      |  "ports":"10105,9,2",
      |  "#mapper":12,
      |  "#reducer":2,
      |  "kafka_offset":"largest",
      |  "save_path":"hdfs://nn:9000/lch",
      |  "logic_time_slot":1000,
      |  "key_space": ["A", "B", "C", "D", "E", "F"],
      |  "sleep_time_ms": 1.5
      |}""".stripMargin

  test("parses the reference stream.json schema field-for-field") {
    val cfg = EngineConfig.fromJsonString(referenceShapedJson)
    assert(cfg.brokers == "broker-a:9092,broker-b:9092")
    assert(cfg.topics == Set("lch3", "aux"))
    assert(cfg.batchDurationSec == 4)
    // "10105,9,2" = begin,count,step (MyUtils.scala:40-52)
    assert(cfg.ports.toSeq == (0 until 9).map(i => 10105 + 2 * i))
    assert(cfg.portsNum == 9)
    assert(cfg.numMappers == 12 && cfg.numReducers == 2)
    assert(cfg.kafkaOffset == "largest" && cfg.startingOffsets == "latest")
    assert(cfg.savePath == "hdfs://nn:9000/lch")
    assert(cfg.logicTimeSlotMs == 1000L)
    assert(cfg.keySpace == Seq("A", "B", "C", "D", "E", "F"))
    // shared sleep_time_ms feeds both per-stage sleeps, ms -> ns
    assert(cfg.sleepMapNs == 1500000L && cfg.sleepReduceNs == 1500000L)
  }

  test("per-stage sleep fields override the shared one when present") {
    val cfg = EngineConfig.fromJsonString(
      referenceShapedJson.replace("\"sleep_time_ms\": 1.5",
        "\"sleep_time_ms\": 1.5, \"sleep_time_map_ms\": 2.0"))
    assert(cfg.sleepMapNs == 2000000L && cfg.sleepReduceNs == 1500000L)
  }

  test("reads from a file path like the reference driver") {
    val f = Files.createTempFile("stream", ".json")
    Files.write(f, referenceShapedJson.getBytes(StandardCharsets.UTF_8))
    try assert(EngineConfig.fromJson(f.toString) ==
      EngineConfig.fromJsonString(referenceShapedJson))
    finally Files.delete(f)
  }

  test("malformed ports string and missing fields throw, not exit") {
    intercept[IllegalArgumentException](EngineConfig.expandPorts("10105,9"))
    intercept[IllegalArgumentException](EngineConfig.expandPorts("10105,0,2"))
    intercept[IllegalArgumentException](
      EngineConfig.fromJsonString("""{"brokers":"b"}"""))
    intercept[IllegalArgumentException](EngineConfig.fromJsonString("[]"))
  }

  test("spark.conf overlay: unset keys keep defaults, set keys win") {
    val base = EngineConfig.default
    assert(EngineConfig.fromSparkConf(spark) == base)
    spark.conf.set("spark.graft.brokers", "prod:9092")
    spark.conf.set("spark.graft.numMappers", "48")
    spark.conf.set("spark.graft.ports", "9000,3,1")
    spark.conf.set("spark.graft.kafkaOffset", "smallest")
    try {
      val cfg = EngineConfig.fromSparkConf(spark)
      assert(cfg.brokers == "prod:9092")
      assert(cfg.numMappers == 48)
      assert(cfg.ports.toSeq == Seq(9000, 9001, 9002))
      assert(cfg.startingOffsets == "earliest")
      assert(cfg.logicTimeSlotMs == base.logicTimeSlotMs) // untouched
    } finally {
      Seq("brokers", "numMappers", "ports", "kafkaOffset")
        .foreach(k => spark.conf.unset(s"spark.graft.$k"))
    }
  }

  test("default config is the engine's operating constants") {
    val d = EngineConfig.default
    assert(d.logicTimeSlotMs == Shapes.LogicTimeSlotMs)
    assert(d.portsNum == Shapes.PortsNum)
    assert(d.numMappers == graft.streaming.AdaptiveAgg.NumWorkers)
  }

  test("config drives the Kafka reader builder (S1 wiring)") {
    // The kafka format jar is absent offline; building the reader only
    // configures options, so construction must succeed either way.
    val r = graft.sources.KafkaSource.reader(
      spark, EngineConfig.fromJsonString(referenceShapedJson))
    assert(r != null)
  }
}
