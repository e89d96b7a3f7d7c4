package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession

/** The reference engine's runtime configuration as a typed value (SURVEY.md
  * §2 S5): the 12-tuple `MyUtils.getFromJson` parses from `stream.json`
  * (`my-common/src/main/scala/myutils/MyUtils.scala:14-56`; the committed
  * config at reference `stream.json:1-13`).
  *
  * Two faces, same type:
  *
  *   - [[EngineConfig.fromJson]] — file parity: reads the reference's JSON
  *     schema verbatim, including the quirks a drop-in user depends on:
  *     field names with `#` (`#mapper`, `#reducer`), the `"begin,count,
  *     step"` ports string expanded to an explicit port array
  *     (MyUtils.scala:40-52), comma-separated topics split to a set, sleep
  *     times converted ms → ns, and the old-consumer offset vocabulary
  *     (`largest`/`smallest`) preserved as written.
  *   - [[EngineConfig.fromSparkConf]] — the Spark-idiomatic face: every
  *     field overridable via `spark.graft.*` session conf on top of a
  *     given base (defaults to [[EngineConfig.default]]), so a cluster job
  *     configures the engine with `--conf` exactly like any other Spark
  *     knob and the config survives into executors with the session.
  *
  * Wiring: [[EngineConfig.default]] is the single source for the engine's
  * operating constants — `AdaptiveAgg.NumWorkers` (the cost model's m) and
  * `KafkaSource` ingestion params read through it — while the oracle-gated
  * batch queries keep their constants inlined in SQL-visible literals
  * (Shapes/RefQueries document each one against its stream.json line) so
  * the DuckDB oracle texts stay self-contained.
  *
  * Deliberately NOT carried into behavior: `sleep_time_*` throttles
  * (the reference's simulated per-tuple work, MyUtils.scala:57-63 — a
  * benchmark artifact, SURVEY §8.2) are parsed for schema parity but
  * nothing sleeps; `batch_duration` maps to a trigger interval the caller
  * passes to `writeStream.trigger`, not a global.
  */
final case class EngineConfig(
    brokers: String,
    topics: Set[String],
    batchDurationSec: Int,
    ports: Seq[Int],
    numMappers: Int,
    numReducers: Int,
    kafkaOffset: String,
    savePath: String,
    logicTimeSlotMs: Long,
    keySpace: Seq[String],
    sleepMapNs: Long,
    sleepReduceNs: Long) {

  def portsNum: Int = ports.length

  /** Topics in the connector's `subscribe` form. */
  def topicsCsv: String = topics.toSeq.sorted.mkString(",")

  /** Reference offset vocabulary (old Kafka consumer: `largest`/
    * `smallest`, stream.json:8) → Structured Streaming's
    * `startingOffsets`. Pass-through for already-modern values.
    */
  def startingOffsets: String = kafkaOffset match {
    case "largest" => "latest"
    case "smallest" => "earliest"
    case other => other
  }
}

object EngineConfig {

  /** The engine's operating constants, matching the reference's committed
    * stream.json except where this build's fixtures redefine scale:
    * `logicTimeSlotMs` is Shapes.LogicTimeSlotMs (one day — the events
    * fixture spans a month; stream.json:10's 1000 ms matches its
    * second-granular generator) and ports collapse to the 3-source layout
    * (Shapes.PortsNum, = reference L).
    */
  val default: EngineConfig = EngineConfig(
    brokers = "localhost:9092",
    topics = Set("events"),
    batchDurationSec = 4,
    ports = Seq(0, 1, 2),
    numMappers = 12,
    numReducers = 2,
    kafkaOffset = "largest",
    savePath = "/tmp/graft-out",
    logicTimeSlotMs = Shapes.LogicTimeSlotMs,
    keySpace = Seq("A", "B", "C", "D", "E", "F"),
    sleepMapNs = 0L,
    sleepReduceNs = 0L)

  /** `"begin,count,step"` → explicit ports (MyUtils.scala:40-52). The
    * reference `System.exit`s on a malformed string; a library throws.
    */
  def expandPorts(spec: String): Seq[Int] = {
    val parts = spec.split(",")
    require(parts.length == 3, s"ports syntax error: '$spec' (want begin,count,step)")
    val Array(bg, ct, st) = parts.map(_.trim.toInt)
    require(ct > 0, s"ports count must be positive in '$spec'")
    Seq.tabulate(ct)(i => bg + st * i)
  }

  /** Parse the reference's stream.json schema from a file path. */
  def fromJson(path: String): EngineConfig =
    fromJsonString(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  def fromJsonString(source: String): EngineConfig = {
    val root = new ObjectMapper().readTree(source)
    require(root != null && root.isObject, "stream.json is not found or empty")
    def req(field: String): JsonNode = {
      val n = root.get(field)
      require(n != null, s"stream.json missing required field '$field'")
      n
    }
    // The reference reads sleep_time_map_ms/sleep_time_reduce_ms but its
    // committed config carries only sleep_time_ms — honor both spellings,
    // specific over shared.
    val sharedSleepMs =
      Option(root.get("sleep_time_ms")).map(_.asDouble).getOrElse(0.0)
    def sleepNs(field: String): Long =
      (Option(root.get(field)).map(_.asDouble).getOrElse(sharedSleepMs) * 1e6).toLong
    EngineConfig(
      brokers = req("brokers").asText,
      topics = req("topics").asText.split(",").map(_.trim).filter(_.nonEmpty).toSet,
      batchDurationSec = req("batch_duration").asInt,
      ports = expandPorts(req("ports").asText),
      numMappers = req("#mapper").asInt,
      numReducers = req("#reducer").asInt,
      kafkaOffset = req("kafka_offset").asText,
      savePath = req("save_path").asText,
      logicTimeSlotMs = req("logic_time_slot").asLong,
      keySpace = req("key_space").elements.asScala.map(_.asText).toSeq,
      sleepMapNs = sleepNs("sleep_time_map_ms"),
      sleepReduceNs = sleepNs("sleep_time_reduce_ms"))
  }

  /** Overlay `spark.graft.*` session conf onto `base`. Unset keys keep
    * the base value, so `--conf spark.graft.brokers=...` alone is a valid
    * production config.
    */
  def fromSparkConf(spark: SparkSession, base: EngineConfig = default): EngineConfig = {
    def opt(key: String): Option[String] = spark.conf.getOption(s"spark.graft.$key")
    base.copy(
      brokers = opt("brokers").getOrElse(base.brokers),
      topics = opt("topics")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(base.topics),
      batchDurationSec = opt("batchDurationSec").map(_.toInt).getOrElse(base.batchDurationSec),
      ports = opt("ports").map(expandPorts).getOrElse(base.ports),
      numMappers = opt("numMappers").map(_.toInt).getOrElse(base.numMappers),
      numReducers = opt("numReducers").map(_.toInt).getOrElse(base.numReducers),
      kafkaOffset = opt("kafkaOffset").getOrElse(base.kafkaOffset),
      savePath = opt("savePath").getOrElse(base.savePath),
      logicTimeSlotMs = opt("logicTimeSlotMs").map(_.toLong).getOrElse(base.logicTimeSlotMs),
      keySpace = opt("keySpace")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(base.keySpace))
  }
}
