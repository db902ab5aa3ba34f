package graft

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.Base64

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.{HealthCheckConfig, LatencyMode, Schemas}
import graft.streaming.{HealthCheckConsumer, TracerProducer}

/** Ports of the reference's three test shapes (SURVEY §5):
  *  1. exact-output producer test (producer HandlerTest.java:30-49):
  *     partition key = the instant string, payload = exact JSON bytes;
  *  2. golden-fixture consumer test (consumer HandlerTest.java:31-42 over
  *     kinesis-event.json): envelope -> metric with the fixture's base64
  *     payload and epoch-seconds arrival timestamp;
  *  3. failure paths (HandlerTest.java:44-56, B4/B5): a poisoned record
  *     yields NO metric row and NO exception — the gap is the signal.
  */
class ProducerConsumerSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  // fixture values (consumer/src/test/resources/kinesis-event.json:3-18)
  private val FixtureB64 = "eyJjdXJyZW50SW5zdGFudCI6ICIyMDIyLTEwLTE3VDEwOjAwOjAwWiJ9"
  private val FixtureArrivalEpoch = 1666014770L
  private val FixtureArn =
    "arn:aws:kinesis:eu-west-1:123456789012:stream/health-check-stream"

  private def envelopeDf(dataB64: String) = {
    val json =
      s"""{"records":[{"kinesis":{"kinesisSchemaVersion":"1.0",
         |"partitionKey":"2022-10-17T10:00:00Z","sequenceNumber":"4954511",
         |"data":"$dataB64","approximateArrivalTimestamp":$FixtureArrivalEpoch},
         |"eventSource":"aws:kinesis","eventVersion":"1.0","eventID":"shardId-0:4954511",
         |"eventName":"aws:kinesis:record","invokeIdentityArn":"arn:aws:iam::1:role/r",
         |"awsRegion":"eu-west-1","eventSourceARN":"$FixtureArn"}]}""".stripMargin
    spark.read.schema(Schemas.kinesisEnvelope).json(Seq(json).toDS())
  }

  test("producer: tick -> exact tracer record (HandlerTest.java:30-49 shape)") {
    val tick = Seq(Timestamp.valueOf("2022-10-17 10:00:00")).toDF("timestamp")
    val out = TracerProducer.fromTicks(tick, HealthCheckConfig()).collect().head
    out.getAs[String]("type") shouldBe "KinesisHealthCheckCanary"
    out.getAs[String]("streamName") shouldBe "health-check-stream"
    // partition key IS the instant string (Producer.java:53, B6)
    out.getAs[String]("partitionKey") shouldBe "2022-10-17T10:00:00Z"
    new String(out.getAs[Array[Byte]]("data"), StandardCharsets.UTF_8) shouldBe
      """{"currentInstant":"2022-10-17T10:00:00Z"}"""
  }

  test("consumer: golden fixture envelope -> one metric with whole-second latency") {
    val records = HealthCheckConsumer.fromEnvelope(envelopeDf(FixtureB64))
    records.count() shouldBe 1
    val r = records.collect().head
    r.getAs[Array[Byte]]("data") shouldBe Base64.getDecoder.decode(FixtureB64)
    r.getAs[Long]("approximateArrivalTimestamp") shouldBe FixtureArrivalEpoch

    // HandlerTest pins "non-null seconds result": with now = arrival + 5s the
    // arrival-mode latency is exactly 5
    val now = lit(Timestamp.from(
      java.time.Instant.ofEpochSecond(FixtureArrivalEpoch + 5)))
    val m = HealthCheckConsumer.metrics(records, HealthCheckConfig(), now)
      .collect().head
    m.getAs[String]("streamName") shouldBe "health-check-stream"
    m.getAs[String]("metricName") shouldBe "HealthCheckSinceSeconds"
    m.getAs[Double]("value") shouldBe 5.0
  }

  test("consumer: event-time mode measures produce->consume latency (B2)") {
    val records = HealthCheckConsumer.fromEnvelope(envelopeDf(FixtureB64))
    // payload instant 2022-10-17T10:00:00Z = epoch 1666000800
    val now = lit(Timestamp.from(java.time.Instant.ofEpochSecond(1666000800L + 7)))
    val m = HealthCheckConsumer.metrics(records,
      HealthCheckConfig(latencyMode = LatencyMode.EventTime), now).collect().head
    m.getAs[Double]("value") shouldBe 7.0
  }

  test("failure path: malformed UTF-8 payload yields no metric, no exception (B4/B5)") {
    // 0xFF 0xFE is not valid UTF-8; base64-encode it into the fixture shape
    val badB64 = Base64.getEncoder.encodeToString(
      Array[Byte](0x7b, 0xff.toByte, 0xfe.toByte, 0x7d))
    val records = HealthCheckConsumer.fromEnvelope(envelopeDf(badB64))
    val out = HealthCheckConsumer.metrics(records)
    out.count() shouldBe 0 // swallowed; surfaces later as a gap (O1)
  }

  test("failure path: valid UTF-8 but wrong JSON yields no metric in event-time mode") {
    val wrongB64 = Base64.getEncoder.encodeToString(
      """{"other":"field"}""".getBytes(StandardCharsets.UTF_8))
    val records = HealthCheckConsumer.fromEnvelope(envelopeDf(wrongB64))
    val out = HealthCheckConsumer.metrics(records,
      HealthCheckConfig(latencyMode = LatencyMode.EventTime))
    out.count() shouldBe 0
  }

  test("B1 batch twin: firstRecordOnly keeps earliest sequence per (stream, second)") {
    val rows = Seq(
      ("k1", "100", "a".getBytes, 1666014770L, FixtureArn),
      ("k1", "101", "b".getBytes, 1666014770L, FixtureArn),
      ("k1", "102", "c".getBytes, 1666014771L, FixtureArn))
      .toDF("partitionKey", "sequenceNumber", "data",
        "approximateArrivalTimestamp", "eventSourceARN")
    val out = HealthCheckConsumer.metrics(rows,
      HealthCheckConfig(firstRecordOnly = true),
      lit(Timestamp.from(java.time.Instant.ofEpochSecond(1666014780L))))
    out.count() shouldBe 2 // one per distinct arrival second
  }
}
