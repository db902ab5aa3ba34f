package graft

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.Base64

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.HealthCheckFunctions._

/** Scalar-function semantics pinned against the reference's values
  * (SURVEY §2.2). The golden payload is the consumer test fixture's:
  * base64 `eyJjdXJyZW50SW5zdGFudCI6ICIyMDIyLTEwLTE3VDEwOjAwOjAwWiJ9` decodes
  * to `{"currentInstant": "2022-10-17T10:00:00Z"}` with arrival epoch
  * 1666014770 (consumer/src/test/resources/kinesis-event.json:8-9).
  */
class HealthCheckFunctionsSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val FixtureB64 = "eyJjdXJyZW50SW5zdGFudCI6ICIyMDIyLTEwLTE3VDEwOjAwOjAwWiJ9"
  private val FixtureArrivalEpoch = 1666014770L // 2022-10-17T13:52:50Z

  test("isoUtc formats second-truncated ISO-8601 UTC (Consumer.java:102-107)") {
    val ts = Timestamp.valueOf("2022-10-17 10:00:00.789")
    val out = Seq(ts).toDF("ts").select(isoUtc($"ts")).as[String].head()
    out shouldBe "2022-10-17T10:00:00Z" // sub-second dropped (B3)
  }

  test("parseIso round-trips isoUtc") {
    val ts = Timestamp.valueOf("2022-10-17 13:52:50")
    val out = Seq(ts).toDF("ts")
      .select(parseIso(isoUtc($"ts"))).as[Timestamp].head()
    out shouldBe ts
  }

  test("tracerJson produces the exact producer payload (Producer.java:49-54)") {
    val out = Seq(Timestamp.valueOf("2022-10-17 10:00:00"))
      .toDF("ts").select(tracerJson($"ts")).as[String].head()
    out shouldBe """{"currentInstant":"2022-10-17T10:00:00Z"}"""
  }

  test("fixture payload decodes and extracts currentInstant (Consumer.java:65-68)") {
    val bytes = Base64.getDecoder.decode(FixtureB64)
    val out = Seq(bytes).toDF("data")
      .select(extractInstant(decodeUtf8($"data"))).as[String].head()
    out shouldBe "2022-10-17T10:00:00Z"
  }

  test("utf8IsValid accepts the fixture and rejects malformed bytes (B4)") {
    val good = Base64.getDecoder.decode(FixtureB64)
    val bad = Array[Byte](0x7b, 0xff.toByte, 0xfe.toByte, 0x7d)
    val out = Seq(("g", good), ("b", bad)).toDF("id", "data")
      .select($"id", utf8IsValid($"data").as("v"))
      .as[(String, Boolean)].collect().toMap
    out("g") shouldBe true
    out("b") shouldBe false
  }

  test("latencySeconds truncates toward zero like Duration.toSeconds (B3)") {
    val now = Timestamp.valueOf("2022-10-17 13:52:55")
    val since = fromEpochSeconds(lit(FixtureArrivalEpoch))
    val out = Seq(1).toDF("x")
      .select(latencySeconds(lit(now), since)).as[Long].head()
    out shouldBe 5L
  }

  test("streamNameFromArn extracts the 6th ':' / 2nd '/' segment (Consumer.java:97-99)") {
    val arn = "arn:aws:kinesis:eu-west-1:123456789012:stream/health-check-stream"
    val out = Seq(arn).toDF("arn")
      .select(streamNameFromArn($"arn")).as[String].head()
    out shouldBe "health-check-stream"
  }

  test("metricProjection emits the fixed identifiers (B7, Consumer.java:72-81)") {
    val row = Seq(("s1", Timestamp.valueOf("2022-10-17 10:00:00"), 3L))
      .toDF("name", "ts", "secs")
      .select(metricProjection($"name", $"ts", $"secs"): _*)
      .collect().head
    row.getString(row.fieldIndex("metricName")) shouldBe "HealthCheckSinceSeconds"
    row.getDouble(row.fieldIndex("value")) shouldBe 3.0
  }

  test("breachesThreshold is strict GREATER_THAN (Stack.java:175-177)") {
    val out = Seq(0.9, 1.0, 1.1).toDF("v")
      .select($"v", breachesThreshold($"v").as("b")).as[(Double, Boolean)]
      .collect().toMap
    out(0.9) shouldBe false
    out(1.0) shouldBe false // strictly greater
    out(1.1) shouldBe true
  }
}
