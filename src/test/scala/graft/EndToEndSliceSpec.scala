package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.HealthCheckFunctions._
import graft.model.{HealthCheckConfig, LatencyMode}
import graft.streaming.{AlarmPipeline, HealthCheckConsumer, TracerProducer, TransitionEvent}

/** SURVEY §7.2's minimum end-to-end slice as a streaming test:
  *
  *   ticks -> tracer (P1,P2,K1 partition key) -> loopback "stream" with an
  *   arrival timestamp -> decode/parse/latency (P4-P8) -> metric (P9-P11)
  *   -> stateful window/threshold/gap alarm (A1,P13,O1,O2) -> memory sink
  *   (O3).
  *
  * Latency mode is EventTime with `now` injected as the arrival instant, so
  * latency == (arrival - produced) == the skew we script per tick — fully
  * deterministic. A poisoned payload (invalid UTF-8) produces no metric and
  * the minute surfaces as a missing-data ALARM — the reference's whole
  * error story (B4/B5: Consumer.java:41,87-93; the gap IS the signal).
  */
class EndToEndSliceSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  /** ticks (producedAt, skewSeconds, poisoned) -> alarm transitions. */
  private def runSlice(name: String)(
      batches: Seq[(Timestamp, Int, Boolean)]*): Seq[TransitionEvent] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Int, Boolean)]
    val ticks = input.toDF().toDF("timestamp", "skew", "poisoned")

    // producer stage (P1/P2/K1: same functions fromTicks uses) + loopback
    // "stream": arrival = produced + skew; a poisoned record gets invalid
    // UTF-8 bytes (B4)
    val records = ticks.select(
      isoUtc(col("timestamp")).as("partitionKey"),
      isoUtc(col("timestamp")).as("sequenceNumber"),
      when(col("poisoned"), lit(Array[Byte](0xff.toByte, 0xfe.toByte)))
        .otherwise(tracerBytes(col("timestamp"))).as("data"),
      (unix_timestamp(col("timestamp")) + col("skew").cast("long"))
        .as("approximateArrivalTimestamp"),
      lit("arn:aws:kinesis:eu-west-1:1:stream/health-check-stream")
        .as("eventSourceARN"))

    // consumer stage: event-time latency with now = arrival instant
    val metrics = HealthCheckConsumer.metrics(records,
      HealthCheckConfig(latencyMode = LatencyMode.EventTime),
      now = fromEpochSeconds(col("approximateArrivalTimestamp")))

    val q = AlarmPipeline.transitions(metrics).writeStream
      .format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"chk-$name").toString)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Seq.empty); q.processAllAvailable()
      spark.table(name).as[TransitionEvent].collect().toSeq.sortBy(_.atMs)
    } finally q.stop()
  }

  test("healthy cadence stays OK; a slow tick trips the alarm; recovery returns OK") {
    val out = runSlice("e2e_slow")(
      Seq((ts(0), 0, false), (ts(1), 5, false), (ts(2), 0, false),
        (ts(3), 0, false)),
      Seq((ts(8), 0, false)),  // flush watermark (minutes 4..7 gap)
      Seq((ts(9), 0, false)))
    // minute 1: latency 5s > 1s threshold
    out.head.to shouldBe "ALARM"
    out.head.reason shouldBe "threshold"
    out.head.observedValue shouldBe Some(5.0)
    out.head.atMs shouldBe ts(2).getTime
    // minute 2 recovery
    out(1).to shouldBe "OK"
    out(1).atMs shouldBe ts(3).getTime
  }

  test("poisoned batch: no metric emitted, minute surfaces as missing-data ALARM (B4/B5)") {
    val out = runSlice("e2e_poison")(
      Seq((ts(0), 0, false), (ts(1), 0, true), (ts(2), 0, false),
        (ts(3), 0, false)),
      Seq((ts(8), 0, false)),
      Seq((ts(9), 0, false)))
    out.head.to shouldBe "ALARM"
    out.head.reason shouldBe "missing_data" // poisoned minute had no metric
    out.head.atMs shouldBe ts(2).getTime
    out(1).to shouldBe "OK"                 // clean minute 2 recovers
    out(1).atMs shouldBe ts(3).getTime
  }

  test("tracer partition key spreads by timestamp (B6) and round-trips the payload") {
    val tick = Seq(ts(7)).toDF("timestamp")
    val row = TracerProducer.fromTicks(tick, HealthCheckConfig()).collect().head
    row.getAs[String]("partitionKey") shouldBe "1970-01-01T00:07:00Z"
    // consumer extracts the same instant back out of the payload bytes (P5)
    val extracted = Seq(row.getAs[Array[Byte]]("data")).toDF("data")
      .select(extractInstant(decodeUtf8(col("data")))).as[String].head()
    extracted shouldBe "1970-01-01T00:07:00Z"
  }
}
