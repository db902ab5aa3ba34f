package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.HealthCheckFunctions._
import graft.model.{HealthCheckConfig, LatencyMode}
import graft.streaming.{AlarmPipeline, HealthCheckConsumer, StreamSinks, TracerProducer, TransitionEvent}

/** The fully DECOUPLED end-to-end slice: two independent streaming queries
  * joined only by the durable K1 channel, exactly like the reference's
  * producer and consumer Lambdas share nothing but the stream.
  *
  *   query 1: ticks -> tracer -> partitioned parquet append (K1)
  *   query 2: file-source scan of that directory -> records -> metrics ->
  *            stateful alarm -> memory sink (S2..O3)
  *
  * The channel carries real bytes on disk; the consumer sees only what the
  * producer committed.
  */
class DecoupledPipelineSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  test("producer and consumer run as separate queries over the durable channel") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("decoupled").toString
    def ts(min: Int) = new Timestamp(min * 60000L)

    // ---- producer query: ticks 0..3 and 8..9 (minutes 4..7 silent) ----
    val ticks = MemoryStream[Timestamp]
    val tracer = TracerProducer.fromTicks(
      ticks.toDF().toDF("timestamp"), HealthCheckConfig())
    ticks.addData(Seq(0, 1, 2, 3, 8, 9).map(ts))
    val pq = StreamSinks.tracerAppend(tracer, s"$root/stream", s"$root/chk-p")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    pq.awaitTermination(60000)

    // ---- consumer query: independent file-source read of the channel ----
    val channelSchema = spark.read.parquet(s"$root/stream").schema
    val records = spark.readStream.schema(channelSchema)
      .parquet(s"$root/stream")
      .select(
        col("partitionKey"),
        col("partitionKey").as("sequenceNumber"),
        col("data"),
        // arrival = produced time (healthy transport)
        unix_timestamp(col("producedAt")).as("approximateArrivalTimestamp"),
        lit("arn:aws:kinesis:eu-west-1:1:stream/health-check-stream")
          .as("eventSourceARN"))
    val metrics = HealthCheckConsumer.metrics(records,
      HealthCheckConfig(latencyMode = LatencyMode.EventTime),
      now = fromEpochSeconds(col("approximateArrivalTimestamp")))
    val cq = AlarmPipeline.transitions(metrics).writeStream
      .format("memory").queryName("decoupled_out")
      .option("checkpointLocation", s"$root/chk-c")
      .outputMode("append").start()
    try {
      cq.processAllAvailable()
      // Timers fire on watermark advance, and the engine only schedules the
      // extra no-data batch opportunistically — so keep the producer ticking
      // (each round appends a file, forcing a consumer data batch that
      // evaluates due timers with the previous batch's watermark) until the
      // expected transitions land. This mirrors production, where the
      // 1-minute canary cadence is what keeps evaluation moving.
      var minute = 10
      val deadline = System.currentTimeMillis() + 120000
      while (spark.table("decoupled_out").count() < 2 &&
        System.currentTimeMillis() < deadline) {
        ticks.addData(Seq(ts(minute))); minute += 1
        val pqN = StreamSinks.tracerAppend(tracer, s"$root/stream", s"$root/chk-p")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        pqN.awaitTermination(60000)
        cq.processAllAvailable()
      }
      val out = spark.table("decoupled_out").as[TransitionEvent].collect()
        .sortBy(_.atMs)
      // healthy minutes 0-3 (latency 0), gap minutes 4-7 => missing-data
      // ALARM at minute 4's end; the second round advances the watermark
      // past minute 8's tick => recovery OK
      out.map(t => (t.atMs / 60000, t.to, t.reason)) shouldBe Seq(
        (5L, "ALARM", "missing_data"),
        (9L, "OK", "none"))
    } finally cq.stop()
  }
}
