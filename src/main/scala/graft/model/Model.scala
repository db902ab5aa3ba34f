package graft.model

import org.apache.spark.sql.types._

/** Core data model of the engine (SURVEY.md §1).
  *
  * The reference pipeline (aws-samples/amazon-kinesis-data-streams-health-check)
  * moves four shapes of data:
  *   trigger event -> tracer record -> metric point -> alarm transition.
  * Schemas are fixed and code-declared in the reference
  * (EventBridgeTriggerEvent.java:10-15, HealthCheckProducerHandler.java:49-54,
  * HealthCheckConsumerHandler.java:72-83, KinesisHealthCheckStack.java:165-182);
  * we declare them as case classes + StructTypes so Spark gets product Encoders
  * and Catalyst sees concrete types.
  */

/** EventBridge-style trigger (reference EventBridgeTriggerEvent.java:10-15). */
final case class TriggerEvent(`type`: String, streamName: String)

/** The one-field tracer payload (reference HealthCheckProducerHandler.java:50). */
final case class TracerPayload(currentInstant: String)

/** A Kinesis-shaped record inside the consumer's envelope (reference
  * consumer test fixture kinesis-event.json:3-18). Payload is opaque bytes;
  * arrival timestamp is epoch SECONDS (whole-second granularity, SURVEY B3).
  */
final case class StreamRecord(
    partitionKey: String,
    sequenceNumber: String,
    data: Array[Byte],
    approximateArrivalTimestamp: Long,
    eventSourceARN: String)

/** A keyed time-series metric point (reference HealthCheckConsumerHandler.java:72-83). */
final case class MetricPoint(
    streamName: String,
    ts: java.sql.Timestamp,
    metricName: String,
    value: Double)

/** One evaluated 1-minute window (reference KinesisHealthCheckStack.java:165-171). */
final case class WindowedMax(
    streamName: String,
    windowStart: java.sql.Timestamp,
    windowEnd: java.sql.Timestamp,
    maxLatency: Double)

/** Alarm status lifecycle (reference KinesisHealthCheckStack.java:172-182;
  * CloudWatch semantics OK/ALARM; missing data treated as BREACHING).
  */
object AlarmStatus {
  val Ok = "OK"
  val Alarm = "ALARM"
}

/** Why an evaluation breached. */
object BreachReason {
  val Threshold = "threshold"
  val MissingData = "missing_data"
  val Anomaly = "anomaly"
  val None = "none"
}

/** How the alarm evaluates a period's observed value: the reference's
  * FIXED threshold compare, or the ADAPTIVE rolling-baseline z-score
  * (CloudWatch anomaly-detection-alarm parity — the band is learned from
  * the trailing closed periods instead of configured). Missing data
  * breaches in both modes.
  */
sealed trait AlarmMode
object AlarmMode {
  case object Fixed extends AlarmMode
  case object Adaptive extends AlarmMode
}

/** Emitted only on state change (reference alarm action Stack.java:183). */
final case class AlarmTransition(
    streamName: String,
    at: java.sql.Timestamp,
    from: String,
    to: String,
    reason: String,
    observedValue: Option[Double])

/** Mutable per-key alarm state carried by the stateful operator (SURVEY O1/O2). */
final case class AlarmState(
    status: String,
    lastWindowEndMs: Long,
    lastObserved: Option[Double])

/** Engine configuration with the reference's fixed identifiers as defaults
  * (SURVEY B7: Stack.java:55,107,166-168; HealthCheckConsumerHandler.java:73-81).
  */
final case class HealthCheckConfig(
    streamName: String = "health-check-stream",
    namespace: String = "KinesisServiceHealthCheck",
    metricName: String = "HealthCheckSinceSeconds",
    dimensionName: String = "StreamName",
    triggerType: String = "KinesisHealthCheckCanary",
    thresholdSeconds: Double = 1.0,
    periodMinutes: Int = 1,
    evaluationPeriods: Int = 1,
    datapointsToAlarm: Int = 1,
    latencyMode: LatencyMode = LatencyMode.ArrivalTime,
    /** SURVEY B1: reference returns after records[0]; default processes all. */
    firstRecordOnly: Boolean = false)

/** SURVEY B2 — arrival-time (shipped, Consumer.java:67) vs event-time
  * (commented alternative, Consumer.java:68) latency.
  */
sealed trait LatencyMode
object LatencyMode {
  case object ArrivalTime extends LatencyMode
  case object EventTime extends LatencyMode
}

object Schemas {
  /** struct<currentInstant: string> — FIXTURES.md §2. */
  val tracerPayload: StructType =
    StructType(Seq(StructField("currentInstant", StringType)))

  /** Kinesis event envelope, mirrors consumer/src/test/resources/kinesis-event.json. */
  val kinesisEnvelope: StructType = StructType(Seq(
    StructField("records", ArrayType(StructType(Seq(
      StructField("kinesis", StructType(Seq(
        StructField("kinesisSchemaVersion", StringType),
        StructField("partitionKey", StringType),
        StructField("sequenceNumber", StringType),
        StructField("data", StringType), // base64 on the wire
        StructField("approximateArrivalTimestamp", LongType)))),
      StructField("eventSource", StringType),
      StructField("eventVersion", StringType),
      StructField("eventID", StringType),
      StructField("eventName", StringType),
      StructField("invokeIdentityArn", StringType),
      StructField("awsRegion", StringType),
      StructField("eventSourceARN", StringType)))))))

  /** Metric point schema (FIXTURES.md §4). */
  val metricPoint: StructType = StructType(Seq(
    StructField("streamName", StringType),
    StructField("ts", TimestampType),
    StructField("metricName", StringType),
    StructField("value", DoubleType)))
}
