package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HealthCheckFunctions._
import graft.model.{HealthCheckConfig, LatencyMode}

/** The consumer stage (SURVEY §2 S2/S3, P3-P12; reference
  * HealthCheckConsumerHandler.java:58-95): record batches -> keyed
  * whole-second latency metric points.
  *
  * The whole stage is a single codegen'd projection chain — Catalyst fuses
  * decode -> validate -> parse -> latency -> project into one pass over each
  * partition, the distributed equivalent of the reference's one `for` loop.
  */
object HealthCheckConsumer {

  /** Flatten the Kinesis event envelope (S3 shape, fixture
    * kinesis-event.json): explode records[], base64-decode payloads.
    * P3 — `explode` replaces the reference's per-record Java loop.
    */
  def fromEnvelope(envelopes: DataFrame): DataFrame =
    envelopes
      .select(explode(col("records")).as("r"))
      .select(
        col("r.kinesis.partitionKey").as("partitionKey"),
        col("r.kinesis.sequenceNumber").as("sequenceNumber"),
        unbase64(col("r.kinesis.data")).as("data"),
        col("r.kinesis.approximateArrivalTimestamp")
          .as("approximateArrivalTimestamp"),
        col("r.eventSourceARN").as("eventSourceARN"))

  /** Records -> metric points.
    *
    * Input columns: data (binary), approximateArrivalTimestamp (long epoch
    * seconds), eventSourceARN (string). `now` defaults to
    * `current_timestamp()` (fixed per micro-batch = per "invocation", SURVEY
    * §7.4-2); tests inject a deterministic clock column.
    *
    * B4 — records whose payload is not valid UTF-8 are dropped (the
    * reference's strict decoder throws, the batch yields no metric, and the
    * resulting gap IS the alarm signal). B1 — `firstRecordOnly` mirrors the
    * reference's early `return` after records[0]; default processes all.
    */
  def metrics(records: DataFrame, cfg: HealthCheckConfig = HealthCheckConfig(),
      now: Column = current_timestamp()): DataFrame = {
    val arrivalTs = fromEpochSeconds(col("approximateArrivalTimestamp"))
    val since = cfg.latencyMode match {
      case LatencyMode.ArrivalTime => arrivalTs
      case LatencyMode.EventTime =>
        parseIso(extractInstant(decodeUtf8Safe(col("data"))))
    }
    // B4 (UTF-8 validity) for both modes; in EventTime mode a payload that is
    // valid UTF-8 but not the expected JSON must also yield NO metric (the
    // reference throws on parse -> the gap IS the signal), so drop null
    // `since` rather than emitting a null-valued latency.
    val valid = cfg.latencyMode match {
      case LatencyMode.ArrivalTime => utf8IsValid(col("data"))
      case LatencyMode.EventTime => utf8IsValid(col("data")) && since.isNotNull
    }
    val base = records.filter(valid)
    val limited =
      if (!cfg.firstRecordOnly) base
      else if (records.isStreaming) {
        // B1 compatibility mode, streaming path: non-time window functions
        // are unsupported on streams, so the one-record-per-(stream, arrival
        // second) cut uses dropDuplicatesWithinWatermark keyed on
        // (ARN, arrival second) — state expires with the watermark instead
        // of growing forever. With the reference's deployed batchSize=1 the
        // early return is a per-batch no-op anyway (SURVEY B1).
        base
          .withColumn("__arrival", arrivalTs)
          .withWatermark("__arrival", "2 minutes")
          .dropDuplicatesWithinWatermark(
            "eventSourceARN", "approximateArrivalTimestamp")
          .drop("__arrival")
      } else {
        // batch twin: deterministic earliest-(sequenceNumber) per
        // (stream, arrival second)
        val w = Window
          .partitionBy(col("eventSourceARN"), col("approximateArrivalTimestamp"))
          .orderBy(col("sequenceNumber"))
        base.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    limited.select(
      metricProjection(
        streamNameFromArn(col("eventSourceARN")),
        arrivalTs,
        latencySeconds(now, since),
        cfg.metricName): _*)
  }
}
