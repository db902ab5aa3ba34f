package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pure Column->Column implementations of the reference's scalar operations
  * (SURVEY.md §2.2, P1-P13). Everything here is a composition of built-in,
  * codegen'd Spark SQL functions — no UDFs — so Catalyst collapses chains of
  * these into a single whole-stage-codegen'd projection, mirroring the
  * reference's one fused loop (HealthCheckConsumerHandler.java:64-86) while
  * remaining fully distributed and pushdown-friendly.
  */
object HealthCheckFunctions {

  /** Second-granularity ISO-8601 UTC pattern (reference
    * HealthCheckConsumerHandler.java:104: `yyyy-MM-dd'T'HH:mm:ss'Z'`).
    */
  val IsoPattern = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  /** P6 — epoch/timestamp -> ISO-8601 UTC string, truncated to whole seconds
    * (reference toISO8601UTC, Consumer.java:102-107). Session TZ must be UTC.
    */
  def isoUtc(ts: Column): Column = date_format(ts, IsoPattern)

  /** P7 — parse an ISO-8601 UTC string back to a timestamp
    * (reference Instant.parse, Consumer.java:71).
    */
  def parseIso(s: Column): Column = to_timestamp(s, IsoPattern)

  /** P6 — epoch-seconds long -> timestamp (kinesis approximateArrivalTimestamp,
    * fixture kinesis-event.json:9).
    */
  def fromEpochSeconds(epoch: Column): Column = timestamp_seconds(epoch)

  /** P1+P2 — tracer payload: `{"currentInstant":"<iso>"}` exactly as the
    * producer writes it (Producer.java:49-54; fixture round-trip FIXTURES.md §2).
    */
  def tracerJson(ts: Column): Column =
    to_json(struct(isoUtc(ts).as("currentInstant")))

  /** K1 — tracer payload as UTF-8 bytes (the on-stream form). */
  def tracerBytes(ts: Column): Column = encode(tracerJson(ts), "UTF-8")

  /** P4 — binary -> UTF-8 string decode. Spark 4's `decode` throws
    * MALFORMED_CHARACTER_CODING on invalid bytes — the same strictness as
    * the reference's CharsetDecoder (Consumer.java:41,65). Pipelines that
    * must drop poisoned records instead of failing the batch guard it with
    * [[decodeUtf8Safe]] (SURVEY B4/B5: the gap IS the signal).
    */
  def decodeUtf8(bin: Column): Column = decode(bin, "UTF-8")

  /** P4+B4 — decode yielding NULL for malformed input (conditional branch:
    * the strict decode only evaluates on valid rows).
    */
  def decodeUtf8Safe(bin: Column): Column =
    when(utf8IsValid(bin), decode(bin, "UTF-8"))

  /** B4 — strict validity check (true iff `bin` is well-formed UTF-8). */
  def utf8IsValid(bin: Column): Column = call_function("is_valid_utf8", bin)

  /** P5 — JSON field extraction `/currentInstant` (reference JSON-pointer read,
    * Consumer.java:68).
    */
  def extractInstant(json: Column): Column =
    get_json_object(json, "$.currentInstant")

  /** P9 — stream name from a Kinesis ARN:
    * `arn:aws:kinesis:<region>:<acct>:stream/<name>` -> 6th `:` segment,
    * 2nd `/` segment (reference Consumer.java:97-99; Spark element_at is
    * 1-based vs Java's 0-based split indexing).
    */
  def streamNameFromArn(arn: Column): Column =
    element_at(split(element_at(split(arn, ":"), 6), "/"), 2)

  /** P8+B3 — latency in WHOLE seconds, truncated toward zero exactly like
    * `Duration.between(a, b).toSeconds()` (Consumer.java:71). Both operands
    * are floored to epoch seconds first (unix_timestamp), which matches the
    * reference because its inputs are already second-granularity (B3).
    */
  def latencySeconds(now: Column, since: Column): Column =
    (unix_timestamp(now) - unix_timestamp(since)).cast(LongType)

  /** P10 — long -> double metric value (Consumer.java:78). */
  def toMetricValue(seconds: Column): Column = seconds.cast(DoubleType)

  /** P11 — metric-datum projection (Consumer.java:72-79): fixed metric name,
    * StreamName dimension, double value.
    */
  def metricProjection(streamName: Column, ts: Column, value: Column,
      metricName: String = "HealthCheckSinceSeconds"): Seq[Column] = Seq(
    streamName.as("streamName"),
    ts.as("ts"),
    lit(metricName).as("metricName"),
    toMetricValue(value).as("value"))

  /** P13 — threshold predicate: GREATER_THAN_THRESHOLD, threshold 1
    * (Stack.java:175-177).
    */
  def breachesThreshold(value: Column, threshold: Double = 1.0): Column =
    value > lit(threshold)
}
