package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HealthCheckFunctions._
import graft.model.HealthCheckConfig

/** The producer stage (SURVEY §2 S1, P1, P2, K1; reference
  * HealthCheckProducerHandler.java:46-63 + the EventBridge schedule
  * Stack.java:106-117).
  *
  * A rate-style source plays the 1-minute EventBridge tick; each tick becomes
  * one tracer record `{"currentInstant":"<iso>"}` whose partition key IS the
  * timestamp string (SURVEY B6 — per-tick distinct keys spread canaries
  * uniformly across stream shards, which at scale means uniform distribution
  * across Spark partitions too).
  */
object TracerProducer {

  /** Streaming tracer source. `rate-micro-batch` is used (rather than `rate`)
    * because its timestamps are deterministic given `startTimestamp` — the
    * micro-batch is the analogue of one Lambda invocation, so the batch
    * timestamp is the reference's per-invocation `Instant.now()` (P1).
    */
  def tracerStream(spark: SparkSession, cfg: HealthCheckConfig = HealthCheckConfig(),
      rowsPerBatch: Int = 1, startTimestampMs: Option[Long] = None): DataFrame = {
    val reader = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toLong)
    val withStart = startTimestampMs.fold(reader)(ms =>
      reader.option("startTimestamp", ms))
    fromTicks(withStart.load(), cfg)
  }

  /** Pure tick->tracer transform, shared by the streaming and batch paths:
    * builds the trigger-event constants (S1), the tracer JSON payload (P1+P2)
    * and the partition-key column (K1/B6).
    */
  def fromTicks(ticks: DataFrame, cfg: HealthCheckConfig): DataFrame =
    ticks.select(
      lit(cfg.triggerType).as("type"),
      lit(cfg.streamName).as("streamName"),
      isoUtc(col("timestamp")).as("partitionKey"),
      tracerBytes(col("timestamp")).as("data"),
      col("timestamp").as("producedAt"))
}
