package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** How S2 (the record-stream scan) is wired. The reference hardwires a
  * Kinesis event source mapping (KinesisHealthCheckStack.java:149-162);
  * the engine makes the source a CONFIG SEAM so the same downstream
  * pipeline (explode -> decode -> latency -> alarm) runs against test and
  * production sources unchanged.
  *
  * @param format  [[StreamSources.EnvelopeFiles]] (streaming json dir of
  *                Kinesis-shaped envelopes — the sandbox/test source),
  *                [[StreamSources.Kinesis]] (the `spark-sql-kinesis`
  *                connector — production; jar not present in this sandbox),
  *                or any registered streaming format producing the envelope
  *                schema.
  * @param path    source directory for file-based formats.
  * @param options passed through to the reader (for Kinesis e.g.
  *                streamName/region/endpointUrl/startingPosition).
  */
final case class StreamSourceConfig(
    format: String = StreamSources.EnvelopeFiles,
    path: Option[String] = None,
    options: Map[String, String] = Map.empty)

/** Factory for the S2 record stream: returns the flattened record columns
  * (partitionKey, sequenceNumber, data: binary, approximateArrivalTimestamp:
  * epoch seconds, eventSourceARN) from whatever source the config names —
  * the production swap is a config value, not a code change:
  *
  * {{{
  * // tests / sandbox: envelope fixture files
  * StreamSources.recordStream(spark,
  *   StreamSourceConfig(path = Some("/data/envelopes")))
  * // production: real Kinesis via the spark-sql-kinesis connector jar
  * StreamSources.recordStream(spark, StreamSourceConfig(
  *   format = StreamSources.Kinesis,
  *   options = Map("streamName" -> "health-check-stream",
  *     "region" -> "eu-west-1", "startingPosition" -> "LATEST")))
  * }}}
  */
object StreamSources {

  /** Streaming json directory of Kinesis-shaped envelopes (S3 fixture
    * schema, kinesis-event.json) — what tests and the sandbox use.
    */
  val EnvelopeFiles = "envelope-files"

  /** The open-source `spark-sql-kinesis` connector's format name. The jar is
    * NOT on this sandbox's classpath (no network); the branch exists so the
    * production wiring is real code behind config, declared as the
    * environmental stub it is.
    */
  val Kinesis = "aws-kinesis"

  def recordStream(spark: SparkSession,
      cfg: StreamSourceConfig = StreamSourceConfig()): DataFrame =
    cfg.format match {
      case EnvelopeFiles =>
        val path = cfg.path.getOrElse(throw new IllegalArgumentException(
          s"$EnvelopeFiles source requires StreamSourceConfig.path"))
        HealthCheckConsumer.fromEnvelope(
          spark.readStream
            .schema(Schemas.kinesisEnvelope)
            .options(cfg.options)
            .option("multiLine", value = true)
            .json(path))
      case Kinesis =>
        // The connector emits (data: binary, streamName, partitionKey,
        // sequenceNumber, approximateArrivalTimestamp: timestamp, ...);
        // re-shape to the engine's record columns. ARN reconstructed so P9
        // parsing stays identical (region/account from options).
        val reader = cfg.options.foldLeft(
          spark.readStream.format(Kinesis)) { case (r, (k, v)) => r.option(k, v) }
        val region = cfg.options.getOrElse("region", "us-east-1")
        val account = cfg.options.getOrElse("awsAccountId", "123456789012")
        reader.load().select(
          col("partitionKey"),
          col("sequenceNumber"),
          col("data"),
          unix_timestamp(col("approximateArrivalTimestamp"))
            .as("approximateArrivalTimestamp"),
          concat(lit(s"arn:aws:kinesis:$region:$account:stream/"),
            col("streamName")).as("eventSourceARN"))
      case other =>
        // any registered format already producing the envelope schema
        val reader = cfg.options.foldLeft(
          spark.readStream.format(other)) { case (r, (k, v)) => r.option(k, v) }
        HealthCheckConsumer.fromEnvelope(
          cfg.path.map(reader.load).getOrElse(reader.load()))
    }
}
