package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.{HealthCheckConfig, Schemas}
import graft.streaming.{HealthCheckConsumer, StreamSourceConfig, StreamSources, StreamingDedup, TracerProducer}

/** Source coverage (SURVEY §2.1): S1 the deterministic rate-micro-batch tick
  * source, S2 the envelope stream through explode/decode on a real streaming
  * DataFrame, S3 the golden fixture read from a FILE with the declared
  * envelope schema — plus the watermarked streaming dedup operators.
  */
class StreamingSourcesSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  test("S1: rate-micro-batch tracer stream emits deterministic ticks") {
    val q = TracerProducer.tracerStream(spark, HealthCheckConfig(),
      rowsPerBatch = 1, startTimestampMs = Some(0L))
      .writeStream.format("memory").queryName("s1_tracer")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-s1").toString)
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("s1_tracer").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val rows = spark.table("s1_tracer").collect()
      rows should not be empty
      val first = rows.minBy(_.getAs[Timestamp]("producedAt").getTime)
      // startTimestamp=0 makes the first tick the epoch — deterministic (P1)
      first.getAs[String]("partitionKey") shouldBe "1970-01-01T00:00:00Z"
      first.getAs[String]("type") shouldBe "KinesisHealthCheckCanary"
      new String(first.getAs[Array[Byte]]("data"), "UTF-8") shouldBe
        """{"currentInstant":"1970-01-01T00:00:00Z"}"""
    } finally q.stop()
  }

  test("S2: envelope batches flow through explode/decode as a real stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val envelopes = input.toDF()
      .select(from_json(col("value"), Schemas.kinesisEnvelope).as("env"))
      .select(col("env.records").as("records"))
    val metrics = HealthCheckConsumer.metrics(
      HealthCheckConsumer.fromEnvelope(envelopes),
      HealthCheckConfig(),
      now = graft.functions.HealthCheckFunctions
        .fromEpochSeconds(col("approximateArrivalTimestamp") + 3))
    val q = metrics.writeStream.format("memory").queryName("s2_metrics")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-s2").toString)
      .outputMode("append").start()
    try {
      val b64 = java.util.Base64.getEncoder.encodeToString(
        """{"currentInstant":"2022-10-17T10:00:00Z"}""".getBytes("UTF-8"))
      input.addData(
        s"""{"records":[{"kinesis":{"kinesisSchemaVersion":"1.0","partitionKey":"pk",
           |"sequenceNumber":"1","data":"$b64","approximateArrivalTimestamp":1666014770},
           |"eventSource":"aws:kinesis","eventVersion":"1.0","eventID":"e1",
           |"eventName":"aws:kinesis:record","invokeIdentityArn":"arn","awsRegion":"eu-west-1",
           |"eventSourceARN":"arn:aws:kinesis:eu-west-1:1:stream/health-check-stream"}]}"""
          .stripMargin.replaceAll("\n", ""))
      q.processAllAvailable()
      val m = spark.table("s2_metrics").collect()
      m.length shouldBe 1
      m.head.getAs[String]("streamName") shouldBe "health-check-stream"
      m.head.getAs[Double]("value") shouldBe 3.0 // injected now = arrival+3
    } finally q.stop()
  }

  test("S3: golden fixture envelope read from a file with the declared schema") {
    val dir = Files.createTempDirectory("fixture")
    val b64 = java.util.Base64.getEncoder.encodeToString(
      """{"currentInstant": "2022-10-17T10:00:00Z"}""".getBytes("UTF-8"))
    // multi-line JSON file, the reference fixture's shape (kinesis-event.json)
    Files.writeString(dir.resolve("kinesis-event.json"),
      s"""{
         |  "records": [
         |    {
         |      "kinesis": {
         |        "kinesisSchemaVersion": "1.0",
         |        "partitionKey": "2022-10-17T10:00:00Z",
         |        "sequenceNumber": "49533603912491631504635834245441018458760798439001555074",
         |        "data": "$b64",
         |        "approximateArrivalTimestamp": 1666014770
         |      },
         |      "eventSource": "aws:kinesis",
         |      "eventVersion": "1.0",
         |      "eventID": "shardId-000000000000:49533603912491631504635834245441018458760798439001555074",
         |      "eventName": "aws:kinesis:record",
         |      "invokeIdentityArn": "arn:aws:iam::123456789012:role/role",
         |      "awsRegion": "eu-west-1",
         |      "eventSourceARN": "arn:aws:kinesis:eu-west-1:123456789012:stream/health-check-stream"
         |    }
         |  ]
         |}""".stripMargin)
    val env = spark.read.schema(Schemas.kinesisEnvelope)
      .option("multiLine", true).json(dir.toString)
    val records = HealthCheckConsumer.fromEnvelope(env)
    val r = records.collect().head
    r.getAs[Long]("approximateArrivalTimestamp") shouldBe 1666014770L
    new String(r.getAs[Array[Byte]]("data"), "UTF-8") shouldBe
      """{"currentInstant": "2022-10-17T10:00:00Z"}"""
  }

  test("S2 factory: envelope-files source streams through the config seam") {
    val dir = Files.createTempDirectory("env-src")
    val b64 = java.util.Base64.getEncoder.encodeToString(
      """{"currentInstant":"2022-10-17T10:00:00Z"}""".getBytes("UTF-8"))
    Files.writeString(dir.resolve("e1.json"),
      s"""{"records":[{"kinesis":{"kinesisSchemaVersion":"1.0","partitionKey":"pk",
         |"sequenceNumber":"1","data":"$b64","approximateArrivalTimestamp":1666014770},
         |"eventSource":"aws:kinesis","eventVersion":"1.0","eventID":"e1",
         |"eventName":"aws:kinesis:record","invokeIdentityArn":"arn","awsRegion":"eu-west-1",
         |"eventSourceARN":"arn:aws:kinesis:eu-west-1:1:stream/health-check-stream"}]}"""
        .stripMargin)
    // the production swap is this config value (format = aws-kinesis), not
    // a code change — same record columns, same downstream pipeline
    val records = StreamSources.recordStream(spark,
      StreamSourceConfig(path = Some(dir.toString)))
    val metrics = HealthCheckConsumer.metrics(records, HealthCheckConfig(),
      now = graft.functions.HealthCheckFunctions
        .fromEpochSeconds(col("approximateArrivalTimestamp") + 5))
    val q = metrics.writeStream.format("memory").queryName("s2_factory")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-s2f").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val m = spark.table("s2_factory").collect()
      m.length shouldBe 1
      m.head.getAs[String]("streamName") shouldBe "health-check-stream"
      m.head.getAs[Double]("value") shouldBe 5.0
    } finally q.stop()
  }

  test("S2 factory Kinesis branch: connector reshape pins ARN rebuild + epoch conversion") {
    // The fake test-classpath source registers the REAL connector short
    // name (aws-kinesis) with the connector's column shape, so the
    // production branch of StreamSources.recordStream — column reshape,
    // ARN reconstruction from region/account options, timestamp ->
    // epoch-seconds — executes verbatim, jar or no jar.
    graft.streaming.testkit.FakeKinesisSource.records = Seq(
      graft.streaming.testkit.FakeKinesisSource.Rec(
        """{"currentInstant":"2022-10-17T10:00:00Z"}""".getBytes("UTF-8"),
        "health-check-stream", "2022-10-17T10:00:00Z",
        "49533603912491631504635834245441018458760798439001555074",
        1666014770L))
    val records = StreamSources.recordStream(spark, StreamSourceConfig(
      format = StreamSources.Kinesis,
      options = Map("region" -> "eu-west-1",
        "awsAccountId" -> "111122223333")))
    // reshape surface: engine record columns out of connector columns
    val rq = records.writeStream.format("memory").queryName("s2_kin_records")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-s2kr").toString)
      .outputMode("append").start()
    try {
      rq.processAllAvailable()
      val r = spark.table("s2_kin_records").collect()
      r.length shouldBe 1
      r.head.getAs[String]("eventSourceARN") shouldBe
        "arn:aws:kinesis:eu-west-1:111122223333:stream/health-check-stream"
      r.head.getAs[Long]("approximateArrivalTimestamp") shouldBe 1666014770L
      new String(r.head.getAs[Array[Byte]]("data"), "UTF-8") shouldBe
        """{"currentInstant":"2022-10-17T10:00:00Z"}"""
    } finally rq.stop()
    // end-to-end: the same downstream metric pipeline, P9 parsing the
    // stream name back OUT of the reconstructed ARN
    val metrics = HealthCheckConsumer.metrics(records, HealthCheckConfig(),
      now = graft.functions.HealthCheckFunctions
        .fromEpochSeconds(col("approximateArrivalTimestamp") + 5))
    val q = metrics.writeStream.format("memory").queryName("s2_kin_metrics")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-s2km").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val m = spark.table("s2_kin_metrics").collect()
      m.length shouldBe 1
      m.head.getAs[String]("streamName") shouldBe "health-check-stream"
      m.head.getAs[Double]("value") shouldBe 5.0
      m.head.getAs[Timestamp]("ts").getTime shouldBe 1666014770000L
    } finally q.stop()
  }

  test("S2 factory backfill: Trigger.AvailableNow consumes the backlog and terminates") {
    val dir = Files.createTempDirectory("env-backfill")
    val b64 = java.util.Base64.getEncoder.encodeToString(
      """{"currentInstant":"2022-10-17T10:00:00Z"}""".getBytes("UTF-8"))
    def envelope(seq: Int, arrival: Long): String =
      s"""{"records":[{"kinesis":{"kinesisSchemaVersion":"1.0","partitionKey":"pk",
         |"sequenceNumber":"$seq","data":"$b64","approximateArrivalTimestamp":$arrival},
         |"eventSource":"aws:kinesis","eventVersion":"1.0","eventID":"e$seq",
         |"eventName":"aws:kinesis:record","invokeIdentityArn":"arn","awsRegion":"eu-west-1",
         |"eventSourceARN":"arn:aws:kinesis:eu-west-1:1:stream/health-check-stream"}]}"""
        .stripMargin
    Files.writeString(dir.resolve("e1.json"), envelope(1, 1666014770L))
    Files.writeString(dir.resolve("e2.json"), envelope(2, 1666014830L))
    val records = StreamSources.recordStream(spark,
      StreamSourceConfig(path = Some(dir.toString)))
    val metrics = HealthCheckConsumer.metrics(records, HealthCheckConfig(),
      now = graft.functions.HealthCheckFunctions
        .fromEpochSeconds(col("approximateArrivalTimestamp") + 1))
    val q = metrics.writeStream.format("memory").queryName("s2_backfill")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-bf").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    // AvailableNow drains the existing backlog then STOPS on its own — the
    // batch-backfill mode of the same streaming pipeline
    q.awaitTermination(60000) shouldBe true
    spark.table("s2_backfill").count() shouldBe 2
  }

  test("B1 exact: a micro-batch spanning 3 arrival seconds emits exactly 1 metric") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val arn = "arn:aws:kinesis:eu-west-1:1:stream/health-check-stream"
    val payload = """{"currentInstant":"2022-10-17T10:00:00Z"}"""
    val input = MemoryStream[(String, String, String, Long, String)]
    val records = input.toDF()
      .toDF("partitionKey", "sequenceNumber", "payload",
        "approximateArrivalTimestamp", "eventSourceARN")
      .withColumn("data", col("payload").cast("binary")).drop("payload")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = HealthCheckConsumer.metricsFirstPerBatch(records,
      now = graft.functions.HealthCheckFunctions
        .fromEpochSeconds(col("approximateArrivalTimestamp") + 2)) { (m, id) =>
      m.collect().foreach { r =>
        got.synchronized {
          got += ((id, r.getAs[Timestamp]("ts").getTime / 1000))
        }
      }
    }.option("checkpointLocation",
      Files.createTempDirectory("chk-b1").toString).start()
    try {
      // ONE micro-batch spanning 3 arrival seconds: the watermarked
      // approximation would emit 3 metrics (one per second); the exact
      // per-batch mode emits exactly 1 — the earliest record's
      input.addData(Seq(
        ("pk", "3", payload, 1666014772L, arn),
        ("pk", "1", payload, 1666014770L, arn),
        ("pk", "2", payload, 1666014771L, arn)))
      q.processAllAvailable()
      got.synchronized {
        got.size shouldBe 1
        got.head._2 shouldBe 1666014770L // earliest (arrival, sequence)
      }
      // the next invocation emits its own single metric
      input.addData(Seq(("pk", "4", payload, 1666014773L, arn)))
      q.processAllAvailable()
      got.synchronized {
        got.size shouldBe 2
        got.last._2 shouldBe 1666014773L
      }
    } finally q.stop()
  }

  test("streaming exact dedup keeps one representative per digest within watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.dedupExactStream(docs, "ts")
      .writeStream.format("memory").queryName("dedup_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-dd").toString)
      .outputMode("append").start()
    try {
      // ts offsets start at 100s: event time exactly 0 is dropped against
      // the initial watermark (also 0) before it reaches the dedup state
      input.addData(Seq(
        (1L, "alpha beta gamma", new Timestamp(100000L)),
        (2L, "alpha beta gamma", new Timestamp(101000L)), // dup of 1
        (3L, "delta epsilon", new Timestamp(102000L))))
      q.processAllAvailable()
      input.addData(Seq(
        (4L, "ALPHA BETA GAMMA", new Timestamp(103000L)))) // dup modulo case
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("doc_id").as[Long]
        .collect().sorted
      // within one micro-batch the surviving representative is arbitrary
      // (1 or 2); the later-batch duplicate (4) must be suppressed
      ids.length shouldBe 2
      Set(1L, 2L) should contain(ids.head)
      ids.last shouldBe 3L
    } finally q.stop()
  }

  test("streaming vocab: windowed token counts finalize on watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = graft.streaming.StreamingText.vocabStream(docs, "ts")
      .writeStream.format("memory").queryName("vocab_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-vs").toString)
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (1L, "alpha beta alpha", new Timestamp(100000L)),
        (2L, "beta gamma", new Timestamp(110000L))))
      q.processAllAvailable()
      // flush: watermark sentinel far past the 1-min window + 10-min delay
      input.addData(Seq((9L, "zz", new Timestamp(30 * 60000L))))
      q.processAllAvailable()
      input.addData(Seq.empty); q.processAllAvailable()
      val counts = spark.table("vocab_stream")
        .select("token", "n").as[(String, Long)].collect().toMap
      counts("alpha") shouldBe 2L
      counts("beta") shouldBe 2L
      counts("gamma") shouldBe 1L
    } finally q.stop()
  }

  test("streaming quality gate filters low-quality docs on ingest") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = graft.streaming.StreamingText.qualityFilterStream(docs)
      .writeStream.format("memory").queryName("quality_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-qs").toString)
      .outputMode("append").start()
    try {
      val good = "the quick brown fox is a fast animal and it is not slow " +
        (1 to 40).map(i => s"word$i").mkString(" ")
      input.addData(Seq(
        (1L, good, new Timestamp(100000L)),
        (2L, "x x x x x x x x", new Timestamp(101000L)))) // low diversity, no stopwords
      q.processAllAvailable()
      val ids = spark.table("quality_stream").select("doc_id").as[Long]
        .collect().sorted
      ids.toSeq shouldBe Seq(1L)
    } finally q.stop()
  }

  test("streaming dedup pipeline keeps one representative for same-batch identical docs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.dedupPipelineStream(docs, "ts")
      .writeStream.format("memory").queryName("pipededup_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-pd").toString)
      .outputMode("append").start()
    try {
      val base = (1 to 40).map(i => s"w$i").mkString(" ")
      // identical docs in ONE micro-batch: the bare near-dedup can suppress
      // both (band keys split arbitrarily); the exact pre-collapse reduces
      // them to one representative before any band key is contested
      input.addData(Seq(
        (1L, base, new Timestamp(100000L)),
        (2L, base, new Timestamp(101000L)),
        (3L, (100 to 140).map(i => s"w$i").mkString(" "), new Timestamp(102000L))))
      q.processAllAvailable()
      input.addData(Seq((99L, "flush sentinel doc", new Timestamp(20 * 60000L))))
      q.processAllAvailable()
      input.addData(Seq.empty); q.processAllAvailable()
      val ids = spark.table("pipededup_stream").select("doc_id").as[Long]
        .collect().filter(_ < 99L).sorted
      ids.length shouldBe 2
      Set(1L, 2L) should contain(ids.head) // exactly one representative
      ids.last shouldBe 3L
    } finally q.stop()
  }

  test("emit-immediate near-dedup: same suppression set, survivors visible in the delivering batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val stream = StreamingDedup.dedupNearStreamImmediate(docs, "ts")
    // 1x-text shuffle shape: the band-dedup input carries text only on the
    // band-0 row (CASE WHEN band = 0), not on all four
    """CASE WHEN \(band#\d+ = 0\) THEN text#\d+""".r
      .findFirstIn(stream.queryExecution.analyzed.toString) should not be empty
    val q = stream
      .writeStream.format("memory").queryName("neardedup_imm")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-ndi").toString)
      .outputMode("append").start()
    try {
      val base = (1 to 40).map(i => s"w$i").mkString(" ")
      val near = (1 to 39).map(i => s"w$i").mkString(" ") + " w99"
      input.addData(Seq(
        (1L, base, new Timestamp(100000L)),
        (3L, (100 to 140).map(i => s"w$i").mkString(" "), new Timestamp(102000L))))
      q.processAllAvailable()
      // LATENCY CONTRACT: survivors visible NOW — no watermark advance, no
      // flush sentinel, no extra batch (the windowed variant's spec needs a
      // 20-minute sentinel before anything appears)
      spark.table("neardedup_imm").select("doc_id").as[Long]
        .collect().sorted.toSeq shouldBe Seq(1L, 3L)
      // identical copy (all bands stale) and a partial-band near-dup: both
      // suppressed — the same set the windowed variant's spec pins
      input.addData(Seq((2L, base, new Timestamp(101000L))))
      q.processAllAvailable()
      input.addData(Seq((4L, near, new Timestamp(103000L))))
      q.processAllAvailable()
      val rows = spark.table("neardedup_imm")
        .select("doc_id", "text").as[(Long, String)].collect()
      rows.map(_._1).sorted.toSeq shouldBe Seq(1L, 3L)
      // text restored for survivors despite riding only the band-0 row
      rows.toMap.apply(1L) shouldBe base
    } finally q.stop()
  }

  test("streaming near-dedup suppresses duplicates agreeing on ANY LSH band") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDedup.dedupNearStream(docs, "ts")
      .writeStream.format("memory").queryName("neardedup_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("chk-nd").toString)
      .outputMode("append").start()
    try {
      val base = (1 to 40).map(i => s"w$i").mkString(" ")
      val near = (1 to 39).map(i => s"w$i").mkString(" ") + " w99"
      // ts offsets start at 100s: a row at event time exactly 0 is dropped
      // against the INITIAL watermark (also 0) before it reaches the state
      input.addData(Seq(
        (1L, base, new Timestamp(100000L)),
        (3L, (100 to 140).map(i => s"w$i").mkString(" "), new Timestamp(102000L))))
      q.processAllAvailable()
      // later batches: an identical copy (all bands collide) and a near-dup
      // sharing SOME bands but not all — the single-band variant this
      // replaces missed the latter whenever band 0 differed
      input.addData(Seq((2L, base, new Timestamp(101000L))))
      q.processAllAvailable()
      input.addData(Seq((4L, near, new Timestamp(103000L))))
      q.processAllAvailable()
      // sentinel far past the 10-minute watermark delay flushes the
      // windowed re-assembly (multi-band survivors emit on watermark)
      input.addData(Seq((99L, "flush sentinel doc", new Timestamp(20 * 60000L))))
      q.processAllAvailable()
      input.addData(Seq.empty); q.processAllAvailable()
      val ids = spark.table("neardedup_stream").select("doc_id").as[Long]
        .collect().filter(_ < 99L).sorted
      ids.toSeq shouldBe Seq(1L, 3L)
    } finally q.stop()
  }
}
