package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.{AlarmMode, HealthCheckConfig}
import graft.streaming.{AlarmPipeline, StreamingAnomaly, TransitionEvent}

/** AlarmMode.Adaptive: the rolling z-score breach feeding the SAME O1/O2
  * state machine as the fixed threshold (the CloudWatch
  * anomaly-detection-alarm parity). Proven two ways: a spike far below
  * the fixed threshold still alarms adaptively, and the adaptive
  * operator's transitions EQUAL composing `anomalyStream`'s flags (plus
  * missing-data breaches for silent minutes) into a driver-side replay
  * of the same M-of-N machine on an ordered input.
  */
class AdaptiveAlarmSpec extends AnyFunSuite with Matchers
    with SparkTestBase {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  /** Run the adaptive alarm over scripted batches. */
  private def run(cfg: HealthCheckConfig, name: String)(
      batches: Seq[(String, Timestamp, Double)]*): Seq[TransitionEvent] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val metrics = input.toDF().toDF("streamName", "ts", "value")
    val q = AlarmPipeline
      .transitions(metrics, cfg, mode = AlarmMode.Adaptive)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"chk-$name").toString)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Seq.empty); q.processAllAvailable()
      spark.table(name).as[TransitionEvent].collect().toSeq.sortBy(_.atMs)
    } finally q.stop()
  }

  // fixed threshold set far above every value: any ALARM below must come
  // from the adaptive baseline, never the threshold compare
  private val cfg = HealthCheckConfig(thresholdSeconds = 1e9)

  // 35 stable minutes (values 10.0 / 10.5 alternating), a spike at
  // minute 35, recovery after — plus a silent minute 40 for the
  // missing-data path. Values stay far below thresholdSeconds.
  private def series: Seq[(String, Timestamp, Double)] =
    (0 until 35).map(m =>
      ("s", ts(m), if (m % 2 == 0) 10.0 else 10.5)) ++
      Seq(("s", ts(35), 100.0)) ++
      (36 until 40).map(m => ("s", ts(m), 10.0)) ++ // minute 40 silent
      (41 until 45).map(m => ("s", ts(m), 10.0))

  test("a spike below the fixed threshold alarms adaptively; gap still breaches") {
    val out = run(cfg, "t_adaptive")(series, Seq(("s", ts(46), 10.0)),
      Seq(("s", ts(47), 10.0)))
    val triples = out.map(t => (t.atMs / 60000, t.to, t.reason))
    // spike minute 35 (evaluated at 36), recovery at 36 (evaluated 37),
    // silent minute 40 (evaluated 41), recovery at 41 (evaluated 42)
    triples shouldBe Seq(
      (36L, "ALARM", "anomaly"),
      (37L, "OK", "none"),
      (41L, "ALARM", "missing_data"),
      (42L, "OK", "none"))
    out.head.observedValue shouldBe Some(100.0)
  }

  test("adaptive operator == anomalyStream flags fed into the M-of-N machine") {
    // composed reference: anomalyStream (its own streaming query) on the
    // SAME ordered replay yields per-minute is_anomaly flags; silent
    // minutes breach; the driver-side fold below is the literal
    // AlarmStateProcessor evaluation loop
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val events = input.toDF().toDF("event_type", "ts", "value")
    val q = StreamingAnomaly.anomalyStream(events)
      .writeStream.format("memory").queryName("t_anoflags")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-anoflags").toString)
      .outputMode("append").start()
    val flags =
      try {
        input.addData(series)
        q.processAllAvailable()
        spark.table("t_anoflags")
          .select("minute", "is_anomaly")
          .as[(Timestamp, Boolean)].collect()
          .map { case (m, f) => (m.getTime / 60000, f) }.toMap
      } finally q.stop()

    // minutes the adaptive operator evaluates before the final flush:
    // [0, 44]; present = minutes with data
    val present = series.map(_._2.getTime / 60000).toSet
    var status = "OK"
    var history = 0L
    var historyLen = 0
    val expected = Seq.newBuilder[(Long, String, String)]
    (0L to 44L).foreach { m =>
      val breach = if (!present(m)) true else flags.getOrElse(m, false)
      val n = cfg.evaluationPeriods
      history = ((history << 1) | (if (breach) 1L else 0L)) & ((1L << n) - 1)
      historyLen = math.min(historyLen + 1, n)
      val newStatus =
        if (java.lang.Long.bitCount(history) >=
          math.min(cfg.datapointsToAlarm, historyLen)) "ALARM"
        else "OK"
      if (newStatus != status) expected += ((m + 1, status, newStatus))
      status = newStatus
    }

    val out = run(cfg, "t_adaptive_eq")(series,
      Seq(("s", ts(46), 10.0)), Seq(("s", ts(47), 10.0)))
    out.filter(_.atMs / 60000 <= 45)
      .map(t => (t.atMs / 60000, t.from, t.to)) shouldBe expected.result()
  }

  test("batch twin alarmTransitionsAdaptive == the streaming adaptive operator on an ordered replay") {
    // the hc_alarm_adaptive driver query's operator, fed the SAME series
    // the streaming processor replays: transitions must agree minute for
    // minute (batch reports the period START, stream the period END).
    // The batch twin also emits each key's initial-state row (prev_state
    // null); the stream's implicit start is OK, so an initial OK row has
    // no stream counterpart and is dropped before comparing.
    val full = series ++ Seq(("s", ts(46), 10.0), ("s", ts(47), 10.0))
    val events = full.toDF("event_type", "ts", "value")
    val batch = graft.operators.HealthCheckBatch
      .alarmTransitionsAdaptiveFrom(events, cfg)
      .as[(String, Timestamp, String, String, Option[Double])]
      .collect().toSeq
      .map { case (_, m, state, reason, v) =>
        (m.getTime / 60000, state, reason, v)
      }
    val firstMinute = full.map(_._2.getTime / 60000).min
    val batchT = batch.filterNot {
      case (m, state, _, _) => m == firstMinute && state == "OK"
    }
    val out = run(cfg, "t_adaptive_vs_batch")(series,
      Seq(("s", ts(46), 10.0)), Seq(("s", ts(47), 10.0)))
    val streamT = out.map(t =>
      (t.atMs / 60000 - 1, t.to, t.reason, t.observedValue))
    // compare over the horizon both surfaces have certainly evaluated
    // (the stream's last-watermark period; the batch grid ends at max ts)
    batchT.filter(_._1 <= 44) shouldBe streamT.filter(_._1 <= 44)
    batchT.nonEmpty shouldBe true
  }
}
