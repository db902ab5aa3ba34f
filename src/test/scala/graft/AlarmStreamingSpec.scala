package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.HealthCheckConfig
import graft.streaming.{AlarmPipeline, TransitionEvent}

/** Streaming-semantics tests for the stateful gap/alarm operator
  * (SURVEY §5.3): latency spike => ALARM, recovery => OK, silent period =>
  * missing-data ALARM (TreatMissingData.BREACHING), late data within the
  * watermark lands in its window, M-of-N evaluation. MemoryStream feeds the
  * REAL operator through `transformWithState` on the RocksDB provider — this
  * suite is the verification surface for the streaming half of the engine
  * (no DuckDB oracle can drive a watermark).
  */
class AlarmStreamingSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    new Timestamp((min * 60L + sec) * 1000L)

  /** Run the alarm pipeline over scripted batches of (stream, ts, value). */
  private def run(cfg: HealthCheckConfig, name: String)(
      batches: Seq[(String, Timestamp, Double)]*): Seq[TransitionEvent] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val metrics = input.toDF().toDF("streamName", "ts", "value")
    val q: StreamingQuery = AlarmPipeline.transitions(metrics, cfg)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"chk-$name").toString)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // one empty-advance batch so timers armed in the last data batch fire
      input.addData(Seq.empty); q.processAllAvailable()
      spark.table(name).as[TransitionEvent].collect().toSeq.sortBy(_.atMs)
    } finally q.stop()
  }

  private val cfg = HealthCheckConfig() // threshold 1s, 1 min, 1 of 1

  test("spike => ALARM, recovery => OK; gap => missing-data ALARM persists") {
    val out = run(cfg, "t_spike")(
      Seq(("s", ts(0), 0.5), ("s", ts(1), 5.0), ("s", ts(3), 0.2)),
      // minute 2 silent; minutes 4+ silent; flushes advance the watermark
      Seq(("s", ts(10), 0.3)),
      Seq(("s", ts(11), 0.3)))
    out.map(t => (t.atMs / 60000, t.from, t.to, t.reason)) shouldBe Seq(
      (2L, "OK", "ALARM", "threshold"),    // minute-1 spike, eval at its end
      (4L, "ALARM", "OK", "none"),         // minute-3 recovery
      (5L, "OK", "ALARM", "missing_data")) // minute-4 gap; persists silently
    out.head.observedValue shouldBe Some(5.0)
  }

  test("exactly one transition per state change — silent stream stays ALARM") {
    val out = run(cfg, "t_silent")(
      Seq(("s", ts(0), 0.5)),
      Seq(("s", ts(9), 0.4)), // minutes 1..8 silent
      Seq(("s", ts(10), 0.4)))
    // single OK->ALARM for the first silent minute; no repeats while silent
    out.count(t => t.to == "ALARM") shouldBe 1
    out.head.reason shouldBe "missing_data"
    out.head.atMs shouldBe ts(2).getTime // minute 1 missing, evaluated at 2:00
  }

  test("late data within the watermark lands in its window before evaluation") {
    val out = run(cfg, "t_late")(
      Seq(("s", ts(0), 0.5), ("s", ts(1), 0.3)),
      Seq(("s", ts(0, 30), 7.0)), // late for minute 0, watermark not yet past
      Seq(("s", ts(5), 0.2)),
      Seq(("s", ts(6), 0.2)))
    out.head.to shouldBe "ALARM"
    out.head.atMs shouldBe ts(1).getTime // minute 0 evaluated with the late max
    out.head.observedValue shouldBe Some(7.0)
  }

  test("M-of-N: 2 of 3 datapoints must breach before ALARM") {
    val mn = cfg.copy(evaluationPeriods = 3, datapointsToAlarm = 2)
    val out = run(mn, "t_mofn")(
      Seq(("s", ts(0), 0.5), ("s", ts(1), 5.0), ("s", ts(2), 5.0),
        ("s", ts(3), 0.2), ("s", ts(4), 0.2), ("s", ts(5), 0.2)),
      Seq(("s", ts(9), 0.3)),
      Seq(("s", ts(10), 0.3)))
    out.map(t => (t.atMs / 60000, t.to)) shouldBe Seq(
      (3L, "ALARM"), // minute 2: second breach within the 3-window
      (5L, "OK"),    // minute 4: last 3 = {m2,m3,m4} has 1 breach < 2
      (8L, "ALARM")) // minutes 6-7 silent: 2 missing-data breaches of last 3
  }

  test("flap damping delivers once per quiet period per key, across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def te(k: String, min: Int, to: String) = TransitionEvent(
      k, min * 60000L, if (to == "ALARM") "OK" else "ALARM", to,
      "flap", Some(1.0))
    val input = MemoryStream[TransitionEvent]
    val q = AlarmPipeline.throttleTransitions(input.toDS(), quietMs = 600000L)
      .writeStream.format("memory").queryName("throttle")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-throttle").toString)
      .outputMode("append").start()
    try {
      // a flapping alarm: a transition EVERY minute for 31 minutes,
      // split across two batches (state must carry the last delivery)
      val flaps = (0 to 30).map(m =>
        te("s", m, if (m % 2 == 0) "ALARM" else "OK"))
      input.addData(flaps.take(15)); q.processAllAvailable()
      input.addData(flaps.drop(15) :+ te("t", 3, "ALARM"))
      q.processAllAvailable()
      val got = spark.table("throttle").as[TransitionEvent].collect()
      // 10-min quiet period: minutes 0, 10, 20, 30 deliver for s
      got.filter(_.streamName == "s").map(_.atMs / 60000L).sorted shouldBe
        Seq(0L, 10L, 20L, 30L)
      // independent key: its first transition always delivers
      got.filter(_.streamName == "t").map(_.atMs / 60000L) shouldBe Seq(3L)
    } finally q.stop()
  }

  test("keys are independent: one stream's gap does not alarm another") {
    val out = run(cfg, "t_keys")(
      Seq(("a", ts(0), 0.5), ("a", ts(1), 0.5), ("a", ts(2), 0.5),
        ("a", ts(3), 0.5), ("b", ts(0), 0.5), ("b", ts(3), 0.5)),
      Seq(("a", ts(7), 0.5), ("b", ts(7), 0.5)),
      Seq(("a", ts(8), 0.5), ("b", ts(8), 0.5)))
    val byKey = out.groupBy(_.streamName)
    // b missed minutes 1-2 => ALARM; a was continuous through minute 3
    byKey("b").head.to shouldBe "ALARM"
    byKey("b").head.reason shouldBe "missing_data"
    byKey.get("a").toSeq.flatten
      .filter(t => t.atMs <= ts(4).getTime && t.to == "ALARM") shouldBe empty
  }
}
