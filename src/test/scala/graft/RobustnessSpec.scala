package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.HealthCheckConfig
import graft.operators.TextPipeline
import graft.streaming.{AlarmPipeline, TransitionEvent}

/** Adversarial-shape robustness: the scale claims, exercised.
  *  - dedup under pathological duplication (the skew case the exact
  *    pre-collapse exists for);
  *  - streaming alarm restart from checkpoint — transitions are not lost or
  *    duplicated across a stop/start (state-store recovery).
  */
class RobustnessSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  test("dedup pipeline collapses a 2000-copy page before the LSH band join") {
    val page = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 39).map(i => s"w$i").mkString(" ") + " w99"
    val corpus = ((0 until 2000).map(i => (i.toLong, page)) ++
      Seq((5000L, near), (5001L, (100 to 140).map(i => s"w$i").mkString(" "))))
      .toDF("doc_id", "text")
    val out = TextPipeline.dedupPipelineFrom(spark, corpus).collect()
    // one candidate pair: the 2000-copy representative vs its near-dup
    out.length shouldBe 1
    out.head.getAs[Long]("doc_a") shouldBe 0L
    out.head.getAs[Long]("doc_b") shouldBe 5000L
    out.head.getAs[Long]("copies_a") shouldBe 2000L
    out.head.getAs[Long]("copies_b") shouldBe 1L
  }

  test("streaming dedup restarted from checkpoint does not re-emit seen digests") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("dd-restart").toString
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    // file sink: supports checkpoint recovery with exactly-once commits
    def start() = graft.streaming.StreamingDedup.dedupExactStream(docs, "ts")
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()

    // ts offsets start at 100s: event time exactly 0 would be dropped
    // against the initial watermark (also 0) before reaching the state
    val q1 = start()
    input.addData(Seq(
      (1L, "alpha beta gamma", new Timestamp(100000L)),
      (2L, "delta epsilon", new Timestamp(101000L))))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: the digest state store must survive,
    // so the duplicate of doc 1 is suppressed across the restart boundary
    val q2 = start()
    input.addData(Seq(
      (3L, "alpha beta gamma", new Timestamp(102000L)),
      (4L, "zeta eta", new Timestamp(103000L))))
    q2.processAllAvailable()
    try {
      val ids = spark.read.parquet(s"$root/out").select("doc_id")
        .as[Long].collect().sorted
      ids.toSeq shouldBe Seq(1L, 2L, 4L)
    } finally q2.stop()
  }

  test("alarm stream restarted from checkpoint neither loses nor duplicates transitions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cfg = HealthCheckConfig()
    val root = java.nio.file.Files.createTempDirectory("restart").toString
    def ts(min: Int) = new Timestamp(min * 60000L)

    val input = MemoryStream[(String, Timestamp, Double)]
    val metrics = input.toDF().toDF("streamName", "ts", "value")
    // file sink: the one that actually supports checkpoint recovery with
    // exactly-once file commits (memory sink refuses to recover)
    def start() = AlarmPipeline.transitions(metrics, cfg)
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()

    // phase 1: healthy minute, spike, then stop
    val q1 = start()
    input.addData(Seq(("s", ts(0), 0.5), ("s", ts(1), 5.0)))
    q1.processAllAvailable()
    input.addData(Seq(("s", ts(4), 0.2)))
    q1.processAllAvailable()
    q1.stop()

    // phase 2: restart from the same checkpoint, stream continues
    val q2 = start()
    input.addData(Seq(("s", ts(8), 0.2)))
    q2.processAllAvailable()
    input.addData(Seq(("s", ts(9), 0.2)))
    q2.processAllAvailable()
    input.addData(Seq.empty)
    q2.processAllAvailable()
    try {
      val out = spark.read.parquet(s"$root/out").as[TransitionEvent]
        .collect().sortBy(_.atMs)
      // each state change exactly once across the restart boundary:
      // spike ALARM @2:00, recovery OK @5:00, gap ALARM @6:00 (minute 5)
      out.map(t => (t.atMs / 60000, t.to, t.reason)).toSeq shouldBe Seq(
        (2L, "ALARM", "threshold"),
        (5L, "OK", "none"),
        (6L, "ALARM", "missing_data"))
    } finally q2.stop()
  }

  test("domain-cap stream restarted from checkpoint keeps its admitted counts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("cap-restart").toString
    val input = MemoryStream[(String, Long)]
    // file sink: supports checkpoint recovery with exactly-once commits
    def start() = graft.streaming.StreamingText
      .domainCapStream(input.toDF().toDF("source", "doc_id"), k = 2)
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()

    // batch 1 fills source s to its cap of 2
    val q1 = start()
    input.addData(Seq(("s", 1L), ("s", 2L)))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: the per-source counter must
    // survive, so batch 2's arrival for s is rejected and a new source
    // starts fresh
    val q2 = start()
    input.addData(Seq(("s", 3L), ("t", 4L)))
    q2.processAllAvailable()
    try {
      val out = spark.read.parquet(s"$root/out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(r => (r._1, r._3))
      out.toSeq shouldBe Seq(
        ("s", 1L, 1L), ("s", 2L, 2L), ("t", 4L, 1L))
    } finally q2.stop()
  }
}
