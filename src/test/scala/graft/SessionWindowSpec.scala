package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming session windows — the native `session_window` aggregation under
  * a watermark, the streaming counterpart of RangeSession.sessionize: events
  * within the gap merge into one session; a quiet gap closes it when the
  * watermark passes.
  */
class SessionWindowSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  test("streaming session_window merges activity bursts and closes on the gap") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    def ts(s: Int) = new Timestamp(s * 1000L)
    val sessions = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-sess").toString)
      .outputMode("append").start()
    try {
      // burst of 3 events within the gap, then silence, then a later burst
      input.addData(Seq((7L, ts(0)), (7L, ts(10)), (7L, ts(25))))
      q.processAllAvailable()
      input.addData(Seq((7L, ts(120))))  // new session; watermark closes first
      q.processAllAvailable()
      input.addData(Seq((7L, ts(300)))) // closes the second
      q.processAllAvailable()
      input.addData(Seq.empty); q.processAllAvailable()
      val out = spark.table("sessions_out")
        .select($"start", $"end", $"n_events")
        .as[(Timestamp, Timestamp, Long)].collect().sortBy(_._1.getTime)
      out.length shouldBe 2
      // first session: events at 0,10,25 merge; window extends gap past last
      out(0)._1 shouldBe ts(0)
      out(0)._2 shouldBe ts(55) // 25s + 30s gap
      out(0)._3 shouldBe 3L
      out(1)._1 shouldBe ts(120)
      out(1)._3 shouldBe 1L
    } finally q.stop()
  }
}
