package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.HealthCheckConfig

/** A1 in its canonical streaming form (SURVEY §1.1/§2.3): watermarked
  * 1-minute tumbling window MAX as a standalone streaming aggregation —
  * windows emit exactly once (append mode) when the watermark passes, and
  * late-but-within-watermark data lands in its window.
  */
class WindowedMaxStreamSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  test("streaming tumbling-window max emits closed windows once, honoring late data") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    def ts(min: Int, sec: Int = 0) = new Timestamp((min * 60 + sec) * 1000L)
    val agg = input.toDF().toDF("streamName", "ts", "value")
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("streamName"))
      .agg(max("value").as("maxLatency"), count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("streamName"),
        col("maxLatency"), col("n"))
    val q = agg.writeStream.format("memory").queryName("winmax")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-wm").toString)
      .outputMode("append").start()
    try {
      input.addData(Seq(("s", ts(0, 10), 1.0), ("s", ts(0, 40), 3.0),
        ("s", ts(1, 5), 2.0)))
      q.processAllAvailable()
      // late row for minute 0, still within the 2-minute watermark
      input.addData(Seq(("s", ts(0, 50), 9.0)))
      q.processAllAvailable()
      // advance watermark past minute 1 to close both windows
      input.addData(Seq(("s", ts(5), 0.5)))
      q.processAllAvailable()
      input.addData(Seq.empty); q.processAllAvailable()
      val out = spark.table("winmax")
        .select($"start", $"maxLatency", $"n")
        .as[(Timestamp, Double, Long)].collect().sortBy(_._1.getTime)
      out.length shouldBe 2 // minutes 0 and 1 closed; minute 5 still open
      out(0) shouldBe ((ts(0), 9.0, 3L)) // late 9.0 included in its window
      out(1) shouldBe ((ts(1), 2.0, 1L))
    } finally q.stop()
  }
}
