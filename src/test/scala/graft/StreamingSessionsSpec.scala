package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.StreamingSessions

/** Streaming sessionization vs the batch operator: replaying the events
  * fixture through the native session window yields exactly the batch
  * sessions (the fixture has no exact-gap tick, where the two boundary
  * conventions would differ — asserted).
  */
class StreamingSessionsSpec extends AnyFunSuite with Matchers
    with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("closed streaming sessions equal the batch sessionize rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = graft.sources.Tables.events(spark, sf)
    // no event lands at the exact 30-minute boundary (where the native
    // window's >= split and the batch lag's > split disagree)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    events
      .withColumn("prev", lag($"ts", 1)
        .over(Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .filter(unix_timestamp($"ts") - unix_timestamp($"prev") === 1800L)
      .count() shouldBe 0L

    val rows = events.select($"user_id", $"ts", $"event_id")
      .as[(Long, Timestamp, Long)].collect().toSeq.sortBy(_._2.getTime)
    // a far-future flush event advances the watermark past every session
    val flush = (Long.MaxValue,
      new Timestamp(rows.map(_._2.getTime).max + 86400000L), Long.MaxValue)

    val input = MemoryStream[(Long, Timestamp, Long)]
    val q = StreamingSessions.sessionizeStream(
        input.toDF().toDF("user_id", "ts", "event_id"))
      .writeStream.format("memory").queryName("sessions_twin")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("chk-sessions").toString)
      .outputMode("append").start()
    try {
      val (c1, c2) = rows.splitAt(rows.length / 2)
      input.addData(c1)
      q.processAllAvailable()
      input.addData(c2 :+ flush)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sessions_twin")
      .filter($"user_id" =!= Long.MaxValue)
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        $"duration_s")
      .as[(Long, Timestamp, Timestamp, Long, Long)]
      .collect().toSeq.sorted

    val batch = graft.operators.RangeSession.sessionize(spark, sf)
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        $"duration_s")
      .as[(Long, Timestamp, Timestamp, Long, Long)]
      .collect().toSeq.sorted

    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }
}
