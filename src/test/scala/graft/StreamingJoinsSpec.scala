package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The watermarked stream-stream interval join must produce exactly the
  * pairs a plain recompute finds — matched rows as they become joinable,
  * unmatched clicks as NULL rows once the purchase watermark proves them
  * final.
  */
class StreamingJoinsSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  test("stream-stream interval join emits exactly the recomputed pairs, incl. final NULLs") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"ts")
      .as[(Long, Long, String, Timestamp)].collect().sortBy(_._4.getTime)
    val clicks = ev.filter(_._3 == "click").map(e => (e._1, e._2, e._4))
    val purchases = ev.filter(_._3 == "purchase").map(e => (e._2, e._4))
    clicks.length should be > 50

    // independent truth: every (click, purchase) pair within ±1h raw
    // (±300s yields only 2 matches at sf0.001 — too vacuous a fixture)
    val byUser = purchases.groupBy(_._1)
    val expected = clicks.flatMap { case (id, u, ct) =>
      val ms = byUser.getOrElse(u, Array.empty[(Long, Timestamp)])
        .filter(p => math.abs(p._2.getTime - ct.getTime) <= 3600000L)
      if (ms.isEmpty) Seq((id, u, ct.getTime, None: Option[Long]))
      else ms.toSeq.map(p => (id, u, ct.getTime, Some(p._2.getTime)))
    }.sortBy(t => (t._1, t._4.getOrElse(-1L)))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val pIn = MemoryStream[(Long, Timestamp)]
    val joined = graft.streaming.StreamingJoins.clickPurchaseJoinStream(
      cIn.toDF().toDF("event_id", "user_id", "ts"),
      pIn.toDF().toDF("user_id", "ts"), toleranceSec = 3600)
    val q = joined.writeStream.format("memory").queryName("ssj")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-ssj").toString)
      .outputMode("append").start()
    try {
      // interleaved ordered replay in a few micro-batches
      val horizon = ev.map(_._4.getTime).max
      clicks.grouped(math.max(1, clicks.length / 3))
        .zipAll(purchases.grouped(math.max(1, purchases.length / 3)),
          Array.empty[(Long, Long, Timestamp)], Array.empty[(Long, Timestamp)])
        .foreach { case (cb, pb) =>
          cIn.addData(cb.toSeq); pIn.addData(pb.toSeq)
          q.processAllAvailable()
        }
      // sentinel rows push BOTH watermarks past every real event so
      // unmatched clicks finalize
      val flush = new Timestamp(horizon + 3600 * 1000L)
      cIn.addData(Seq((-1L, -1L, flush))); pIn.addData(Seq((-1L, flush)))
      q.processAllAvailable()

      val got = spark.table("ssj")
        .as[(Long, Long, Timestamp, Option[Timestamp])]
        .collect()
        .filter(_._1 >= 0) // drop the sentinel click row
        .map(t => (t._1, t._2, t._3.getTime, t._4.map(_.getTime)))
        .sortBy(t => (t._1, t._4.getOrElse(-1L)))
      got shouldBe expected
      expected.count(_._4.isDefined) should be > 3 // real matches exist
      expected.count(_._4.isEmpty) should be > 10 // and finalized NULLs too
    } finally q.stop()
  }
}
