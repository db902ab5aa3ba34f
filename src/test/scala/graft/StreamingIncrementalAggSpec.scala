package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables
import graft.streaming.{AggEvent, StreamingIncrementalAgg}

/** The stream must land every user EXACTLY where the batch full-log
  * recompute does — arbitrary micro-batch splits and a checkpoint
  * stop/restart included (the merge algebra is associative/commutative,
  * so any arrival partition yields the same partials).
  */
class StreamingIncrementalAggSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def eventLog(): Array[AggEvent] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id"), col("event_type"),
        floor(col("value") * 100d + 0.5d).cast("long").as("v_c"))
      .as[AggEvent].collect().sortBy(_.event_id)
  }

  private def batchExpected(): Map[Long,
      (Long, Long, Long, Long, String, String)] =
    Relational.aggIncremental(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5), r.getString(6))))
      .toMap

  private def latestPerUser(
      rows: Seq[(Long, Long, Long, Long, Long, String, String, Long)])
      : Map[Long, (Long, Long, Long, Long, String, String)] =
    rows.groupBy(_._1).map { case (uid, rs) =>
      val last = rs.maxBy(_._8)
      uid -> ((last._2, last._3, last._4, last._5, last._6, last._7))
    }

  test("stream over three arbitrary micro-batches equals the batch " +
    "full-log recompute") {
    import spark.implicits._
    val log = eventLog()
    val expected = batchExpected()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AggEvent]
    val q = StreamingIncrementalAgg.aggStream(input.toDS())
      .writeStream.format("memory").queryName("t_agginc")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-agginc").toString)
      .outputMode("update").start()
    try {
      val third = log.length / 3
      input.addData(log.take(third).toSeq)
      q.processAllAvailable()
      input.addData(log.slice(third, 2 * third).toSeq)
      q.processAllAvailable()
      input.addData(log.drop(2 * third).toSeq)
      q.processAllAvailable()
      val got = latestPerUser(spark.table("t_agginc")
        .as[(Long, Long, Long, Long, Long, String, String, Long)]
        .collect().toSeq)
      got shouldBe expected
    } finally q.stop()
  }

  test("state survives a checkpoint stop/restart mid-log") {
    import spark.implicits._
    val log = eventLog()
    val expected = batchExpected()
    val (first, second) = log.splitAt(log.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[AggEvent]
    val chk = java.nio.file.Files
      .createTempDirectory("chk-agginc-restart").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Long, Long, Long, String, String, Long)]
    def start() = StreamingIncrementalAgg.aggStream(input.toDS())
      .writeStream
      .option("checkpointLocation", chk)
      .outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          df.collect().foreach(r => emitted.add((r.getLong(0),
            r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getString(5), r.getString(6), r.getLong(7))))
      }.start()

    val q1 = start()
    input.addData(first.toSeq)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    input.addData(second.toSeq)
    try q2.processAllAvailable() finally q2.stop()

    import scala.jdk.CollectionConverters._
    latestPerUser(emitted.asScala.toSeq) shouldBe expected
  }
}
