package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Preference
import graft.streaming.{EloMatch, StreamingRatings}

/** Elo update arithmetic, pool conservation, and the streaming twin:
  * matches streamed through [[StreamingRatings.eloStream]] in batch
  * order land every pool in EXACTLY the state the batch replay
  * ([[Preference.eloRatings]]) reports — same eloStep, same ordering,
  * same roster convention.
  */
class EloRatingsSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("eloStep: symmetric match moves K/2; floors are per-side") {
    // equal ratings: expected = 0.5, winner +16e6, loser -16e6
    val (w, l) = Preference.eloStep(Preference.EloStart, Preference.EloStart)
    w - Preference.EloStart shouldBe 16000000L
    l - Preference.EloStart shouldBe -16000000L
    // a heavy favorite gains little; the upset loser funds it
    val (w2, l2) = Preference.eloStep(Preference.EloStart + 400000000L,
      Preference.EloStart)
    (w2 - (Preference.EloStart + 400000000L)) should be < 4000000L
    (w2 - (Preference.EloStart + 400000000L)) should be > 0L
    // per-side floors: deltas cancel to within 1 micro
    math.abs((w2 + l2) - (2 * Preference.EloStart + 400000000L)) should be <= 1L
  }

  test("batch pools conserve rating mass to floor precision") {
    val rows = Preference.eloRatings(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, pool) =>
      val total = pool.map(_.getLong(4)).sum
      val matches = pool.map(_.getLong(2)).sum / 2 // each match counts twice
      val drift = math.abs(total - pool.length * Preference.EloStart)
      // each match can drift the pool total by at most 1 micro (the two
      // independent floors)
      drift should be <= matches
    }
  }

  test("streaming twin equals the batch replay on an ordered feed") {
    val batch = Preference.eloRatings(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val log = Preference.comparisonLog(
      graft.sources.Tables.documents(spark, sf))
      .as[(String, Long, String, String)].collect()
      .sortBy { case (lang, docId, w, _) => (lang, docId, w) }
      .map { case (lang, docId, w, l) => EloMatch(lang, docId, w, l) }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EloMatch]
    val q = StreamingRatings.eloStream(input.toDS())
      .writeStream.format("memory").queryName("t_elo")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-elo").toString)
      .outputMode("update").start()
    val streamed =
      try {
        // two micro-batches split mid-log: state must carry across
        val (first, second) = log.splitAt(log.length / 2)
        input.addData(first.toSeq)
        q.processAllAvailable()
        input.addData(second.toSeq)
        q.processAllAvailable()
        val t = spark.table("t_elo")
          .as[(String, String, Long, Long, Long, Long)].collect()
        // latest emission per pool
        t.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
          val last = rows.map(_._6).max
          rows.filter(_._6 == last).toSeq
        }.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      } finally q.stop()

    streamed shouldBe batch
  }

  test("streaming state survives a checkpoint stop/restart") {
    // the discipline every other streaming twin meets: process half the
    // match log, STOP the query, start a fresh query on the same
    // checkpoint, feed the rest — the recovered pools must land every
    // player exactly where the full-log batch replay does (lost state
    // would restart second-half players from EloStart and diverge)
    val batch = Preference.eloRatings(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val log = Preference.comparisonLog(
      graft.sources.Tables.documents(spark, sf))
      .as[(String, Long, String, String)].collect()
      .sortBy { case (lang, docId, w, _) => (lang, docId, w) }
      .map { case (lang, docId, w, l) => EloMatch(lang, docId, w, l) }
    val (first, second) = log.splitAt(log.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EloMatch]
    val chk = java.nio.file.Files.createTempDirectory("chk-elo-restart")
      .toString
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable test sink — emissions from BOTH query incarnations
    // land in one buffer, with `ver` (monotone per pool, recovered with
    // the state) picking the final snapshot
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[
        (String, String, Long, Long, Long, Long)]
    def start() = StreamingRatings.eloStream(input.toDS())
      .writeStream
      .option("checkpointLocation", chk)
      .outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          df.collect().foreach(r => emitted.add((r.getString(0),
            r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))))
      }.start()

    val q1 = start()
    input.addData(first.toSeq)
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    input.addData(second.toSeq)
    try q2.processAllAvailable() finally q2.stop()

    import scala.jdk.CollectionConverters._
    val all = emitted.asScala.toSeq
    val streamed = all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val last = rows.map(_._6).max
      rows.filter(_._6 == last)
    }.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

    // every pool touched after the restart reports the full-log batch
    // numbers for EVERY member (eloStream emits whole pools per batch,
    // and ver strictly increases across the restart iff state recovered)
    val touchedLangs = second.map(_.lang).toSet
    touchedLangs should not be empty
    touchedLangs.foreach { lang =>
      batch.keys.filter(_._1 == lang).foreach { key =>
        withClue(s"$key: ") { streamed(key) shouldBe batch(key) }
      }
    }
  }
}
