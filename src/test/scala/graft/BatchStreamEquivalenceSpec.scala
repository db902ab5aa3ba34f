package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.HealthCheckConfig
import graft.streaming.{AlarmPipeline, TransitionEvent}

/** The bridge between the engine's two halves: the SAME event data replayed
  * through the streaming `transformWithState` alarm operator must produce
  * the transitions the batch replay (the DuckDB-oracle-checked
  * `alarmTransitions`) computes.
  *
  * Reconciliation rules (documented divergences, not bugs):
  *  - batch emits each key's INITIAL state row (prev_state IS NULL); the
  *    streaming operator starts keys at implicit OK and emits only changes,
  *    so batch initial rows with state OK are dropped from the expectation;
  *  - batch evaluates through each key's own max minute; streaming
  *    evaluation advances with the GLOBAL watermark, so a sentinel key
  *    pushes the watermark past every real key's last minute and the
  *    comparison window is capped at each key's batch horizon.
  */
class BatchStreamEquivalenceSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  test("streaming alarm transitions match the batch replay on real events data") {
    val cfg = HealthCheckConfig(thresholdSeconds = 150.0)
    val sf = "/root/testdata/sf0.001"

    // two real keys keep the stream small; full data goes through batch too
    val keys = Seq("click", "purchase")
    val events = graft.sources.Tables.events(spark, sf)
      .filter($"event_type".isin(keys: _*))
      .select($"event_type".as("streamName"), $"ts", $"value")
      .as[(String, Timestamp, Double)]
      .collect().sortBy(_._2.getTime)
    events should not be empty

    // batch expectation, capped per key at its own horizon, initial-OK dropped
    val batch = operators.HealthCheckBatch
      .alarmTransitions(spark, sf, cfg)
      .filter($"event_type".isin(keys: _*))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getString(2),
        r.getString(3)))
    val horizons = events.groupBy(_._1).map { case (k, es) =>
      k -> (es.map(_._2.getTime).max / 60000) * 60000 // key's max minute start
    }
    val expected = batch
      .filter { case (k, at, state, _) =>
        // drop the synthetic initial row if it reports OK (streaming's
        // implicit start); keep everything up to the key's horizon
        !(at == batch.filter(_._1 == k).map(_._2).min && state == "OK") &&
          at <= horizons(k)
      }
      .map { case (k, at, state, reason) => (k, at, state, reason) }.sorted

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val metrics = input.toDF().toDF("streamName", "ts", "value")
    val q = AlarmPipeline.transitions(metrics, cfg)
      .writeStream.format("memory").queryName("equiv")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-eq").toString)
      .outputMode("append").start()
    try {
      // replay in arrival order across a few micro-batches
      events.grouped(math.max(1, events.length / 3)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      // sentinel key advances the global watermark past every horizon
      val flushTs = events.map(_._2.getTime).max + 10 * 60000L
      input.addData(Seq(("__sentinel__", new Timestamp(flushTs), 0.0)))
      q.processAllAvailable()
      input.addData(Seq.empty); q.processAllAvailable()

      val got = spark.table("equiv").as[TransitionEvent].collect()
        .filter(t => keys.contains(t.streamName))
        .filter(t => t.atMs <= horizons(t.streamName) + 60000)
        // batch stamps the evaluated minute; streaming stamps its end
        .map(t => (t.streamName, t.atMs - 60000, t.to, t.reason)).sorted
        .filter { case (_, at, _, _) => at <= horizons.values.max }
        .filter { case (k, at, _, _) => at <= horizons(k) }
      expected.length should be > 3 // non-vacuous comparison
      got shouldBe expected
    } finally q.stop()
  }

  test("streaming anomaly z-scores equal the batch operator on an ordered replay") {
    val sf = "/root/testdata/sf0.001"
    val keys = Seq("error", "view")
    val events = graft.sources.Tables.events(spark, sf)
      .filter($"event_type".isin(keys: _*))
      .select($"event_type", $"ts", $"value")
      .as[(String, Timestamp, Double)]
      .collect().sortBy(_._2.getTime)
    events.length should be > 100
    // one far-future sentinel per key closes each key's last real minute
    val flush = events.map(_._2.getTime).max + 3600000L
    val withSentinel = events ++ keys.map(k => (k, new Timestamp(flush), 0.0))

    // batch truth over the SAME rows (sentinels included so the frame
    // contents match), minus the sentinel minutes themselves
    val batch = operators.DataQuality.metricAnomalyFrom(
        withSentinel.toSeq.toDF("event_type", "ts", "value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .filter(_._2.getTime <= events.map(_._2.getTime).max)
      .sortBy(t => (t._1, t._2.getTime))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val stream = graft.streaming.StreamingAnomaly.anomalyStream(
      input.toDF().toDF("event_type", "ts", "value"))
    val q = stream.writeStream.format("memory").queryName("anom_equiv")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-anom").toString)
      .outputMode("append").start()
    try {
      events.grouped(math.max(1, events.length / 4)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      input.addData(keys.map(k => (k, new Timestamp(flush), 0.0)))
      q.processAllAvailable()
      val got = spark.table("anom_equiv")
        .as[(String, Timestamp, Double, Double, Double, Boolean)]
        .collect().sortBy(t => (t._1, t._2.getTime))
      batch.length should be > 20 // non-vacuous
      got shouldBe batch // bit-exact: same DECIMAL sums, same float tree
    } finally q.stop()
  }

  test("streaming SCD2 change capture equals the batch history's closed intervals") {
    val sf = "/root/testdata/sf0.001"
    // the batch operator's own observation stream: min status per
    // (customer, date), replayed in date order
    val obs = graft.sources.Tables.orders(spark, sf)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(org.apache.spark.sql.functions.min($"o_orderstatus").as("status"))
      .as[(Long, Timestamp, String)]
      .collect().sortBy(_._2.getTime)

    // orders timestamps surface as NTZ (LocalDateTime) in collected Rows
    def ms(v: Any): Long = v match {
      case t: Timestamp => t.getTime
      case l: java.time.LocalDateTime => Timestamp.valueOf(l).getTime
    }
    val batchClosed = operators.Relational.scd2History(spark, sf)
      .collect()
      .filter(!_.isNullAt(3)) // closed intervals only
      .map(r => (r.getLong(0), r.getString(1), ms(r.get(2)),
        ms(r.get(3)), r.getLong(4)))
      .sortBy(t => (t._1, t._3))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = graft.streaming.StreamingWarehouse.scd2Stream(
      input.toDF().toDF("o_custkey", "o_orderdate", "status"))
    val q = stream.writeStream.format("memory").queryName("scd2_equiv")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-scd2").toString)
      .outputMode("append").start()
    try {
      obs.grouped(math.max(1, obs.length / 4)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val got = spark.table("scd2_equiv")
        .as[(Long, String, Timestamp, Timestamp, Long)]
        .collect()
        .map(t => (t._1, t._2, t._3.getTime, t._4.getTime, t._5))
        .sortBy(t => (t._1, t._3))
      batchClosed.length should be > 20
      got shouldBe batchClosed
    } finally q.stop()
  }

  test("streaming funnel stage counts equal the batch funnel on an ordered replay") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts")
      .as[(Long, String, Timestamp)].collect().sortBy(_._3.getTime)
    val batch = operators.Relational.eventFunnel(spark, sf)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = graft.streaming.StreamingWarehouse.funnelStream(
        input.toDF().toDF("user_id", "event_type", "ts"))
      .writeStream.format("memory").queryName("funnel_equiv")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-funnel").toString)
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val got = spark.table("funnel_equiv")
        .groupBy("stage").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      got.getOrElse("view", 0L) shouldBe batch("view")
      got.getOrElse("click_after_view", 0L) shouldBe batch("click_after_view")
      got.getOrElse("purchase_after_click", 0L) shouldBe
        batch("purchase_after_click")
      batch("view") should be > 0L
    } finally q.stop()
  }

  test("streaming cohort cell counts equal the batch retention triangle on ordered replay") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"ts")
      .as[(Long, Timestamp)].collect().sortBy(_._2.getTime)

    def ms(v: Any): Long = v match {
      case t: Timestamp => t.getTime
      case l: java.time.LocalDateTime => Timestamp.valueOf(l).getTime
    }
    val batch = operators.Relational.cohortRetention(spark, sf)
      .collect()
      .map(r => (ms(r.get(0)), r.getLong(1)) -> r.getLong(2)).toMap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val q = graft.streaming.StreamingWarehouse.cohortStream(
        input.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("cohort_equiv")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-cohort").toString)
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 4)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val got = spark.table("cohort_equiv")
        .groupBy("cohort", "week_offset").count().collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1)) -> r.getLong(2))
        .toMap
      batch.size should be > 3
      got shouldBe batch
    } finally q.stop()
  }

  test("streaming near-dedup suppresses every pair the batch MinHash dedup finds") {
    val sf = "/root/testdata/sf0.001"
    // batch truth on the same corpus: (doc_a, doc_b) band-collision pairs
    // verified at Jaccard >= 0.8; keep-first semantics suppress doc_b
    val batchPairs = operators.TextPipeline.dedupMinHash(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    batchPairs.length should be > 3 // non-vacuous

    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = graft.streaming.StreamingDedup.dedupNearStream(docs, "ts")
      .writeStream.format("memory").queryName("nd_equiv")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-nd-eq").toString)
      .outputMode("append").start()
    try {
      // replay in doc_id order (the batch keep-first order) across batches
      corpus.grouped(math.max(1, corpus.length / 4)).foreach { b =>
        input.addData(b.map { case (id, t) => (id, t, new Timestamp(id * 1000L)) })
        q.processAllAvailable()
      }
      // flush the windowed re-assembly past the watermark delay
      val flushTs = corpus.length * 1000L + 30 * 60000L
      input.addData(Seq((999999L, "flush sentinel", new Timestamp(flushTs))))
      q.processAllAvailable()
      input.addData(Seq.empty); q.processAllAvailable()

      val survivors = spark.table("nd_equiv").select("doc_id").as[Long]
        .collect().toSet - 999999L
      survivors should not be empty
      // the streaming variant's recall covers the batch pairs: no pair the
      // batch finds survives intact — at most one representative remains
      // (which one is arbitrary only for same-micro-batch arrivals). The
      // round-2 single-band variant failed this for pairs agreeing only on
      // bands 1-3.
      val intact = batchPairs.filter { case (a, b) =>
        survivors.contains(a) && survivors.contains(b)
      }
      intact shouldBe empty
    } finally q.stop()
  }

  test("emit-immediate near-dedup covers the batch pairs with NO watermark flush") {
    val sf = "/root/testdata/sf0.001"
    val batchPairs = operators.TextPipeline.dedupMinHash(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    batchPairs.length should be > 3 // non-vacuous

    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = graft.streaming.StreamingDedup.dedupNearStreamImmediate(docs, "ts")
      .writeStream.format("memory").queryName("nd_equiv_imm")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-nd-im").toString)
      .outputMode("append").start()
    try {
      corpus.grouped(math.max(1, corpus.length / 4)).foreach { b =>
        input.addData(b.map { case (id, t) => (id, t, new Timestamp(id * 1000L)) })
        q.processAllAvailable()
      }
      // NO flush sentinel, no empty-batch nudge: survivors were emitted in
      // the micro-batches that delivered them — the round-3 windowed
      // variant's watermark-delayed emission is the thing this removes
      val survivors = spark.table("nd_equiv_imm").select("doc_id").as[Long]
        .collect().toSet
      survivors should not be empty
      val intact = batchPairs.filter { case (a, b) =>
        survivors.contains(a) && survivors.contains(b)
      }
      intact shouldBe empty
      // text restored on every survivor despite riding only band-0 rows
      spark.table("nd_equiv_imm").filter($"text".isNull).count() shouldBe 0
    } finally q.stop()
  }
}
