package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextPipeline
import graft.streaming.StreamingText

/** Streaming twins of the sampling/split family and the windowed
  * Misra-Gries heavy hitters: batch/stream equivalence on the
  * deterministic content-hash buckets, and the sketch's superset+bound
  * guarantee.
  */
class StreamingTextSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def runStream(build: org.apache.spark.sql.DataFrame,
      name: String): Unit = {
    val q = build.writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"chk-$name").toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
  }

  test("splitStream assigns the same labels the batch splitTrain assigns") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docRows = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id").as[Long].collect().toSeq
    val input = MemoryStream[Long]
    input.addData(docRows)
    runStream(StreamingText.splitStream(input.toDF().toDF("doc_id"))
      .select($"doc_id", $"bucket", $"split"), "split_twin")
    val streamed = spark.table("split_twin")
      .orderBy("doc_id").collect().toSeq
    val batch = TextPipeline.splitTrain(spark, sf).collect().toSeq
    streamed.map(r => (r.getLong(0), r.getLong(1), r.getString(2))) shouldBe
      batch.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
  }

  test("observedIngest surfaces exact per-batch counters via observedMetrics") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingText.observedIngest(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("obs_ingest")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-obs").toString)
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, "some text"), (2L, ""), (3L, "more words")))
      q.processAllAvailable()
      input.addData(Seq((4L, "x " * 60000), (5L, "ok")))
      q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("ingest")))
        .map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("n_empty"),
          r.getAs[Long]("n_oversize")))
        .filter(_._1 > 0)
      metrics.map(_._1).sum shouldBe 5L
      metrics.map(_._2).sum shouldBe 1L // the empty-text doc
      metrics.map(_._3).sum shouldBe 1L // the 120k-char doc
    } finally q.stop()
  }

  test("hashEmbedStream emits exactly the batch textHashEmbed rows, shuffle-free") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    input.addData(rows)
    runStream(StreamingText.hashEmbedStream(
      input.toDF().toDF("doc_id", "text")), "hash_embed_twin")
    val streamed = spark.table("hash_embed_twin")
      .orderBy("doc_id", "pos")
      .as[(Long, Long, Double)].collect().toSeq
    val batch = TextPipeline.textHashEmbed(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }

  test("alignmentStream scores arriving pairs exactly like the batch pair_alignment") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val embStatic = spark.read.parquet(s"$sf/embeddings.parquet")
    val input = MemoryStream[(Long, String)]
    input.addData(rows)
    runStream(graft.streaming.StreamingSimilarity.alignmentStream(
      input.toDF().toDF("doc_id", "text"), embStatic), "align_twin")
    val streamed = spark.table("align_twin")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val batch = graft.operators.SimilarityPipeline.pairAlignment(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }

  test("mixtureSampleStream admits exactly the docs the batch mixtureSample admits") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val rows = docsDf.select($"doc_id", $"source")
      .as[(Long, String)].collect().toSeq
    // the same deterministic weights table mixtureSample derives
    val weights = docsDf.select($"source").distinct()
      .withColumn("accept_pct",
        (lit(5) + pmod(regexp_extract($"source", "([0-9]+)$", 1).cast("long"),
          lit(4)) * 15).cast("long"))
      .withColumnRenamed("source", "w_source")
    val input = MemoryStream[(Long, String)]
    input.addData(rows)
    runStream(StreamingText.mixtureSampleStream(
      input.toDF().toDF("doc_id", "source"), weights)
      .select($"doc_id"), "mix_twin")
    val streamed = spark.table("mix_twin").as[Long].collect().sorted.toSeq
    val batch = TextPipeline.mixtureSample(spark, sf)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    streamed shouldBe batch
  }

  test("windowed Misra-Gries heavy hitters: true heavy tokens survive, state stays bounded") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int, sec: Int = 0) = new Timestamp((min * 60 + sec) * 1000L)
    // window 10:00 (off epoch: a wstart equal to the initial watermark 0
    // would be filtered as late): 'hot' appears 30x of N=75 tokens;
    // capacity 5 => threshold N/5 = 15 < 30, so MG must emit it. 45
    // scattered singletons churn the summary.
    val hotDocs = Seq.fill(10)(("hot " * 3).trim) // 30 hot tokens
    val noise = (1 to 45).grouped(5)
      .map(g => g.map(i => s"n$i").mkString(" ")).toSeq // 45 singletons
    val input = MemoryStream[(Timestamp, String)]
    runStreamWith(input) { q =>
      input.addData((hotDocs ++ noise).map(t => (ts(10, 30), t)))
      q.processAllAvailable()
      input.addData(Seq((ts(30), "later window"))) // advance watermark
      q.processAllAvailable()
      // event-time timeouts fire in a TRIGGERED batch after the watermark
      // moved; an empty add doesn't trigger one, so push another row
      input.addData(Seq((ts(31), "nudge")))
      q.processAllAvailable()
    }
    val out = spark.table("hh_twin")
      .as[(Timestamp, String, Long)].collect().filter(_._1 == ts(10))
    out.map(_._2) should contain("hot")
    out.length should be <= 5 // capacity bound == state bound
    // MG lower bound: stored count >= true - N/capacity
    val hot = out.find(_._2 == "hot").get
    hot._3 should be >= (30L - 75L / 5)
  }

  test("domainCapStream admits the batch answer on a doc_id-ordered replay, and holds the cap across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val rows = docsDf.select($"source", $"doc_id")
      .as[(String, Long)].collect().sortBy(_._2).toSeq
    val (first, rest) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(String, Long)]
    val df = StreamingText.domainCapStream(
      input.toDF().toDF("source", "doc_id"), k = 30)
    val q = df.writeStream.format("memory").queryName("cap_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-cap").toString)
      .outputMode("append").start()
    try {
      // two micro-batches: the counter must carry across them
      input.addData(first); q.processAllAvailable()
      input.addData(rest); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cap_twin")
      .select($"doc_id", $"source", $"rk")
      .orderBy("source", "rk")
      .as[(Long, String, Long)].collect().toSeq
    val batch = TextPipeline.domainCap(spark, sf, k = 30)
      .as[(Long, String, Long)].collect().toSeq
    streamed shouldBe batch
    streamed.groupBy(_._2).values.foreach(_.size should be <= 30)
  }

  test("domainCapStream spent-key prefilter drops exhausted sources map-side, admission unchanged") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val spent = new graft.streaming.SpentKeys(spark)
    val df = StreamingText.domainCapStream(
      input.toDF().toDF("source", "doc_id"), k = 2, spent = Some(spent))
    val q = df.writeStream.format("memory").queryName("cap_prefilter")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-cap-pf").toString)
      .outputMode("append").start()
    try {
      // batch 1: 5 rows of "a" exhaust its cap of 2. No report yet —
      // the cap-reaching batch's admissions are uncommitted, so reporting
      // here would poison a retry (drain-only reporting is the contract)
      input.addData(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L)))
      q.processAllAvailable()
      spent.shuffledRows shouldBe 5L
      spent.refresh()
      spent.spentSet shouldBe empty
      // batch 2: drained arrivals report the exhaustion (their spent-ness
      // is durable in the committed state); rows still shuffle this once
      input.addData(Seq(("a", 6L), ("a", 7L), ("b", 10L)))
      q.processAllAvailable()
      spent.shuffledRows shouldBe 8L
      spent.refresh() // what the attached listener does after each batch
      spent.spentSet shouldBe Set("a")
      // batch 3: now "a" rows drop BEFORE the shuffle; only "b" rows pass
      input.addData(Seq(("a", 8L), ("a", 9L), ("b", 11L)))
      q.processAllAvailable()
      spent.shuffledRows shouldBe 9L
    } finally q.stop()
    // admission output identical to the unfiltered operator's contract:
    // first two "a" docs and both "b" docs, ranks per source
    val out = spark.table("cap_prefilter")
      .orderBy("source", "rk").as[(String, Long, Long)].collect().toSeq
    out shouldBe Seq(("a", 1L, 1L), ("a", 2L, 2L),
      ("b", 10L, 1L), ("b", 11L, 2L))
  }

  test("attach() refreshes the spent set from the listener after each batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val spent = new graft.streaming.SpentKeys(spark).attach(spark)
    val df = StreamingText.domainCapStream(
      input.toDF().toDF("source", "doc_id"), k = 1, spent = Some(spent))
    val q = df.writeStream.format("memory").queryName("cap_listener")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-cap-ls").toString)
      .outputMode("append").start()
    try {
      input.addData(Seq(("a", 1L), ("a", 2L))) // cap 1 reached; no report
      q.processAllAvailable()
      input.addData(Seq(("a", 3L))) // drained arrival reports
      q.processAllAvailable()
      // the listener fires asynchronously after the batch commits
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (spent.spentSet.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      spent.spentSet shouldBe Set("a")
      val shuffledBefore = spent.shuffledRows
      input.addData(Seq(("a", 4L), ("a", 5L)))
      q.processAllAvailable()
      spent.shuffledRows shouldBe shuffledBefore // all dropped map-side
      spent.detach(spark)
    } finally q.stop()
  }

  test("tokenBudgetStream spent-key prefilter drops exhausted languages map-side") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long, String)]
    val spent = new graft.streaming.SpentKeys(spark)
    val df = StreamingText.tokenBudgetStream(
      input.toDF().toDF("lang", "doc_id", "text"), budget = 5,
      spent = Some(spent))
    val q = df.writeStream.format("memory").queryName("budget_prefilter")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-budget-pf").toString)
      .outputMode("append").start()
    try {
      input.addData(Seq(("en", 1L, "a b c d e f g h"))) // 8 tokens > 5
      q.processAllAvailable()
      spent.shuffledRows shouldBe 1L
      spent.refresh()
      spent.spentSet shouldBe empty // exhausting batch never reports
      // drained arrival reports; shuffles this once
      input.addData(Seq(("en", 2L, "x y z"), ("fr", 3L, "u v")))
      q.processAllAvailable()
      spent.shuffledRows shouldBe 3L
      spent.refresh()
      spent.spentSet shouldBe Set("en")
      input.addData(Seq(("en", 4L, "p q"), ("fr", 5L, "w")))
      q.processAllAvailable()
      spent.shuffledRows shouldBe 4L // en dropped map-side; fr passes
    } finally q.stop()
    val out = spark.table("budget_prefilter")
      .orderBy("lang", "doc_id").as[(String, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(("en", 1L, 8L, 0L), ("fr", 3L, 2L, 0L),
      ("fr", 5L, 1L, 2L))
  }

  test("weightedSampleStream admits the batch sample under a REVERSED replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new Timestamp(min * 60000L)
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    // REVERSED doc_id order, split across two micro-batches: the A-ES keys
    // are functions of the document, so arrival order must not matter —
    // a strictly stronger contract than the cap/budget twins' ordered-only
    // equivalence
    val rows = docsDf.select($"doc_id", $"lang", $"n_chars")
      .as[(Long, String, Long)].collect().sortBy(-_._1).toSeq
    val (first, rest) = rows.splitAt(rows.length / 3)
    val input = MemoryStream[(Timestamp, Long, String, Long)]
    val df = StreamingText.weightedSampleStream(
      input.toDF().toDF("ts", "doc_id", "lang", "n_chars"), "ts",
      windowMs = 60000L, delayMs = 120000L, k = 20)
    val q = df.writeStream.format("memory").queryName("ws_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-ws").toString)
      .outputMode("append").start()
    try {
      input.addData(first.map { case (id, l, c) => (ts(10), id, l, c) })
      q.processAllAvailable()
      input.addData(rest.map { case (id, l, c) => (ts(10), id, l, c) })
      q.processAllAvailable()
      input.addData(Seq((ts(30), 0L, "en", 1L))) // advance watermark
      q.processAllAvailable()
      input.addData(Seq((ts(31), 0L, "en", 1L))) // nudge a timeout batch
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ws_twin")
      .filter($"window_start" === ts(10))
      .select($"lang", $"doc_id", $"es_key", $"rk")
      .orderBy("lang", "rk")
      .as[(String, Long, Double, Long)].collect().toSeq
    val batch = TextPipeline.weightedSampleFrom(docsDf)
      .select($"lang", $"doc_id", $"es_key", $"rk")
      .as[(String, Long, Double, Long)].collect().toSeq
    streamed shouldBe batch
  }

  test("tokenBudgetStream admits the batch answer on a hash-ordered replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    // replay in the batch operator's admission order: the seeded hash key
    val rows = docsDf
      .select($"lang", $"doc_id", $"text",
        md5(concat(lit("tb:"), $"doc_id")).as("skey"))
      .orderBy("skey", "doc_id")
      .select($"lang", $"doc_id", $"text")
      .as[(String, Long, String)].collect().toSeq
    val (first, rest) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(String, Long, String)]
    val df = StreamingText.tokenBudgetStream(
      input.toDF().toDF("lang", "doc_id", "text"), budget = 1000)
    val q = df.writeStream.format("memory").queryName("budget_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-budget").toString)
      .outputMode("append").start()
    try {
      input.addData(first); q.processAllAvailable()
      input.addData(rest); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("budget_twin")
      .orderBy("lang", "start_offset", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    val batch = TextPipeline.tokenBudgetSample(spark, sf, budget = 1000)
      .as[(String, Long, Long, Long)].collect().toSeq
    streamed shouldBe batch
    // every admitted doc starts inside the budget
    streamed.foreach(_._4 should be < 1000L)
  }

  test("tokenBudgetStreamBpe admits the batch BPE-budget answer on an ordered replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val rows = docsDf
      .select($"lang", $"doc_id", $"text",
        md5(concat(lit("tb:"), $"doc_id")).as("skey"))
      .orderBy("skey", "doc_id")
      .select($"lang", $"doc_id", $"text")
      .as[(String, Long, String)].collect().toSeq
    val (first, rest) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(String, Long, String)]
    val df = StreamingText.tokenBudgetStreamBpe(
      input.toDF().toDF("lang", "doc_id", "text"), budget = 1000)
    val q = df.writeStream.format("memory").queryName("budget_bpe_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-budget-bpe").toString)
      .outputMode("append").start()
    try {
      input.addData(first); q.processAllAvailable()
      input.addData(rest); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("budget_bpe_twin")
      .orderBy("lang", "start_offset", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    val batch = TextPipeline.tokenBudgetSampleBpe(spark, sf, budget = 1000)
      .as[(String, Long, Long, Long)].collect().toSeq
    streamed shouldBe batch
  }

  private def runStreamWith(input: MemoryStream[(Timestamp, String)])(
      drive: org.apache.spark.sql.streaming.StreamingQuery => Unit): Unit = {
    val df = StreamingText.heavyHittersStream(
      input.toDF().toDF("ts", "text"), "ts",
      windowMs = 60000L, delayMs = 120000L, capacity = 5)
    val q = df.writeStream.format("memory").queryName("hh_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-hh").toString)
      .outputMode("append").start()
    try drive(q) finally q.stop()
  }
}
