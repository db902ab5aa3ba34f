package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.DataQuality

/** The validation gates must DETECT violations, not just pass clean data
  * (the oracle pins the clean-corpus output; these specs corrupt the input
  * and assert the checks trip with exact observed counts), and the drift
  * monitor must stay finite when a language exists on only one side.
  */
class DataQualitySpec extends AnyFunSuite with Matchers with SparkTestBase {

  import spark.implicits._

  test("quality checks trip on duplicate ids, empty text, and unknown languages") {
    val bad = Seq(
      (1L, "ok text", "en", "src0", 7L),
      (1L, "dup id", "en", "src0", 6L),   // dup_ids
      (2L, "", "en", "src0", 0L),          // empty_text
      (3L, "tok tok", "xx", "src0", 7L),   // bad_lang
      (4L, "fine", "fr", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val checks = DataQuality.qualityChecksFrom(bad)
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2)))
      .toMap
    checks("dup_ids") shouldBe (false, 1L)
    checks("empty_text") shouldBe (false, 1L)
    checks("bad_lang") shouldBe (false, 1L)
    checks("bad_len") shouldBe (true, 0L)
  }

  test("profile reports nulls and bounds the corrupted column") {
    val withNulls = Seq(
      (1L, Some("a"), "en", "s", 1L),
      (2L, None, "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val prof = DataQuality.dataProfileFrom(withNulls)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    prof(("text", "nulls")) shouldBe 1.0
    prof(("rows", "n")) shouldBe 2.0
    prof(("n_chars", "max")) shouldBe 9.0
    prof(("n_chars", "mean")) shouldBe 5.0
  }

  test("metric anomaly flags a spike against the rolling baseline, not the steady state") {
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def at(minute: Int) = new java.sql.Timestamp(base.getTime + minute * 60000L)
    // 40 steady minutes alternating 9.5/10.5 (std ~0.5), then a 100.0 spike
    val rows = (0 until 40).map { m =>
      (m.toLong, at(m), 1L, "error", if (m % 2 == 0) 9.5 else 10.5, "{}")
    } :+ (40L, at(40), 1L, "error", 100.0, "{}")
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = DataQuality.metricAnomalyFrom(events)
      .collect().map(r => r.getTimestamp(1) -> (r.getDouble(4), r.getBoolean(5)))
      .toMap
    // warmup: minutes 0-9 have < 10 baseline rows and are excluded
    out.keySet should not contain at(5)
    out.keySet should contain(at(20))
    // steady minutes are not anomalous; the spike is, with a huge z
    out(at(20))._2 shouldBe false
    out(at(40))._2 shouldBe true
    out(at(40))._1 should be > 3.0
  }

  test("referential integrity passes on the generated star schema, all FKs covered") {
    val rows = DataQuality.refIntegrity(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    rows.length shouldBe 7
    rows.foreach { case (rel, nChild, nOrphans, passed) =>
      withClue(s"$rel: ") {
        nChild should be > 0L
        nOrphans shouldBe 0L
        passed shouldBe true
      }
    }
  }

  test("lang confusion shares sum to 1 within each declared language") {
    val rows = graft.operators.TextPipeline
      .langConfusion(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    rows.map(_._1).distinct.sorted shouldBe Array("de", "en", "es", "fr", "zh")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      withClue(s"$lang: ") {
        cells.map(_._4).sum shouldBe 1.0 +- 0.001
      }
    }
  }

  test("hist drift: zero on identical shapes, large under a length shift") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val same = DataQuality.histDriftFrom(base, base)
      .agg(org.apache.spark.sql.functions.sum("psi_term")).head.getDouble(0)
    same shouldBe 0.0 +- 1e-9
    // a truncation bug: every doc loses 200 chars on one side
    val shifted = base.withColumn("n_chars",
      org.apache.spark.sql.functions.greatest(
        col("n_chars") - 200, org.apache.spark.sql.functions.lit(0L)))
    val drift = DataQuality.histDriftFrom(base, shifted)
      .agg(org.apache.spark.sql.functions.sum("psi_term")).head.getDouble(0)
    drift should be > 0.5 // PSI > 0.25 is the standard "investigate" bar
  }

  test("drift stays finite when a language exists on only one side") {
    val a = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("doc_id", "lang")
    val b = Seq((4L, "en"), (5L, "zh")).toDF("doc_id", "lang")
    val rows = DataQuality.distDriftFrom(a, b).collect()
    rows.map(_.getString(0)).toSeq shouldBe Seq("en", "fr", "zh")
    rows.foreach { r =>
      val psi = r.getAs[Double]("psi_term")
      psi.isNaN shouldBe false
      psi.isInfinite shouldBe false
      psi should be >= 0.0
    }
    // the one-sided languages carry the epsilon floor, not a zero share
    val fr = rows.find(_.getString(0) == "fr").get
    fr.getAs[Long]("n_b") shouldBe 0L
    fr.getAs[Double]("psi_term") should be > 0.0
  }

  test("identical distributions report zero total PSI") {
    val a = Seq((1L, "en"), (2L, "fr")).toDF("doc_id", "lang")
    val rows = DataQuality.distDriftFrom(a, a).collect()
    rows.map(_.getAs[Double]("psi_term")).sum shouldBe 0.0
  }

  test("streaming quality monitor counts violations per window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, String, Long)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val df = graft.streaming.StreamingText.qualityMonitorStream(
      input.toDF().toDF("ts", "text", "lang", "n_chars"), "ts")
    val q = df.writeStream.format("memory").queryName("qmon")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-qmon").toString)
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (ts(10), "good text", "en", 9L),
        (ts(10), "", "en", 0L),          // empty_text
        (ts(10), "bad lang", "xx", 8L))) // bad_lang
      q.processAllAvailable()
      input.addData(Seq((ts(30), "closes the window", "en", 17L)))
      q.processAllAvailable()
    } finally q.stop()
    val w = spark.table("qmon")
      .filter(col("window_start") === ts(10)).collect()
    w.length shouldBe 1
    w.head.getAs[Long]("n_docs") shouldBe 3L
    w.head.getAs[Long]("empty_text") shouldBe 1L
    w.head.getAs[Long]("bad_lang") shouldBe 1L
    w.head.getAs[Long]("n_violations") shouldBe 2L
  }

  test("calib_bins: full decile partition per language, exact accounting") {
    val bins = graft.operators.DataQuality
      .calibBins(spark, "/root/testdata/sf0.001").collect()
    val langs = bins.map(_.getString(0)).distinct
    langs.length shouldBe 5
    langs.foreach { l =>
      val b = bins.filter(_.getString(0) == l)
      // ntile(10) emits exactly bins 1..10, sizes within 1 of each other
      b.map(_.getLong(1)).sorted.toSeq shouldBe (1L to 10L)
      val sizes = b.map(_.getLong(2))
      (sizes.max - sizes.min) should be <= 1L
      // positives never exceed the bin size
      b.foreach(r => r.getLong(3) should be <= r.getLong(2))
    }
    // every document lands in exactly one bin
    bins.map(_.getLong(2)).sum shouldBe 500L
  }

  test("signal_corr: ppm values in range, self-consistent n, real signal") {
    val rows = graft.operators.DataQuality
      .signalCorr(spark, "/root/testdata/sf0.001").collect()
    rows.length shouldBe 3
    val ns = rows.map(_.getLong(2)).distinct
    ns.length shouldBe 1 // same joined population for every pair
    rows.foreach { r =>
      math.abs(r.getLong(3)) should be <= 1000000L
    }
    // the heuristic quality score is length-ASSOCIATED by construction
    // (its first term saturates at 50 tokens) — the corr must be
    // decisively nonzero, or the moment arithmetic is broken
    val heurTok = rows.find(r =>
      r.getString(0) == "q_heur" && r.getString(1) == "n_tok").get
    math.abs(heurTok.getLong(3)) should be > 100000L
  }
}
