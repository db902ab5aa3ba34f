package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{Sketches, TextPipeline}
import graft.streaming.StreamingSketches

/** Semantic invariants of the sketch family and the temperature
  * resampler (exact values are pinned by their DuckDB oracles; these are
  * the properties the hash compare can't express: mergeability,
  * one-sidedness, linearity, batch/stream frame equality).
  */
class SketchesSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("HLL estimate is duplication-invariant and inside the error envelope") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val once = Sketches.hllDistinctTokensFrom(corpus)
      .select($"lang", $"hll_distinct", $"exact_distinct")
      .as[(String, Double, Long)].collect().toSeq.sorted
    once.nonEmpty shouldBe true
    // duplicating every document changes NO register (same tokens -> same
    // hashes), so the sketch — and the exact count — are unchanged; this
    // is the property that makes the sketch safe to run pre-dedup
    val doubled = Sketches.hllDistinctTokensFrom(
      corpus.unionByName(corpus.withColumn("doc_id", $"doc_id" + 1000000L)))
      .select($"lang", $"hll_distinct", $"exact_distinct")
      .as[(String, Double, Long)].collect().toSeq.sorted
    doubled shouldBe once
    // m=256 gives sigma = 1.04/sqrt(256) = 6.5%; 3 sigma is the sanity
    // fence (the oracle pins the exact figure)
    once.foreach { case (lang, est, exact) =>
      withClue(s"$lang: ") {
        math.abs(est - exact) / exact.toDouble should be <= 0.20
      }
    }
  }

  test("temperature resampling admits min(target, n_docs) per language, ranks dense") {
    val out = TextPipeline.temperatureSample(spark, sf)
      .select($"lang", $"rk", $"target")
      .as[(String, Long, Long)].collect().toSeq
    val nDocs = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val target = rows.head._3
      withClue(s"$lang: ") {
        rows.length.toLong shouldBe math.min(target, nDocs(lang))
        rows.map(_._2).sorted shouldBe (1L to rows.length).toSeq
      }
    }
    // alpha < 1 flattens the distribution: every language's admitted
    // share of its own corpus is at least the head language's share
    // (tail languages are upweighted relative to their natural share)
    val shares = out.groupBy(_._1).map { case (lang, rows) =>
      lang -> rows.length.toDouble / nDocs(lang) }
    val head = nDocs.maxBy(_._2)._1
    shares.values.foreach(_ should be >= shares(head) - 1e-9)
  }

  test("HLL merge of disjoint shard sketches equals the whole-corpus sketch register-for-register") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val even = Sketches.hllRegistersFrom(corpus.filter(pmod($"doc_id", lit(2)) === 0))
    val odd = Sketches.hllRegistersFrom(corpus.filter(pmod($"doc_id", lit(2)) === 1))
    val merged = Sketches.hllMerge(Seq(even, odd))
      .as[(String, Long, Int)].collect().toSet
    val whole = Sketches.hllRegistersFrom(corpus)
      .as[(String, Long, Int)].collect().toSet
    merged shouldBe whole
    whole.nonEmpty shouldBe true
  }

  test("HLL shard store: appended frames estimate identically to the one-pass sketch, reading no text") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("hll-store").toString
    Sketches.appendHllShard(
      Sketches.hllRegistersFrom(corpus.filter(pmod($"doc_id", lit(2)) === 0)), dir)
    Sketches.appendHllShard(
      Sketches.hllRegistersFrom(corpus.filter(pmod($"doc_id", lit(2)) === 1)), dir)
    val fromStore = Sketches.estimateHllStore(spark, dir)
    // the estimate-time plan scans only the register store — never text
    fromStore.queryExecution.executedPlan.toString should not include "documents.parquet"
    val got = fromStore.as[(String, Long, Double)].collect().toSeq
    val direct = Sketches.hllEstimate(Sketches.hllRegistersFrom(corpus))
      .orderBy("lang").as[(String, Long, Double)].collect().toSeq
    got shouldBe direct
  }

  test("count-min is a one-sided overcount and exactly linear under corpus duplication") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val once = Sketches.cmsFreqFrom(corpus)
      .as[(String, Long, Long, Long)].collect().toSeq
    once should have size 20
    once.foreach { case (token, exact, est, over) =>
      withClue(s"$token: ") {
        est should be >= exact // CMS never undercounts
        over shouldBe est - exact
      }
    }
    // every counter doubles when every token count doubles, and min
    // commutes with scaling — so the estimate is exactly 2x, not ~2x
    val doubled = Sketches.cmsFreqFrom(
      corpus.unionByName(corpus.withColumn("doc_id", $"doc_id" + 1000000L)))
      .as[(String, Long, Long, Long)].collect().toSeq
    doubled.map(_._1) shouldBe once.map(_._1)
    doubled.map(_._2) shouldBe once.map(_._2 * 2)
    doubled.map(_._3) shouldBe once.map(_._3 * 2)
  }

  test("hllRegisterStream emits per-window frames whose merge is the batch sketch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val rows = corpus.select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq
    def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val input = MemoryStream[(Timestamp, String, String)]
    val q = StreamingSketches.hllRegisterStream(
        input.toDF().toDF("ts", "lang", "text"), "ts")
      .writeStream.format("memory").queryName("hll_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-hll").toString)
      .outputMode("append").start()
    try {
      // two event-time windows (doc_id parity), then a watermark-advancing
      // row and a nudge batch so both windows close and emit
      input.addData(rows.map { case (id, lang, text) =>
        (ts(if (id % 2 == 0) 10 else 11), lang, text) })
      q.processAllAvailable()
      input.addData(Seq((ts(30), "en", "flush")))
      q.processAllAvailable()
      input.addData(Seq((ts(31), "en", "nudge")))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("hll_twin").filter($"window_start" < ts(20))
    emitted.select(countDistinct($"window_start")).as[Long].head() shouldBe 2L
    // merged across the two windows == the batch whole-corpus sketch,
    // register-for-register — the emit-frames-merge-later contract
    val merged = Sketches.hllMerge(
      Seq(emitted.select($"lang", $"register", $"rho")))
      .as[(String, Long, Int)].collect().toSet
    val whole = Sketches.hllRegistersFrom(corpus)
      .as[(String, Long, Int)].collect().toSet
    merged shouldBe whole
  }

  // plain-Scala md5 hex — the independent recompute the KMV specs pin
  // the distributed sketch against
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u13(h: String): Double =
    java.lang.Long.parseLong(h.take(13), 16).toDouble / 4503599627370496.0

  // synthetic two-language corpus: aa has 300 distinct tokens t000..t299,
  // bb has t150..t449 — 150 shared, both vocabularies over k=64 so the
  // estimator path (not the exact small-set path) is what's exercised
  private def synthCorpus() = {
    def doc(id: Long, lang: String, lo: Int, hi: Int) =
      (id, lang, (lo until hi).map(i => f"t$i%03d").mkString(" "))
    Seq(doc(1, "aa", 0, 150), doc(2, "aa", 150, 300),
      doc(3, "bb", 150, 300), doc(4, "bb", 300, 450))
      .toDF("doc_id", "lang", "text")
  }

  test("KMV sketch is exactly the k smallest distinct hashes, duplication-invariant") {
    val corpus = synthCorpus()
    val sk = Sketches.kmvSketchFrom(corpus)
      .as[(String, String, Int)].collect().toSeq
    val expected = (for {
      (lang, lo) <- Seq("aa" -> 0, "bb" -> 150)
      (h, i) <- (lo until lo + 300).map(i => md5Hex(f"t$i%03d"))
        .distinct.sorted.take(Sketches.KmvK).zipWithIndex
    } yield (lang, h, i + 1)).toSet
    sk.toSet shouldBe expected
    // a distinct-set sketch: duplicating every document changes nothing
    val doubled = Sketches.kmvSketchFrom(
      corpus.unionByName(corpus.withColumn("doc_id", $"doc_id" + 100L)))
      .as[(String, String, Int)].collect().toSeq
    doubled.toSet shouldBe expected
  }

  test("KMV estimate replays (k-1)/u_k exactly; exact path under k distinct") {
    val out = Sketches.kmvDistinctFrom(synthCorpus())
      .as[(String, Long, Double, Long, Double)].collect().toSeq
    out.map(_._1) shouldBe Seq("aa", "bb")
    out.foreach { case (lang, kUsed, est, exact, relErr) =>
      withClue(s"$lang: ") {
        kUsed shouldBe Sketches.KmvK.toLong
        exact shouldBe 300L
        val lo = if (lang == "aa") 0 else 150
        val uk = u13((lo until lo + 300).map(i => md5Hex(f"t$i%03d"))
          .distinct.sorted.apply(Sketches.KmvK - 1))
        est shouldBe BigDecimal((Sketches.KmvK - 1).toDouble / uk)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        // sigma ~ 1/sqrt(k-2) ~ 13%; 4 sigma is the sanity fence
        relErr should be <= 0.52
      }
    }
    // languages with fewer than k distinct tokens: the sketch is the set,
    // the estimate exact (the real sf0.001 corpus is entirely this case)
    Sketches.kmvDistinctFrom(
        spark.read.parquet(s"$sf/documents.parquet"))
      .as[(String, Long, Double, Long, Double)].collect().foreach {
        case (lang, kUsed, est, exact, relErr) => withClue(s"$lang: ") {
          kUsed shouldBe exact
          est shouldBe exact.toDouble
          relErr shouldBe 0.0
        }
      }
  }

  test("theta intersection replays the naive recompute; exact calibration is the true overlap") {
    val out = Sketches.kmvIntersectLangsFrom(synthCorpus())
      .as[(String, String, Double, Long)].collect().toSeq
    out.map(r => (r._1, r._2)) shouldBe Seq(("aa", "bb"))
    val (_, _, est, exact) = out.head
    exact shouldBe 150L // t150..t299 shared
    // independent recompute: bottom-k per lang, union's k-th smallest as
    // theta, common-below-theta / theta — the distributed query must
    // reproduce this number to the rounded digit
    val ha = (0 until 300).map(i => md5Hex(f"t$i%03d")).distinct
      .sorted.take(Sketches.KmvK)
    val hb = (150 until 450).map(i => md5Hex(f"t$i%03d")).distinct
      .sorted.take(Sketches.KmvK)
    val union = (ha ++ hb).distinct.sorted
    val theta = if (union.size < Sketches.KmvK) 1.0
      else u13(union(Sketches.KmvK - 1))
    val common = ha.toSet.intersect(hb.toSet).count(h => u13(h) < theta)
    est shouldBe BigDecimal(common.toDouble / theta)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("AMS F2 quadruples exactly under corpus duplication; exact on one heavy token") {
    val corpus = synthCorpus()
    val one = Sketches.f2MomentFrom(corpus)
      .as[(String, Double, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // doubling every count multiplies both cells and true counts by 2,
    // so every squared quantity — rows, median, exact — exactly x4
    val doubled = Sketches.f2MomentFrom(
      corpus.unionByName(corpus.withColumn("doc_id", $"doc_id" + 100L)))
      .as[(String, Double, Long, Double)].collect()
    doubled.foreach { case (lang, est, exact, _) =>
      est shouldBe one(lang)._1 * 4
      exact shouldBe one(lang)._2 * 4
    }
    // a single distinct token collapses each row to one cell: estimate exact
    val heavy = Seq((1L, "cc", "tok tok tok tok tok"))
      .toDF("doc_id", "lang", "text")
    val h = Sketches.f2MomentFrom(heavy)
      .as[(String, Double, Long, Double)].collect().head
    h shouldBe (("cc", 25.0, 25L, 0.0))
  }

  test("theta difference replays the naive recompute; exact columns are true set differences") {
    val out = Sketches.kmvDifferenceLangsFrom(synthCorpus())
      .as[(String, String, Double, Double, Long, Long)].collect().toSeq
    out.map(r => (r._1, r._2)) shouldBe Seq(("aa", "bb"))
    val (_, _, estAb, estBa, exAb, exBa) = out.head
    exAb shouldBe 150L // t000..t149 only in aa
    exBa shouldBe 150L // t300..t449 only in bb
    val ha = (0 until 300).map(i => md5Hex(f"t$i%03d")).distinct
      .sorted.take(Sketches.KmvK)
    val hb = (150 until 450).map(i => md5Hex(f"t$i%03d")).distinct
      .sorted.take(Sketches.KmvK)
    val union = (ha ++ hb).distinct.sorted
    val theta = if (union.size < Sketches.KmvK) 1.0
      else u13(union(Sketches.KmvK - 1))
    def est(onlyIn: Seq[String], other: Seq[String]) = {
      val n = onlyIn.filterNot(other.toSet).count(h => u13(h) < theta)
      BigDecimal(n.toDouble / theta)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    estAb shouldBe est(ha, hb)
    estBa shouldBe est(hb, ha)
    // the estimates bracket the truth within the sketch's sigma fence
    math.abs(estAb - 150.0) / 150.0 should be <= 0.6
    math.abs(estBa - 150.0) / 150.0 should be <= 0.6
  }

  test("cmsCellStream emits per-window frames whose cell-wise sum is the batch sketch") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .limit(40).select($"doc_id", $"lang", $"text")
    val rows = corpus.as[(Long, String, String)].collect().toSeq
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val q = StreamingSketches.cmsCellStream(
        input.toDF().toDF("ts", "lang", "text"), "ts")
      .writeStream.format("memory").queryName("cms_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-cms").toString)
      .outputMode("append").start()
    try {
      input.addData(rows.map { case (id, lang, text) =>
        (ts(if (id % 2 == 0) 10 else 11), lang, text) })
      q.processAllAvailable()
      input.addData(Seq((ts(30), "en", "flush")))
      q.processAllAvailable()
      input.addData(Seq((ts(31), "en", "nudge")))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("cms_twin").filter($"window_start" < ts(20))
    emitted.select(countDistinct($"window_start")).as[Long].head() shouldBe 2L
    // CMS merges by ADDITION: summing the two windows' frames cell-wise
    // gives the batch sketch of the same corpus
    val summed = emitted.groupBy("row", "cell")
      .agg(sum($"cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val batch = Sketches.cmsSketchCellsFrom(corpus)
      .as[(Int, Long, Long)].collect().toSet
    summed shouldBe batch
  }

  test("histogram shard store: appended shards estimate identically to the one-pass sketch") {
    val d = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-hist").toString
    // three disjoint shard jobs append independently
    (0 to 2).foreach { s =>
      Sketches.appendHistShard(
        Sketches.histRegistersFrom(d.filter($"doc_id" % 3 === s), "n_chars"),
        dir)
    }
    val fromStore = Sketches.estimateHistStore(spark, dir)
      .as[(Double, Long, Long, Double)].collect().toSeq
    val onePass = Sketches.histQuantilesFrom(
        Sketches.histRegistersFrom(d, "n_chars"))
      .as[(Double, Long, Long, Double)].collect().toSeq
    fromStore shouldBe onePass
    fromStore should have length 3
  }

  test("histBinStream emits per-window frames whose bin-wise sum is the batch histogram") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars")
    val rows = d.as[(Long, Long)].collect().toSeq
    def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val input = MemoryStream[(Timestamp, Long)]
    val q = StreamingSketches.histBinStream(
        input.toDF().toDF("ts", "n_chars"), "n_chars", "ts")
      .writeStream.format("memory").queryName("hist_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-hist").toString)
      .outputMode("append").start()
    try {
      input.addData(rows.map { case (id, nc) =>
        (ts(if (id % 2 == 0) 10 else 11), nc) })
      q.processAllAvailable()
      input.addData(Seq((ts(30), 1L)))
      q.processAllAvailable()
      input.addData(Seq((ts(31), 1L)))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("hist_twin").filter($"window_start" < ts(20))
    emitted.select(countDistinct($"window_start")).as[Long].head() shouldBe 2L
    // summed across the two windows == the batch histogram bin-for-bin,
    // so quantile estimates over the merged span are the batch estimates
    val summed = emitted.groupBy("bin").agg(sum($"cnt").as("cnt"))
    val est = Sketches.histQuantilesFrom(summed)
      .as[(Double, Long, Long, Double)].collect().toSeq
    val batch = Sketches.histQuantilesFrom(
        Sketches.histRegistersFrom(d, "n_chars"))
      .as[(Double, Long, Long, Double)].collect().toSeq
    est shouldBe batch
    summed.as[(Long, Long)].collect().toSet shouldBe
      Sketches.histRegistersFrom(d, "n_chars")
        .as[(Long, Long)].collect().toSet
  }

  test("histogram quantile estimates sit within one bin width of the exact quantiles") {
    val d = graft.sources.Tables.documents(spark, sf)
    val est = Sketches.histQuantilesFrom(
        Sketches.histRegistersFrom(d.select($"n_chars"), "n_chars"))
      .select($"p", $"est").as[(Double, Double)].collect().toMap
    val exact = d.stat.approxQuantile("n_chars",
      Array(0.5, 0.9, 0.99), 0.0) // relativeError 0 = exact
    List(0.5, 0.9, 0.99).zip(exact).foreach { case (p, ex) =>
      math.abs(est(p) - ex) should be <= 64.0
    }
  }

  test("CMS-prefiltered heavy hitters == the plain exact filter; duplication-invariant") {
    import graft.functions.TextFunctions.tokens
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val got = Sketches.heavyHittersCmsFrom(corpus)
      .as[(String, Long)].collect().toSeq
    // the reference answer, computed the plain way (the oracle's shape)
    val counts = corpus
      .select(explode(tokens($"text")).as("token"))
      .filter(org.apache.spark.sql.functions.length($"token") > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    val thr = math.ceil(0.01 * counts.map(_._2).sum).toLong
    val expected = counts.filter(_._2 >= thr).sortBy(_._1)
    got shouldBe expected
    got.nonEmpty shouldBe true
    // the corpus's rare tail is genuinely excluded (the prefilter and
    // the confirm have something to do)
    expected.length should be < counts.length
    // doubling the corpus doubles counts AND the threshold: same set
    val doubled = Sketches.heavyHittersCmsFrom(corpus.unionByName(corpus))
      .as[(String, Long)].collect().toSeq
    doubled.map(_._1) shouldBe got.map(_._1)
    doubled.map(_._2) shouldBe got.map(_._2 * 2)
  }

  test("ciPartialStream windows sum per-b to the batch bootstrap " +
    "partials, and the merged finish equals the batch CI row") {
    import graft.operators.DataQuality
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .limit(60).select($"doc_id", $"n_chars")
    val rows = corpus.as[(Long, Long)].collect().toSeq
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long)]
    val q = StreamingSketches.ciPartialStream(
        input.toDF().toDF("ts", "doc_id", "n_chars"), "ts")
      .writeStream.format("memory").queryName("ci_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-ci").toString)
      .outputMode("append").start()
    try {
      // ordered replay: two event-time windows, then watermark flushes
      input.addData(rows.map { case (id, n) =>
        (ts(if (id % 2 == 0) 10 else 11), id, n) })
      q.processAllAvailable()
      input.addData(Seq((ts(30), -1L, 0L)))
      q.processAllAvailable()
      input.addData(Seq((ts(31), -2L, 0L)))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("ci_twin").filter($"window_start" < ts(20))
    emitted.select(countDistinct($"window_start")).as[Long].head() shouldBe 2L
    // per-b ADDITION across the two windows == the batch partials
    val summed = emitted.groupBy("b")
      .agg(sum($"sx").as("sx"), sum($"sw").as("sw"),
        sum($"n_docs").as("n_docs"), sum($"tx").as("tx"))
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    val batch = DataQuality.bootstrapPartialsFrom(corpus)
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    summed shouldBe batch
    // and finishing the emitted frames gives the batch CI row exactly
    val streamCi = DataQuality.ciFromPartials(
        emitted.select($"b", $"sx", $"sw", $"n_docs", $"tx"))
      .as[(Long, Double, Double, Double)].head()
    val batchCi = DataQuality.bootstrapCiFrom(corpus)
      .as[(Long, Double, Double, Double)].head()
    streamCi shouldBe batchCi
  }
}
