package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{PersistedIndex, TextPipeline}

/** The persisted bigram-LM store: scoring against frozen counts equals
  * the in-query lmBigram when the index was built from the scored
  * corpus, and the streaming scorer prices arriving documents
  * identically (stream-static joins, no state).
  */
class LmIndexSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def corpus = spark.read.parquet(s"$sf/documents.parquet")
    .select($"doc_id", $"text")

  test("persisted-LM scoring equals the in-query lmBigram on the training corpus") {
    val dir = java.nio.file.Files.createTempDirectory("lm-idx").toString
    PersistedIndex.buildLmIndex(spark, corpus, dir)
    val fromIndex = PersistedIndex.scoreLmIndex(spark, corpus, dir)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    val inQuery = TextPipeline.lmBigramFrom(spark, corpus)
      .as[(Long, Long, Double, Double)].collect().toSeq
    fromIndex shouldBe inQuery
    fromIndex.nonEmpty shouldBe true
  }

  test("mink_contamination picks each doc's 20% rarest tokens, hand-checked") {
    // crafted corpus: 'a' x9 + 'b' (doc 1: 10 tokens), 'a' x4 + 'z' (doc 2:
    // 5 tokens). N = 15; freq(a)=13, freq(b)=1, freq(z)=1.
    // doc 1: n_mink = ceil(10/5) = 2 -> rarest tokens are b (freq 1) then
    // the first 'a' (freq 13, earliest pos): nll = -(ln(1/15)+ln(13/15))/2.
    // doc 2: n_mink = 1 -> z alone: nll = -ln(1/15).
    val crafted = Seq(
      (1L, "a a a a b a a a a a"),
      (2L, "a a z a a")).toDF("doc_id", "text")
    val out = TextPipeline.minkContaminationFrom(spark, crafted)
      .as[(Long, Long, Long, Double)].collect().toSeq
    def micro(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // the operator's explicit half-up quantize (same IEEE op sequence)
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val d1 = r4(-(micro(math.log(1.0 / 15)) + micro(math.log(13.0 / 15))) / 2)
    val d2 = r4(-micro(math.log(1.0 / 15)) / 1)
    out shouldBe Seq((1L, 10L, 2L, d1), (2L, 5L, 1L, d2))
  }

  test("unseen bigrams score with the Laplace floor, not NaN") {
    val dir = java.nio.file.Files.createTempDirectory("lm-idx2").toString
    PersistedIndex.buildLmIndex(spark, corpus, dir)
    val novel = Seq((999999L, "zzzz qqqq wwww")).toDF("doc_id", "text")
    val r = PersistedIndex.scoreLmIndex(spark, novel, dir)
      .as[(Long, Long, Double, Double)].collect().toSeq
    r should have length 1
    r.head._2 shouldBe 2L
    r.head._3.isNaN shouldBe false
    r.head._3 should be > 0.0
  }

  test("streaming scorer prices documents as the batch index scorer does") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lm-idx3").toString
    PersistedIndex.buildLmIndex(spark, corpus, dir)
    val rows = corpus.as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)]
    input.addData(rows)
    val q = PersistedIndex.scoreLmStream(spark,
        input.toDF().toDF("doc_id", "text"), dir)
      .writeStream.format("memory").queryName("lm_stream")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("chk-lm").toString)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("lm_stream")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    val batch = PersistedIndex.scoreLmIndex(spark, corpus, dir)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    streamed.map(r => (r._1, r._2)) shouldBe batch.map(r => (r._1, r._2))
    // the stream's unordered per-doc sum may differ from the batch's
    // position-ordered fold by float ulps — scores agree to 4 dp ± 1 ulp
    // of the rounding quantum
    streamed.zip(batch).foreach { case (s, b) =>
      s._3 shouldBe b._3 +- 0.0002
      s._4 shouldBe b._4 +- 0.001
    }
  }
}
