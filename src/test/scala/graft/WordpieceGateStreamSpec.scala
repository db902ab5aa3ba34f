package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.WordPieceTrainer
import graft.streaming.StreamingText

/** The streaming WordPiece pricing gate equals the batch accountant:
  * every streamed document's `n_wp_tokens` matches the batch
  * word-pricing join (frozen pieces, greedy longest-match, unpriced
  * words contribute 0 — the inner-join contract), and the gate's
  * max-token / fully-priced policies drop exactly the expected rows.
  */
class WordpieceGateStreamSpec extends AnyFunSuite with Matchers
    with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def batchPrices: Map[Long, Long] = {
    val corpus = graft.sources.Tables.documents(spark, sf)
    val pieces = WordPieceTrainer.FrozenPieces.toSet
    corpus.select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
          .map(w => WordPieceTrainer.greedyEncode(w, pieces).length.toLong)
          .sum
        id -> toks
      }.toMap
  }

  test("stream gate prices == batch greedy pricing, single evaluation") {
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val expected = batchPrices

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docsStream = input.toDF().toDF("doc_id", "text")
    val q = StreamingText.wordpieceGateStream(docsStream)
      .select($"doc_id", $"n_wp_tokens", $"n_unpriced_words")
      .writeStream.format("memory").queryName("t_wpgate")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-wpgate").toString)
      .outputMode("append").start()
    val streamed =
      try {
        input.addData(corpus.as[(Long, String)].collect().toSeq)
        q.processAllAvailable()
        spark.table("t_wpgate").as[(Long, Long, Long)].collect()
      } finally q.stop()

    // the frozen alphabet comes from this corpus: every word priced
    streamed.foreach { case (_, _, unpriced) => unpriced shouldBe 0L }
    streamed.map { case (id, n, _) => id -> n }.toMap shouldBe expected
  }

  test("max-token and fully-priced policies drop the right rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docsStream = input.toDF().toDF("doc_id", "text")
    // 'zebra' contains characters outside the frozen alphabet ('z' is
    // word-initial-only in the corpus? — verify via the encoder itself)
    val pieces = WordPieceTrainer.FrozenPieces.toSet
    val unsegmentable = "xyzzy!" // '!' is outside the corpus alphabet
    WordPieceTrainer.greedyEncode(unsegmentable, pieces) shouldBe empty

    val q = StreamingText
      .wordpieceGateStream(docsStream, maxTokens = 6L)
      .select($"doc_id")
      .writeStream.format("memory").queryName("t_wpgate2")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-wpgate2").toString)
      .outputMode("append").start()
    val admitted =
      try {
        input.addData(Seq(
          (1L, "win"),                  // 1 token -> admitted
          (2L, "the big window"),       // th+##e, big, wind+##o+##w = 6
          (3L, "window window window"), // 9 tokens: over budget
          (4L, s"win $unsegmentable"))) // contains an unpriced word
        q.processAllAvailable()
        spark.table("t_wpgate2").as[Long].collect().toSet
      } finally q.stop()
    admitted shouldBe Set(1L, 2L)
  }
}
