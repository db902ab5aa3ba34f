package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextPipeline
import graft.streaming.StreamingText

/** The streaming frozen-classifier gate equals the batch scorer: train
  * the hashed linear model once in batch, ship its weights into the
  * stateless stream gate as a plan constant, stream the SAME documents
  * through, and the per-doc scores match round-for-round (both sides are
  * position-ordered folds over the same hashed buckets).
  */
class ClassifierGateStreamSpec extends AnyFunSuite with Matchers
    with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stream gate scores == batch classifier scores; threshold drops rows") {
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val weights = TextPipeline.qualityClassifierWeights(corpus)
    weights.size should be <= 4096
    val batch = TextPipeline.qualityClassifier(spark, sf)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docsStream = input.toDF().toDF("doc_id", "text")
    // threshold = -inf: keep every row so scores compare 1:1
    val q = StreamingText
      .classifierGateStream(docsStream, weights, Double.NegativeInfinity)
      .select($"doc_id", $"score")
      .writeStream.format("memory").queryName("t_clsgate")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-clsgate").toString)
      .outputMode("append").start()
    val streamed =
      try {
        input.addData(corpus.as[(Long, String)].collect().toSeq)
        q.processAllAvailable()
        spark.table("t_clsgate").as[(Long, Double)].collect().toMap
      } finally q.stop()

    streamed.keySet shouldBe batch.keySet
    streamed.foreach { case (id, s) => s shouldBe batch(id) }

    // the gate itself: threshold 0.0 admits exactly the batch-positive docs
    val q2 = StreamingText.classifierGateStream(docsStream, weights, 0.0)
      .select($"doc_id")
      .writeStream.format("memory").queryName("t_clsgate2")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-clsgate2").toString)
      .outputMode("append").start()
    val admitted =
      try {
        input.addData(corpus.as[(Long, String)].collect().toSeq)
        q2.processAllAvailable()
        spark.table("t_clsgate2").as[Long].collect().toSet
      } finally q2.stop()
    admitted shouldBe batch.collect { case (id, s) if s > 0.0 => id }.toSet
  }

  test("zero-token docs drop (batch parity) and an empty model gates safely") {
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val weights = TextPipeline.qualityClassifierWeights(corpus)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the batch scorer emits no row for a zero-token document; the gate
    // must drop it too — even at a negative threshold that admits every
    // scored row
    val input = MemoryStream[(Long, String)]
    val docsStream = input.toDF().toDF("doc_id", "text")
    val q = StreamingText
      .classifierGateStream(docsStream, weights, Double.NegativeInfinity)
      .select($"doc_id")
      .writeStream.format("memory").queryName("t_clsgate_zero")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-clsgate0").toString)
      .outputMode("append").start()
    val admitted =
      try {
        input.addData(Seq((1L, "the quick fox"), (2L, ""), (3L, "   ")))
        q.processAllAvailable()
        spark.table("t_clsgate_zero").as[Long].collect().toSet
      } finally q.stop()
    admitted shouldBe Set(1L)

    // an empty weights map must not blow up plan construction
    // (map_from_arrays rejects empty literal arrays); it scores 0.0
    val input2 = MemoryStream[(Long, String)]
    val q2 = StreamingText
      .classifierGateStream(input2.toDF().toDF("doc_id", "text"),
        Map.empty[Long, Double], Double.NegativeInfinity)
      .select($"doc_id", $"score")
      .writeStream.format("memory").queryName("t_clsgate_empty")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-clsgate1").toString)
      .outputMode("append").start()
    val scored =
      try {
        input2.addData(Seq((7L, "some words")))
        q2.processAllAvailable()
        spark.table("t_clsgate_empty").as[(Long, Double)].collect().toMap
      } finally q2.stop()
    scored shouldBe Map(7L -> 0.0)
  }
}
