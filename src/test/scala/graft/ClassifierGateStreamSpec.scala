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
}
