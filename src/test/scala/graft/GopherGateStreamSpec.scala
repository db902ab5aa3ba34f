package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.CorpusRules
import graft.streaming.StreamingText

/** The stateless streaming Gopher gate admits EXACTLY the batch rule
  * battery's keep-set: same quantized rule inputs (q2 mean length, q4
  * top share), same conjunction, same zero-token drop — so the ingest
  * gate and the offline battery can never disagree about a document.
  */
class GopherGateStreamSpec extends AnyFunSuite with Matchers
    with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stream keep-set and rule inputs equal the batch battery") {
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val batch = CorpusRules.gopherRulesFrom(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[Long]("n_words"),
          r.getAs[Long]("mean_len_q2"), r.getAs[Long]("n_stopwords"),
          r.getAs[Long]("top_share_q4"))).toMap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingText
      .gopherGateStream(input.toDF().toDF("doc_id", "text"))
      .select($"doc_id", $"n_words", $"mean_len_q2", $"n_stopwords",
        $"top_share_q4")
      .writeStream.format("memory").queryName("t_gopher")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-gopher").toString)
      .outputMode("append").start()
    val streamed =
      try {
        input.addData(corpus.as[(Long, String)].collect().toSeq)
        q.processAllAvailable()
        spark.table("t_gopher").as[(Long, Long, Long, Long, Long)]
          .collect()
      } finally q.stop()

    // the gate admits exactly the batch keep-set...
    streamed.map(_._1).toSet shouldBe
      batch.collect { case (id, t) if t._1 => id }.toSet
    // ...with bit-identical quantized rule inputs on every admitted doc
    streamed.foreach { case (id, nw, ml, ns, ts) =>
      val b = batch(id)
      (nw, ml, ns, ts) shouldBe ((b._2, b._3, b._4, b._5))
    }
  }

  test("zero-token and per-rule failures drop; a passing doc flows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val passText = ((1 to 56).map(i => s"word$i") ++
      Seq("the", "of", "and", "is")).mkString(" ")
    val q = StreamingText
      .gopherGateStream(input.toDF().toDF("doc_id", "text"))
      .select($"doc_id")
      .writeStream.format("memory").queryName("t_gopher2")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-gopher2").toString)
      .outputMode("append").start()
    val admitted =
      try {
        input.addData(Seq(
          (1L, passText),                      // all rules hold
          (2L, "   "),                         // zero tokens
          (3L, "the of and is tiny"),          // word count
          (4L, (1 to 60).map(i => s"w$i").mkString(" ")))) // no stopwords
        q.processAllAvailable()
        spark.table("t_gopher2").as[Long].collect().toSet
      } finally q.stop()
    admitted shouldBe Set(1L)
  }
}
