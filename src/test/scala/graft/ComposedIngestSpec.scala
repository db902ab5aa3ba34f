package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextPipeline
import graft.streaming.StreamingText

/** The composed streaming ingest program
  * ([[StreamingText.trainingIngestStream]]): quality gate -> exact dedup ->
  * per-source cap -> per-language token budget -> split in ONE streaming
  * query. Two proofs:
  *  - on an ordered replay (one micro-batch, the batch operators' admission
  *    orders) the admitted rows EQUAL the batch pipeline composed from the
  *    real batch operators (gate projection -> domainCapFrom ->
  *    tokenBudgetCore -> split projection);
  *  - across a checkpoint stop/restart the counters and digest state
  *    survive: the two-chunk run matches a driver-side fold of the same
  *    chunked replay, and re-ingested duplicates of pre-restart documents
  *    are suppressed by the recovered digest state.
  */
class ComposedIngestSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val CapK = 20
  private val Budget = 1500L

  /** (doc_id, source, lang, text, ts) rows, doc_id-ascending timestamps
    * past the initial watermark.
    */
  private def corpusRows(): Seq[(Long, String, String, String, Timestamp)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source", $"lang", $"text")
      .as[(Long, String, String, String)].collect().toSeq.sortBy(_._1)
      .map { case (id, src, lang, text) =>
        (id, src, lang, text, new Timestamp(100000L + id))
      }

  private def startQuery(input: MemoryStream[
      (Long, String, String, String, Timestamp)], root: String) =
    StreamingText.trainingIngestStream(
      input.toDF().toDF("doc_id", "source", "lang", "text", "ts"), "ts",
      k = CapK, budget = Budget)
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()

  test("one-batch ordered replay equals the composed BATCH pipeline") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("ingest-one").toString
    val input = MemoryStream[(Long, String, String, String, Timestamp)]
    input.addData(corpusRows())
    val q = startQuery(input, root)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(s"$root/out")
      .select($"lang", $"source", $"doc_id", $"n_tokens", $"cap_rk",
        $"start_offset", $"bucket", $"split")
      .as[(String, String, Long, Long, Long, Long, Long, String)]
      .collect().toSeq.sorted

    // the batch chain IS a first-class operator
    // (CurationProgram.curationProgramFrom — gate -> exact dedup -> cap
    // -> budget -> split); on the dup-free snapshot (asserted) its dedup
    // stage is a pass-through, so stream and program must agree
    // row-for-row
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    corpus.groupBy(md5(lower(trim($"text")))).count()
      .filter($"count" > 1).count() shouldBe 0L
    val batch = graft.operators.CurationProgram
      .curationProgramFrom(corpus, minQuality = 0.5, k = CapK,
        budget = Budget)
      .select($"lang", $"source", $"doc_id", $"n_tokens", $"cap_rk",
        $"start_offset", $"bucket", $"split")
      .as[(String, String, Long, Long, Long, Long, Long, String)]
      .collect().toSeq.sorted

    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
    // both allowances bind on this corpus (the composition is exercised)
    streamed.map(_._5).max shouldBe CapK.toLong
    streamed.foreach(_._6 should be < Budget)
  }

  test("chunked replay with a checkpoint restart matches the sequential fold; dup re-ingest suppressed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("ingest-restart").toString
    val rows = corpusRows()
    val (chunk1, chunk2base) = rows.splitAt(rows.length / 2)
    // re-ingest 10 chunk-1 documents under fresh ids AFTER the restart —
    // the daily-crawl re-fetch; the recovered digest state must drop them
    val dups = chunk1.take(10).map { case (id, src, lang, text, _) =>
      (id + 1000000L, src, lang, text, new Timestamp(200000L + id))
    }
    val chunk2 = chunk2base ++ dups

    val input = MemoryStream[(Long, String, String, String, Timestamp)]
    val q1 = startQuery(input, root)
    input.addData(chunk1)
    q1.processAllAvailable()
    q1.stop()
    val q2 = startQuery(input, root)
    input.addData(chunk2)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(s"$root/out")
      .select($"lang", $"source", $"doc_id", $"n_tokens", $"cap_rk",
        $"start_offset")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq.sorted

    // no re-ingested duplicate survives the recovered digest state
    streamed.filter(_._3 >= 1000000L) shouldBe empty

    // driver-side fold of the same chunked replay: per chunk, gate-passing
    // non-duplicate rows enter the cap in doc_id order per source, then the
    // cap's admissions enter the budget in (md5 skey, doc_id) order per
    // lang; counters carry across the chunk boundary (the restart)
    val gatePass = StreamingText
      .qualityFilterStream(spark.read.parquet(s"$sf/documents.parquet"))
      .select($"doc_id").as[Long].collect().toSet
    val nTok = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id",
        org.apache.spark.sql.functions.size(graft.functions.TextFunctions.tokens($"text")).cast("long"),
        md5(concat(lit("tb:"), $"doc_id")))
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val capCount = scala.collection.mutable.Map.empty[String, Long]
    val budgetUsed = scala.collection.mutable.Map.empty[String, Long]
    val expected: Seq[(String, String, Long, Long, Long, Long)] =
      Seq(chunk1, chunk2).flatMap { chunk =>
        val fresh = chunk.filter(r => r._1 < 1000000L && gatePass(r._1))
        val capAdmitted: Seq[(String, String, Long, Long, Long, String)] =
          fresh.sortBy(_._1).flatMap {
            case (id, src, lang, _, _) =>
              val n = capCount.getOrElse(src, 0L)
              if (n < CapK) {
                capCount(src) = n + 1
                Some((lang, src, id, nTok(id)._1, n + 1, nTok(id)._2))
              } else None
          }
        capAdmitted.sortBy(r => (r._6, r._3)).flatMap {
          case (lang, src, id, n, rk, _) =>
            val used = budgetUsed.getOrElse(lang, 0L)
            if (used < Budget) {
              budgetUsed(lang) = used + n
              Some((lang, src, id, n, rk, used))
            } else None
        }
      }.sorted
    streamed shouldBe expected
  }
}
