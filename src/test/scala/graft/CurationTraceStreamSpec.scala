package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.CurationProgram
import graft.streaming.StreamingText

/** The streaming lineage twin ([[StreamingText.trainingIngestTraceStream]])
  * of the batch curation trace: one outcome row per arriving document.
  *  - a one-batch ordered replay equals CurationProgram.curationTraceFrom
  *    row-for-row (every doc, every outcome label);
  *  - a checkpoint stop/restart carries the digest/cap/budget state, so
  *    the chunked run's outcomes match the one-batch run's AND a
  *    re-ingested duplicate of a pre-restart doc is traced `dedup_exact`
  *    by the recovered digest state.
  */
class CurationTraceStreamSpec extends AnyFunSuite with Matchers
    with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val CapK = 20
  private val Budget = 1500L

  private def corpusRows(): Seq[(Long, String, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source", $"lang", $"text")
      .as[(Long, String, String, String)].collect().toSeq.sortBy(_._1)

  private def startQuery(input: MemoryStream[(Long, String, String, String)],
      root: String) =
    StreamingText.trainingIngestTraceStream(
      input.toDF().toDF("doc_id", "source", "lang", "text"),
      k = CapK, budget = Budget)
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()

  private def readTraced(root: String): Seq[(Long, String, String, Long, Long, String)] =
    spark.read.parquet(s"$root/out")
      .select($"doc_id", $"source", $"lang", $"n_tokens", $"quality_q4",
        $"outcome")
      .as[(Long, String, String, Long, Long, String)].collect().toSeq.sorted

  private def batchTrace(): Seq[(Long, String, String, Long, Long, String)] =
    CurationProgram.curationTraceFrom(
        spark.read.parquet(s"$sf/documents.parquet"),
        minQuality = 0.5, k = CapK, budget = Budget)
      .as[(Long, String, String, Long, Long, String)].collect().toSeq.sorted

  test("one-batch ordered replay equals the batch curation trace row-for-row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("trace-one").toString
    val input = MemoryStream[(Long, String, String, String)]
    input.addData(corpusRows())
    val q = startQuery(input, root)
    try q.processAllAvailable() finally q.stop()
    val streamed = readTraced(root)
    streamed shouldBe batchTrace()
    // every stage label actually occurs at this SF — the equality above
    // is exercised, not vacuous
    streamed.map(_._6).toSet shouldBe Set("quality_gate", "domain_cap",
      "token_budget", "admitted")
  }

  test("checkpoint restart carries state; re-ingested dup traces dedup_exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("trace-restart").toString
    val rows = corpusRows()
    val (chunk1, chunk2base) = rows.splitAt(rows.length / 2)
    // re-fetch 5 GATE-PASSING chunk-1 docs under fresh ids after the
    // restart — the recovered digest state must trace them dedup_exact
    // (a gate-failed doc never claimed its digest, so re-fetching one
    // would trace quality_gate again, not dedup_exact)
    val gatePass = StreamingText
      .qualityFilterStream(spark.read.parquet(s"$sf/documents.parquet"))
      .select($"doc_id").as[Long].collect().toSet
    val dups = chunk1.filter(r => gatePass(r._1)).take(5)
      .map { case (id, src, lang, text) => (id + 1000000L, src, lang, text) }
    dups should have size 5

    val input = MemoryStream[(Long, String, String, String)]
    val q1 = startQuery(input, root)
    input.addData(chunk1)
    q1.processAllAvailable()
    q1.stop()
    val q2 = startQuery(input, root)
    input.addData(chunk2base ++ dups)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = readTraced(root)
    // the re-ingested duplicates hit the RECOVERED digest state
    streamed.filter(_._1 >= 1000000L).map(_._6).toSet shouldBe
      Set("dedup_exact")
    // driver-side fold of the same chunked replay (the ComposedIngestSpec
    // discipline): gate/dedup/cap admission orders are id-ordered and so
    // chunk-invariant, but the budget admits per chunk in (skey, doc_id)
    // order — the fold carries every counter across the restart exactly
    // like the recovered state must
    val meta = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id",
        org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.tokens($"text")).cast("long"),
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.round(
            graft.operators.TextPipeline.qualityCol, 4) * 10000d + 0.5d)
          .cast("long"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.trim($"text"))),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("tb:"), $"doc_id")))
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val seenHash = scala.collection.mutable.Set.empty[String]
    val capCount = scala.collection.mutable.Map.empty[String, Long]
    val budgetUsed = scala.collection.mutable.Map.empty[String, Long]
    val expected = Seq(chunk1, chunk2base).flatMap { chunk =>
      val staged = chunk.sortBy(_._1).map { case (id, src, lang, _) =>
        val (nTok, q4, hash, skey) = meta(id)
        val outcome =
          if (q4 < 5000L) "quality_gate"
          else if (seenHash(hash)) "dedup_exact"
          else {
            seenHash += hash
            val n = capCount.getOrElse(src, 0L)
            if (n >= CapK) "domain_cap"
            else { capCount(src) = n + 1; null }
          }
        (id, src, lang, nTok, q4, skey, outcome)
      }
      val (competing, decided) = staged.partition(_._7 == null)
      val budgeted = competing.sortBy(r => (r._6, r._1)).map { r =>
        val used = budgetUsed.getOrElse(r._3, 0L)
        if (used < Budget) {
          budgetUsed(r._3) = used + r._4
          r.copy(_7 = "admitted")
        } else r.copy(_7 = "token_budget")
      }
      (decided ++ budgeted).map(r => (r._1, r._2, r._3, r._4, r._5, r._7))
    }.sorted
    streamed.filter(_._1 < 1000000L) shouldBe expected
  }
}
