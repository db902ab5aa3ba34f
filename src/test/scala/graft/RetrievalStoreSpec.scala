package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{PersistedIndex, RetrievalProgram, RetrievalStore,
  StoreVersioning}

/** The persisted retrieval store (round 14): build-once/probe-many must
  * equal the in-query composed program, probes must read ZERO corpus
  * text, appends must be idempotent and never tear a pinned reader, the
  * streaming ingest twin must equal the batch folds (with checkpoint
  * restart suppressing duplicates), and the one retention policy must
  * apply.
  */
class RetrievalStoreSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text"))

  private lazy val storeDir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-rstore-spec").toString
    val isDelta = pmod(col("doc_id"), lit(100)) === 77
    RetrievalStore.buildRetrievalStore(spark, docs.filter(!isDelta), d)
    RetrievalStore.appendToRetrievalStore(spark, docs.filter(isDelta), d)
    d
  }

  test("store probe equals the in-query composed program row-for-row " +
    "(build on the residue + append the delta == one-shot full corpus)") {
    val got = RetrievalStore.probeRetrievalStore(spark, storeDir)
      .collect().map(_.toSeq).toSeq
    val want = RetrievalProgram.retrievalProgram(spark, sf)
      .collect().map(_.toSeq).toSeq
    got should not be empty
    got shouldBe want
  }

  test("the probe reads NO corpus text and the query-term filter " +
    "reaches the postings scan's PushedFilters") {
    // the probe's public result sits behind checkpoint fences (which
    // erase upstream plans), so assert on the exposed UNFENCED stage
    // frames — together they are every scan the probe executes
    val tfPlan = RetrievalStore.probeTf(spark, storeDir)
      .queryExecution.explainString(FormattedMode)
    tfPlan should not include "documents.parquet"
    val scanBlocks = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(tfPlan).toList
    val postings = scanBlocks.filter(_.contains("/postings"))
    postings should not be empty
    postings.foreach { b =>
      withClue(s"postings scan without the pushed term filter:\n$b\n") {
        b should include("In(term, ")
      }
    }
    val vecPlan = RetrievalStore.probeVectorScored(spark, storeDir)
      .queryExecution.explainString(FormattedMode)
    vecPlan should not include "documents.parquet"
    val vecScans = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(vecPlan).toList
    vecScans.exists(_.contains("/vectors")) shouldBe true
    vecScans.exists(_.contains("/norms")) shouldBe true
    // and the fused result's own plan carries no corpus scan either
    RetrievalStore.probeRetrievalStore(spark, storeDir)
      .queryExecution.explainString(FormattedMode) should
      not include "documents.parquet"
  }

  test("a replayed append batch is a no-op (idempotent fold)") {
    storeDir // force build + first append
    val before =
      StoreVersioning.latestVersion(spark, s"$storeDir/manifest")
    RetrievalStore.appendToRetrievalStore(spark,
      docs.filter(pmod(col("doc_id"), lit(100)) === 77), storeDir)
    StoreVersioning.latestVersion(spark, s"$storeDir/manifest") shouldBe
      before
  }

  test("a reader pinned to the pre-append version never sees the delta") {
    storeDir
    val v1 = RetrievalStore.probeRetrievalStore(spark, storeDir, 1L)
      .collect().map(_.toSeq).toSeq
    // an independent base-only store answers the same probe
    val baseOnly = java.nio.file.Files
      .createTempDirectory("graft-rstore-base").toString
    RetrievalStore.buildRetrievalStore(spark,
      docs.filter(pmod(col("doc_id"), lit(100)) =!= 77), baseOnly)
    val want = RetrievalStore.probeRetrievalStore(spark, baseOnly)
      .collect().map(_.toSeq).toSeq
    v1 shouldBe want
  }

  test("retainStore keeps the latest version probeable and leaves " +
    "exactly the referenced segment directories on disk") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-rstore-retain").toString
    RetrievalStore.buildRetrievalStore(spark,
      docs.filter(col("doc_id") < 300), d)
    RetrievalStore.appendToRetrievalStore(spark,
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 400), d)
    val full = RetrievalStore.probeRetrievalStore(spark, d)
      .collect().map(_.toSeq).toSeq
    PersistedIndex.retainStore(spark, "retrieval", d, keep = 1)
    StoreVersioning.listVersions(spark, s"$d/manifest") shouldBe Seq(2L)
    RetrievalStore.probeRetrievalStore(spark, d)
      .collect().map(_.toSeq).toSeq shouldBe full
    val fs = StoreVersioning.fs(spark, d)
    val live = StoreVersioning
      .liveTokens(spark, s"$d/manifest").getOrElse("seg", Seq.empty).toSet
    Seq("chunkmeta", "vectors", "norms", "postings").foreach { sub =>
      val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$d/$sub"))
        .map(_.getPath.getName).filter(_.startsWith("ingest="))
        .map(_.stripPrefix("ingest=")).toSet
      withClue(s"sub-store $sub:") { names shouldBe live }
    }
  }

  test("retrievalIngestStream equals the batch-built store on an " +
    "ordered replay, and a checkpoint restart suppresses duplicates") {
    implicit val sqlCtxR: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dirS = java.nio.file.Files
      .createTempDirectory("graft-rstore-stream").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft-rstore-batch").toString
    val base = docs.filter(col("doc_id") < 300)
    val d1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val d2 = docs.filter(col("doc_id") >= 400 && col("doc_id") < 450)
    RetrievalStore.buildRetrievalStore(spark, base, dirS)
    RetrievalStore.buildRetrievalStore(spark, base, dirB)
    RetrievalStore.appendToRetrievalStore(spark, d1, dirB)
    RetrievalStore.appendToRetrievalStore(spark, d2, dirB)
    val chk = java.nio.file.Files.createTempDirectory("chk-rstore").toString
    val input = MemoryStream[(Long, String)]
    val q = RetrievalStore.retrievalIngestStream(
        input.toDF().toDF("doc_id", "text"), dirS, chk)
      .start()
    try {
      input.addData(d1.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // restart from the same checkpoint; replay d1 (duplicates) + d2
    val input2 = MemoryStream[(Long, String)]
    val q2 = RetrievalStore.retrievalIngestStream(
        input2.toDF().toDF("doc_id", "text"), dirS, chk)
      .start()
    try {
      input2.addData(d1.as[(Long, String)].collect().toSeq)
      q2.processAllAvailable()
      input2.addData(d2.as[(Long, String)].collect().toSeq)
      q2.processAllAvailable()
    } finally q2.stop()
    RetrievalStore.probeRetrievalStore(spark, dirS)
      .collect().map(_.toSeq).toSeq shouldBe
      RetrievalStore.probeRetrievalStore(spark, dirB)
        .collect().map(_.toSeq).toSeq
    // the replayed d1 batch landed no second copy of its chunks
    spark.read.parquet(s"$dirS/chunkmeta").count() shouldBe
      spark.read.parquet(s"$dirB/chunkmeta").count()
  }

  test("compactRetrievalStore folds live segments into ONE; the probe " +
    "is byte-identical and retention then drops the folded segments") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-rstore-compact").toString
    RetrievalStore.buildRetrievalStore(spark,
      docs.filter(col("doc_id") < 300), d)
    RetrievalStore.appendToRetrievalStore(spark,
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 400), d)
    val before = RetrievalStore.probeRetrievalStore(spark, d)
      .collect().map(_.toSeq).toSeq
    RetrievalStore.compactRetrievalStore(spark, d)
    StoreVersioning.liveTokens(spark, s"$d/manifest")("seg") shouldBe
      Seq("c3")
    RetrievalStore.probeRetrievalStore(spark, d)
      .collect().map(_.toSeq).toSeq shouldBe before
    // a pinned pre-compaction reader still answers from its segments
    RetrievalStore.probeRetrievalStore(spark, d, 2L)
      .collect().map(_.toSeq).toSeq shouldBe before
    // retention: only the compacted segment survives a keep=1 sweep
    PersistedIndex.retainStore(spark, "retrieval", d, keep = 1)
    val fs = StoreVersioning.fs(spark, d)
    Seq("chunkmeta", "vectors", "norms", "postings").foreach { sub =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$d/$sub"))
        .map(_.getPath.getName).filter(_.startsWith("ingest=")).toSeq
        .shouldBe(Seq("ingest=c3"))
    }
    RetrievalStore.probeRetrievalStore(spark, d)
      .collect().map(_.toSeq).toSeq shouldBe before
  }
}
