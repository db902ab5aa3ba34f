package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{PersistedIndex, Retrieval}

/** The streaming ingest side of the persisted text index
  * (PersistedIndex.textIndexIngestStream): stream-appended postings
  * shards must equal the batch `appendToTextIndex` output, and a
  * replayed micro-batch (foreachBatch's at-least-once contract) must not
  * duplicate postings.
  */
class StreamingTextIndexSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def terms = Retrieval.QueryTerms

  private def corpus = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
  }

  private def searchRows(dir: String): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    PersistedIndex.searchTextIndex(spark, dir, terms)
      .as[(Long, Long, Double)].collect().toSeq
  }

  test("stream-ingested deltas equal the batch append, search row-for-row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = corpus.filter($"doc_id" % 2 === 0)
    val deltaRows = corpus.filter($"doc_id" % 2 === 1)
      .as[(Long, String)].collect().toSeq

    val batchDir = java.nio.file.Files
      .createTempDirectory("tidx-batch").toString
    PersistedIndex.buildTextIndex(spark, base, batchDir)
    PersistedIndex.appendToTextIndex(spark, deltaRows.toDF("doc_id", "text"),
      batchDir)

    val streamDir = java.nio.file.Files
      .createTempDirectory("tidx-stream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("tidx-ckpt").toString
    PersistedIndex.buildTextIndex(spark, base, streamDir)
    val input = MemoryStream[(Long, String)]
    val q = PersistedIndex.textIndexIngestStream(
      input.toDF().toDF("doc_id", "text"), streamDir, ckpt).start()
    try {
      // two micro-batches — the crawl arriving in chunks
      val (c1, c2) = deltaRows.splitAt(deltaRows.length / 2)
      input.addData(c1)
      q.processAllAvailable()
      input.addData(c2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = searchRows(streamDir)
    streamed shouldBe searchRows(batchDir)
    streamed should have length 10
    // and both equal the one-shot in-query retrieval over the full corpus
    streamed shouldBe Retrieval.indexTopKFrom(spark, corpus, terms, 10)
      .as[(Long, Long, Double)].collect().toSeq
    // BM25 over the stream-built index equals the in-query BM25 too (the
    // doclens/meta sidecars merge across base + stream-batch ingest dirs)
    PersistedIndex.searchTextIndexBm25(spark, streamDir, terms)
      .as[(Long, Long, Double)].collect().toSeq shouldBe
      Retrieval.bm25TopKFrom(spark, corpus, terms, 10)
        .as[(Long, Long, Double)].collect().toSeq
  }

  test("streamed BM25 query batches score exactly the batch probe, per query") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("tidx-qs").toString
    val out = java.nio.file.Files.createTempDirectory("tidx-qs-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("tidx-qs-ck").toString
    graft.operators.PersistedIndex.buildTextIndex(spark, corpus, dir)

    val panel = Retrieval.QueryPanel
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.PersistedIndex.bm25QueryStream(
      input.toDF().toDF("query_id", "term"), dir, out, ckpt).start()
    // micro-batches split at a QUERY boundary — a real serving stream
    // sends a query's terms in one event, so a query never spans batches
    val (c1, c2) = panel.partition(_._1 <= 2)
    try {
      input.addData(c1)
      q.processAllAvailable()
      input.addData(c2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(out)
      .select($"query_id", $"rank", $"doc_id", $"n_terms_hit", $"score")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sorted
    val batch = Seq(c1, c2)
      .map(chunk => graft.operators.PersistedIndex
        .searchTextIndexBm25Batch(spark, dir, chunk.toDF("query_id", "term"))
        .as[(Long, Long, Long, Long, Double)].collect().toSeq)
      .reduce(_ ++ _).sorted
    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }

  test("a replayed micro-batch overwrites its own ingest directory — no duplicate postings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tidx-replay").toString
    PersistedIndex.buildTextIndex(spark, corpus.filter($"doc_id" % 2 === 0),
      dir)
    val delta = corpus.filter($"doc_id" % 2 === 1)
    PersistedIndex.appendTextIndexBatch(delta, dir, 0L)
    val first = searchRows(dir)
    // the failure-retry: same batch id lands again
    PersistedIndex.appendTextIndexBatch(delta, dir, 0L)
    searchRows(dir) shouldBe first
    // a SECOND batch under a new id does add its postings: df for a
    // shared term re-merges across ingest directories
    PersistedIndex.appendTextIndexBatch(delta
      .withColumn("doc_id", col("doc_id") + 1000000L), dir, 1L)
    searchRows(dir) should not be first
  }

  test("a batch replayed AFTER a compaction absorbed it is a no-op — " +
    "the folded ledger survives compaction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tidx-rc").toString
    PersistedIndex.buildTextIndex(spark, corpus.filter($"doc_id" % 2 === 0),
      dir)
    val delta = corpus.filter($"doc_id" % 2 === 1)
    PersistedIndex.appendTextIndexBatch(delta, dir, 5L)
    val first = searchRows(dir)
    // the race the folded ledger closes: compaction folds b5 into c<v>
    // BEFORE the stream checkpoints batch 5; the crash-replay then
    // re-lands b5. A liveness-based guard would re-commit it NEXT TO the
    // compacted copy and double those docs' term frequencies.
    PersistedIndex.compactTextIndexInPlace(spark, dir)
    searchRows(dir) shouldBe first
    PersistedIndex.appendTextIndexBatch(delta, dir, 5L) // the replay
    searchRows(dir) shouldBe first
    // and the replay committed no new manifest version
    val v = graft.operators.StoreVersioning
      .latestVersion(spark, s"$dir/manifest")
    PersistedIndex.appendTextIndexBatch(delta, dir, 5L)
    graft.operators.StoreVersioning
      .latestVersion(spark, s"$dir/manifest") shouldBe v
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
