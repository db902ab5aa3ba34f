package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{PersistedIndex, TextPipeline}

/** Degenerate-input behavior of the curation/index operators: empty
  * corpora, empty deltas, and all-tied sort keys must produce empty (or
  * fully deterministic) results, never throw — the operators are documented
  * as usable with any corpus DataFrame. (The round-4 advice NPE on an empty
  * connected-components pair graph is the class of bug this suite fences.)
  */
class EdgeCaseSpec extends AnyFunSuite with Matchers with SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    spark.read.parquet(s"$sf/documents.parquet").schema)

  test("incremental dedup with an EMPTY delta returns an empty report") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val delta = emptyDocs.select($"doc_id", $"text")
    TextPipeline.dedupIncrementalFrom(spark, corpus, delta)
      .count() shouldBe 0L
  }

  test("delta-vs-persisted-index dedup with an EMPTY delta returns an empty report") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    val dir = java.nio.file.Files.createTempDirectory("graft-edge-didx").toString
    PersistedIndex.buildDedupIndex(spark, corpus, dir)
    PersistedIndex.dedupDeltaAgainstIndex(spark,
      emptyDocs.select($"doc_id", $"text"), dir).count() shouldBe 0L
  }

  test("round-6 curation operators are total on empty corpora and degenerate text") {
    // empty corpora: empty results, never a throw
    TextPipeline.repetitionStatsFrom(spark,
      emptyDocs.select($"doc_id", $"text")).count() shouldBe 0L
    TextPipeline.piiScrubFrom(spark,
      emptyDocs.select($"doc_id", $"text")).count() shouldBe 0L
    graft.operators.BpeTrainer.bpeMergesFrom(spark,
      emptyDocs.select($"text"), nMerges = 5).count() shouldBe 0L
    graft.operators.BpeTrainer.bpeEncodeRanked(spark,
      emptyDocs.select($"text"),
      graft.operators.BpeTrainer.FrozenMerges).count() shouldBe 0L

    // degenerate text: empty string and a single char survive every path
    val weird = Seq((1L, ""), (2L, "q")).toDF("doc_id", "text")
    val rep = TextPipeline.repetitionStatsFrom(spark, weird).collect()
    rep.length shouldBe 2
    rep.foreach(_.getBoolean(5) shouldBe false)
    val enc = graft.operators.BpeTrainer.bpeEncodeRanked(spark, weird,
      graft.operators.BpeTrainer.FrozenMerges).collect()
    enc.map(_.word).toSeq shouldBe Seq("q") // the empty word is filtered
  }

  test("connected components on an empty pair list returns the empty labeling") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    TextPipeline.connectedComponents(pairs).count() shouldBe 0L
  }

  test("dedup pipeline on an empty corpus returns no survivors and no pairs") {
    TextPipeline.dedupPipelineFrom(spark, emptyDocs).count() shouldBe 0L
  }

  test("curriculum breaks all-tied quality deterministically by doc_id") {
    // five identical documents: quality ties everywhere, so every tied row
    // lands in ONE value-range bucket and the within-bucket rank must fall
    // back to doc_id — exercising the operator's two-level path, not the
    // naive ntile
    val docs = (1L to 5L).map(i => (i, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val got = TextPipeline.curriculumFrom(spark, docs, nShards = 5)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("shard"))).toSeq
    got shouldBe Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L))
  }

  test("curriculum on an empty corpus is empty, not a division by zero") {
    TextPipeline.curriculumFrom(spark,
      emptyDocs.select($"doc_id", $"text")).count() shouldBe 0L
  }

  test("token budget larger than the corpus admits every document") {
    val got = TextPipeline.tokenBudgetSample(spark, sf, budget = Long.MaxValue)
    got.count() shouldBe
      spark.read.parquet(s"$sf/documents.parquet").count()
  }

  test("domain cap larger than any source admits every document with dense ranks") {
    val got = TextPipeline.domainCap(spark, sf, k = Int.MaxValue)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    got.count() shouldBe docs.count()
    // ranks are dense 1..n per source
    got.groupBy("source")
      .agg(org.apache.spark.sql.functions.max("rk").as("mx"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().foreach(r =>
        r.getAs[Long]("mx") shouldBe r.getAs[Long]("n"))
  }
}
