package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{PersistedIndex, Retrieval, RetrievalProgram,
  RetrievalStore, StoreVersioning}

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

  test("the batched panel probe's query 1 equals the single serving " +
    "probe row-for-row (the batch replay cannot drift)") {
    val batch1 = RetrievalStore
      .probeRetrievalStoreBatch(spark, storeDir)
      .filter(col("query_id") === 1L)
      .select("rank", "chunk_id", "doc_id", "chunk_idx",
        "text_rank", "vec_rank", "rrf_score")
      .collect().map(_.toSeq).toSeq
    val single = RetrievalStore.probeRetrievalStore(spark, storeDir)
      .collect().map(_.toSeq).toSeq
    batch1 should not be empty
    batch1 shouldBe single
  }

  test("the batched probe reads NO corpus text; the panel's term UNION " +
    "reaches the postings scan's PushedFilters") {
    val panel = Seq(1L -> Seq("spark", "join"), 2L -> Seq("hash"))
    val tfPlan = RetrievalStore
      .probeTfBatch(spark, storeDir, panel)
      .queryExecution.explainString(FormattedMode)
    tfPlan should not include "documents.parquet"
    val postings = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(tfPlan).toList.filter(_.contains("/postings"))
    postings should not be empty
    postings.foreach { b =>
      withClue(s"postings scan without the pushed union filter:\n$b\n") {
        b should include("In(term, ")
        b should include("spark")
        b should include("hash")
      }
    }
    val vecPlan = RetrievalStore
      .probeVectorScoredBatch(spark, storeDir,
        graft.operators.RetrievalProgram.StorePanel)
      .queryExecution.explainString(FormattedMode)
    vecPlan should not include "documents.parquet"
    RetrievalStore.probeRetrievalStoreBatch(spark, storeDir)
      .queryExecution.explainString(FormattedMode) should
      not include "documents.parquet"
  }

  test("every batched panel query returns rows and respects per-query " +
    "rank contiguity 1..k") {
    val rows = RetrievalStore.probeRetrievalStoreBatch(spark, storeDir)
      .collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.keySet shouldBe
      graft.operators.RetrievalProgram.StorePanel.map(_._1).toSet
    byQ.foreach { case (q, rs) =>
      withClue(s"query $q:") {
        rs.map(_.getAs[Long]("rank")).sorted.toSeq shouldBe
          (1L to rs.length.toLong)
        rs.length should be <= 10
        rs.length should be >= 1
      }
    }
  }

  private def scanBlocks(plan: String): List[String] =
    """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(plan).toList

  test("the filtered probe pushes the chunk-range predicate into BOTH " +
    "sides' parquet scans (postings AND vectors/norms)") {
    val tfPlan = RetrievalStore
      .probeTfFiltered(spark, storeDir, 40L, 240L)
      .queryExecution.explainString(FormattedMode)
    val postings = scanBlocks(tfPlan).filter(_.contains("/postings"))
    postings should not be empty
    postings.foreach { b =>
      withClue(s"postings scan without the pushed range:\n$b\n") {
        b should include("GreaterThanOrEqual(chunk_id,")
        b should include("LessThan(chunk_id,")
        b should include("In(term, ")
      }
    }
    val vecPlan = RetrievalStore
      .probeVectorScoredFiltered(spark, storeDir, 40L, 240L)
      .queryExecution.explainString(FormattedMode)
    val vecScans = scanBlocks(vecPlan)
      .filter(b => b.contains("/vectors") || b.contains("/norms"))
    vecScans should not be empty
    vecScans.foreach { b =>
      withClue(s"vector-side scan without the pushed range:\n$b\n") {
        b should include("GreaterThanOrEqual(chunk_id,")
        b should include("LessThan(chunk_id,")
      }
    }
    vecPlan should not include "documents.parquet"
    tfPlan should not include "documents.parquet"
  }

  test("filtered probe results lie inside the doc window; the vector " +
    "side's recall vs the EXACT filtered scan clears the floor") {
    val out = RetrievalStore
      .probeRetrievalStoreFiltered(spark, storeDir).collect()
    out should not be empty
    all(out.map(_.getAs[Long]("doc_id"))) should
      (be >= 40L and be < 240L)
    // exact filtered cosine: ALL in-range chunks, no cluster pruning
    val live = StoreVersioning
      .liveTokens(spark, s"$storeDir/manifest").getOrElse("seg", Seq.empty)
    val lo = 40L * 1024L
    val hi = 240L * 1024L
    val qSparse = Retrieval.QueryTerms.toDF("token")
      .select(
        graft.operators.TextPipeline.hashEmbedBucket(col("token"))
          .as("pos"),
        graft.operators.TextPipeline.hashEmbedSign(col("token"))
          .as("sgn"))
      .groupBy("pos").agg(sum(col("sgn")).as("qv"))
      .filter(col("qv") =!= 0L)
    val n2q = qSparse.agg(sum(col("qv") * col("qv"))).head.getLong(0)
    val vectors = spark.read.parquet(s"$storeDir/vectors")
      .filter(col("ingest").isInCollection(live))
      .filter(col("chunk_id") >= lo && col("chunk_id") < hi)
    val norms = spark.read.parquet(s"$storeDir/norms")
      .filter(col("ingest").isInCollection(live))
      .filter(col("chunk_id") >= lo && col("chunk_id") < hi)
    val dots = vectors.join(broadcast(qSparse), "pos")
      .groupBy("chunk_id")
      .agg(sum(col("v") * col("qv")).cast("long").as("d"))
    val kEach = 20
    val exact = norms.join(dots, Seq("chunk_id"), "left")
      .select(col("chunk_id"),
        (coalesce(col("d"), lit(0L)).cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(lit(n2q.toDouble))))
          .as("cosv"))
      .orderBy(col("cosv").desc, col("chunk_id")).limit(kEach)
      .collect().map(_.getAs[Long]("chunk_id")).toSet
    val approx = RetrievalStore
      .probeVectorScoredFiltered(spark, storeDir, 40L, 240L)
      .orderBy(col("cosv").desc, col("chunk_id")).limit(kEach)
      .collect().map(_.getAs[Long]("chunk_id")).toSet
    val recall = (approx intersect exact).size.toDouble / kEach
    withClue(s"recall=$recall approx=$approx exact=$exact") {
      recall should be >= 0.45
    }
  }

  test("an append carrying UPDATED text for a stored doc_id fails " +
    "loudly instead of being silently dropped as a replay") {
    storeDir // force build + first append
    val before =
      StoreVersioning.latestVersion(spark, s"$storeDir/manifest")
    val mutated = docs.filter(pmod(col("doc_id"), lit(100)) === 77)
      .withColumn("text", concat(col("text"), lit(" mutated tail")))
    val e = intercept[IllegalArgumentException] {
      RetrievalStore.appendToRetrievalStore(spark, mutated, storeDir)
    }
    e.getMessage should include("DIFFERENT content")
    // nothing was committed — the store is untouched
    StoreVersioning.latestVersion(spark, s"$storeDir/manifest") shouldBe
      before
  }

  test("seedmeta records the frozen quantizer's training chunks — the " +
    "full corpus's first-NSeeds nonzero chunks (the session-store " +
    "seed/delta invariant)") {
    storeDir
    val seedChunks = spark.read.parquet(s"$storeDir/seedmeta")
      .orderBy("seed_idx").collect().map(_.getAs[Long]("chunk_id")).toSeq
    seedChunks should have size 4 // NSeeds
    // every seed doc sorts below the first delta doc (77), so the
    // residue build's seeds ARE the full-corpus program's seeds
    all(seedChunks.map(_ / 1024L)) should be < 77L
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

  test("forgetFromRetrievalStore equals a fresh build on the surviving " +
    "corpus (probe + full-content stats), rewrites ONLY the affected " +
    "segment, refuses seed docs, and re-forgetting is a no-op") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-rstore-forget").toString
    RetrievalStore.buildRetrievalStore(spark,
      docs.filter(col("doc_id") < 300), d)
    RetrievalStore.appendToRetrievalStore(spark,
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 400), d)
    val isDrop = col("doc_id") >= 120 && col("doc_id") < 140
    RetrievalStore.forgetFromRetrievalStore(spark,
      docs.filter(isDrop).select("doc_id"), d)
    // forget == recompute: fresh store on the surviving corpus
    val fresh = java.nio.file.Files
      .createTempDirectory("graft-rstore-forget-fresh").toString
    RetrievalStore.buildRetrievalStore(spark,
      docs.filter(col("doc_id") < 300 && !isDrop), fresh)
    RetrievalStore.appendToRetrievalStore(spark,
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 400), fresh)
    RetrievalStore.probeRetrievalStore(spark, d)
      .collect().map(_.toSeq).toSeq shouldBe
      RetrievalStore.probeRetrievalStore(spark, fresh)
        .collect().map(_.toSeq).toSeq
    // every artifact byte agrees (the storeStats full-content checksums)
    RetrievalStore.storeStats(spark, d)
      .collect().map(_.toSeq).toSeq shouldBe
      RetrievalStore.storeStats(spark, fresh)
        .collect().map(_.toSeq).toSeq
    // copy-on-write granularity: only the base segment (which held the
    // forgotten docs) was rewritten; the delta segment kept its token
    StoreVersioning.liveTokens(spark, s"$d/manifest")("seg")
      .toSet shouldBe Set("f3_base", "d2")
    // a frozen-quantizer seed doc cannot be forgotten
    val e = intercept[IllegalArgumentException] {
      RetrievalStore.forgetFromRetrievalStore(spark,
        docs.filter(col("doc_id") === 0L).select("doc_id"), d)
    }
    e.getMessage should include("seed")
    // idempotence: re-forgetting already-gone ids publishes no version
    val before = StoreVersioning.latestVersion(spark, s"$d/manifest")
    RetrievalStore.forgetFromRetrievalStore(spark,
      docs.filter(isDrop).select("doc_id"), d)
    StoreVersioning.latestVersion(spark, s"$d/manifest") shouldBe before
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
