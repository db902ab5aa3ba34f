package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{PersistedIndex, SimilarityPipeline, TextPipeline}

/** The build-once/probe-many contract: persisted indexes answer exactly
  * like their in-query twins, and the probe plans touch only the slices
  * the layout was designed to expose (DPP-pruned cluster partitions;
  * index tables instead of corpus text).
  */
class PersistedIndexSpec extends AnyFunSuite with Matchers with SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("persisted IVF probe returns exactly what the in-query kmeans probe returns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    PersistedIndex.buildIvfIndex(spark, sf, dir)
    val persisted = PersistedIndex.probeIvfIndex(spark, sf, dir)
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue,
        r.getAs[Number](3).doubleValue)).toSeq
    val inQuery = SimilarityPipeline.simTopKKmeans(spark, sf)
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue,
        r.getAs[Number](3).doubleValue)).toSeq
    persisted shouldBe inQuery
  }

  test("the IVF probe plan dynamically prunes unprobed cluster partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf2").toString
    PersistedIndex.buildIvfIndex(spark, sf, dir)
    val plan = PersistedIndex.probeIvfIndex(spark, sf, dir)
      .queryExecution.explainString(FormattedMode)
    // the vectors scan must carry a runtime partition filter on `cluster`
    // fed by the broadcast probe — that is what skips (k - nprobe)/k of
    // the corpus directories at 100 TB
    plan should include("dynamicpruning")
    plan should include("PartitionFilters")
  }

  test("q8 probe recalls the float probe's answer with exact final sims") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfq8").toString
    PersistedIndex.buildIvfIndex(spark, sf, dir)
    val float = PersistedIndex.probeIvfIndex(spark, sf, dir).collect()
    val q8 = PersistedIndex.probeIvfIndexQ8(spark, sf, dir).collect()
    val floatIds = float.map(_.getAs[Long]("vec_id")).toSet
    val q8Ids = q8.map(_.getAs[Long]("vec_id")).toSet
    // same probed clusters + 4x over-retrieval before the exact rerank
    (q8Ids.intersect(floatIds).size.toDouble / floatIds.size) should be >= 0.9
    // stage 2 rescored with the same float cosine: shared ids agree exactly
    val floatSims = float
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim")).toMap
    q8.filter(r => floatSims.contains(r.getAs[Long]("vec_id")))
      .foreach(r => r.getAs[Double]("sim") shouldBe
        floatSims(r.getAs[Long]("vec_id")))
  }

  test("the q8 probe's stage-1 scan reads only the int8 codes, never the float vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfq8p").toString
    PersistedIndex.buildIvfIndex(spark, sf, dir)
    val plan = PersistedIndex.probeIvfIndexQ8(spark, sf, dir)
      .queryExecution.explainString(FormattedMode)
    // two scans of vectors/: stage 1 must project qv WITHOUT v (that is
    // the 8x bandwidth claim), stage 2 reads v for the candidates only
    val vectorScans = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(s => s.contains("qv") || s.contains("v:"))
      .toList
    def fields(s: String): Set[String] =
      s.split(",").map(_.takeWhile(_ != ':')).toSet
    withClue(s"no qv-only scan in: $vectorScans ") {
      vectorScans.exists(s =>
        fields(s).contains("qv") && !fields(s).contains("v")) shouldBe true
    }
    // and the partition pruning survives the q8 path
    plan should include("dynamicpruning")
  }

  test("every vectors scan in the q8 probe is cluster-pruned, stage 2 included") {
    // the round-5 finding: stage 2 joined candidates against the full
    // vectors read on vec_id only, scanning every cluster's float column.
    // Now BOTH scans go through the broadcast cluster join, so both carry
    // the runtime partition filter.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfq8s2").toString
    PersistedIndex.buildIvfIndex(spark, sf, dir)
    val plan = PersistedIndex.probeIvfIndexQ8(spark, sf, dir)
      .queryExecution.explainString(FormattedMode)
    val scanBlocks = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(plan).toList
    val vectorScans = scanBlocks.filter(_.contains("/vectors"))
    vectorScans.length should be >= 2 // stage 1 (qv) and stage 2 (v)
    vectorScans.foreach { b =>
      withClue(s"unpruned vectors scan:\n$b\n") {
        b should include("dynamicpruning")
      }
    }
  }

  test("appending an embedding delta makes it probe-visible without a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp").toString
    PersistedIndex.buildIvfIndex(spark, sf, dir)
    val before = spark.read.parquet(s"$dir/vectors").count()
    // the delta: a clone of the query vector under a fresh id — after
    // append it must be assigned to the query's nearest cluster and come
    // back at rank 1 with cosine exactly 1
    val delta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" === 0)
      .select(lit(9999L).as("vec_id"), $"label", $"embedding")
    PersistedIndex.appendToIvfIndex(spark, delta, dir)
    spark.read.parquet(s"$dir/vectors").count() shouldBe before + 1
    val top = PersistedIndex.probeIvfIndex(spark, sf, dir).collect().head
    top.getAs[Long]("vec_id") shouldBe 9999L
    top.getAs[Double]("sim") shouldBe 1.0
  }

  test("IVF index: a reader pinned before an append answers identically " +
    "after it; replayed appends are no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfv").toString
    PersistedIndex.buildIvfIndex(spark, sf, dir)
    val pinned = PersistedIndex.probeIvfIndex(spark, sf, dir, version = 1L)
    val before = pinned.collect().toSeq.map(_.toSeq)
    val delta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" === 0)
      .select(lit(99999L).as("vec_id"), $"label", $"embedding")
    PersistedIndex.appendToIvfIndex(spark, delta, dir) // -> version 2
    // pinned version-1 reader: byte-identical, fold invisible
    pinned.collect().toSeq.map(_.toSeq) shouldBe before
    // latest sees the appended clone of the query vector at rank 1
    val latest = PersistedIndex.probeIvfIndex(spark, sf, dir).collect()
    latest.head.getAs[Long]("vec_id") shouldBe 99999L
    // replay: same delta again folds to a no-op (stored-id anti-join)
    PersistedIndex.appendToIvfIndex(spark, delta, dir)
    graft.operators.StoreVersioning
      .latestVersion(spark, s"$dir/manifest") shouldBe 2L
    val n = spark.read.parquet(s"$dir/vectors")
    n.filter($"vec_id" === 99999L).count() shouldBe 1L
  }

  test("PQ store: decode-probe equals the in-query pqTopK; append folds " +
    "under frozen codebooks; pinned reader survives the fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    PersistedIndex.buildPqIndex(spark, sf, dir)
    // the stored-codes decode probe equals the re-encoding in-query PQ
    PersistedIndex.probePqIndex(spark, dir)
      .collect().toSeq.map(_.toSeq) shouldBe
      SimilarityPipeline.pqTopK(spark, sf).collect().toSeq.map(_.toSeq)
    // pin version 1, fold a clone of the query vector, re-read pinned
    val pinned = PersistedIndex.probePqIndex(spark, dir, version = 1L)
    val before = pinned.collect().toSeq.map(_.toSeq)
    val delta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" === 0)
      .select(lit(88888L).as("vec_id"), $"label", $"embedding")
    PersistedIndex.appendToPqIndex(spark, delta, dir) // -> version 2
    pinned.collect().toSeq.map(_.toSeq) shouldBe before
    // latest: the clone reconstructs AND reranks to rank 1, sim 1.0
    val top = PersistedIndex.probePqIndex(spark, dir).collect().head
    top.getAs[Long]("vec_id") shouldBe 88888L
    top.getAs[Double]("sim") shouldBe 1.0
    // replay is a no-op
    PersistedIndex.appendToPqIndex(spark, delta, dir)
    graft.operators.StoreVersioning
      .latestVersion(spark, s"$dir/manifest") shouldBe 2L
  }

  test("PQ store stage 1 scans only the codes column, never the floats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pqp").toString
    PersistedIndex.buildPqIndex(spark, sf, dir)
    val plan = PersistedIndex.probePqIndex(spark, dir)
      .queryExecution.explainString(FormattedMode)
    // two codes/ scans: stage 1 must project codes WITHOUT v (that is
    // the compression's bandwidth claim), stage 2 reads v for candidates
    val scans = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
      .map(_.group(1)).filter(s => s.contains("codes") || s.contains("v:"))
      .toList
    def fields(s: String): Set[String] =
      s.split(",").map(_.takeWhile(_ != ':')).toSet
    withClue(s"no codes-only scan in: $scans ") {
      scans.exists(s =>
        fields(s).contains("codes") && !fields(s).contains("v")) shouldBe true
    }
  }

  test("persisted eval bloom probe equals the in-query bloom decontamination") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    // the in-query operator's split: odd doc_ids are eval, even are train
    val evalDf = docsDf.filter($"doc_id" % 2 === 1)
    val train = docsDf.filter($"doc_id" % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-ebloom").toString
    PersistedIndex.buildEvalBloom(spark, evalDf, dir)
    val probed = PersistedIndex.probeEvalBloom(spark, train, dir)
      .collect().toSeq
    val inQuery = TextPipeline.decontaminateBloom(spark, sf)
      .collect().toSeq
    probed shouldBe inQuery
  }

  test("streaming decontamination over the persisted bloom flags exactly the batch answer") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val evalDf = docsDf.filter($"doc_id" % 2 === 1)
    val train = docsDf.filter($"doc_id" % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-sbloom").toString
    PersistedIndex.buildEvalBloom(spark, evalDf, dir)

    // batch expectation, computed independently: per TRAIN doc, distinct
    // fingerprints shared with the eval set
    graft.expressions.VectorExpressions.register(spark)
    val winnow = (c: org.apache.spark.sql.Column) =>
      graft.expressions.VectorExpressions.winnowNative(c)
    val fps = docsDf.select($"doc_id",
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array_distinct(winnow($"text")))
        .as("fingerprint"))
    val evalSet = fps.filter($"doc_id" % 2 === 1)
      .select($"fingerprint").distinct()
    val expected = fps.filter($"doc_id" % 2 === 0)
      .join(evalSet, "fingerprint")
      .groupBy($"doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.decontaminateStream(spark,
        input.toDF().toDF("doc_id", "text"), dir)
      .writeStream.format("memory").queryName("deconta_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-deconta").toString)
      .outputMode("update").start()
    try {
      input.addData(train.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("deconta_stream")
      .as[(Long, Long)].collect().map(t => t._1 -> t._2).toMap
    streamed shouldBe expected
    expected should not be empty // the corpus genuinely overlaps
  }

  test("the eval-bloom probe plan never scans eval text") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ebloom2").toString
    PersistedIndex.buildEvalBloom(spark, docsDf.filter($"doc_id" % 2 === 1),
      dir)
    val probe = PersistedIndex.probeEvalBloom(spark,
      docsDf.filter($"doc_id" % 2 === 0), dir)
    val plan = probe.queryExecution.explainString(FormattedMode)
    // eval side = the persisted fingerprint table; only the TRAIN side
    // winnows text, and the bloom blob rides as a literal, not a scan
    plan should include("/fingerprints")
    plan should not include "/bloom"
    val docScans = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(plan).toList.filter(_.contains("documents.parquet"))
    docScans.length shouldBe 1 // train only; eval text never read
    // and the prefilter really is the codegen'd bloom might_contain
    plan should include("might_contain")
  }

  test("delta-vs-persisted-index dedup equals the in-query incremental dedup") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docsDf.filter($"doc_id" % 5 =!= 0)
    val delta = docsDf.filter($"doc_id" % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-didx").toString
    PersistedIndex.buildDedupIndex(spark, corpus, dir)
    val persisted = PersistedIndex.dedupDeltaAgainstIndex(spark, delta, dir)
      .collect().toSeq
    val inQuery = TextPipeline.dedupIncrementalFrom(spark, corpus, delta)
      .collect().toSeq
    persisted shouldBe inQuery
  }

  test("dedup + shingle indexes: a reader pinned before a fold answers " +
    "identically after it (segment-manifest versions)") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docsDf.filter($"doc_id" % 5 =!= 0)
    val day1 = docsDf.filter($"doc_id" % 5 === 0 && $"doc_id" % 10 === 0)
    val probe = docsDf.filter($"doc_id" % 10 === 5)

    val ddir = java.nio.file.Files.createTempDirectory("graft-didxv").toString
    PersistedIndex.buildDedupIndex(spark, corpus, ddir)
    val pinnedDedup = PersistedIndex.dedupDeltaAgainstIndex(
      spark, probe, ddir, version = 1L)
    val dedupBefore = pinnedDedup.collect().toSeq
    PersistedIndex.appendToDedupIndex(spark, day1, ddir) // -> version 2
    pinnedDedup.collect().toSeq shouldBe dedupBefore
    // and the latest version DOES see the fold (same text re-probed)
    PersistedIndex.dedupDeltaAgainstIndex(spark,
        day1.select($"doc_id" + 100000L as "doc_id", $"text"), ddir)
      .collect().foreach(_.getBoolean(1) shouldBe true) // dup_exact now

    val sdir = java.nio.file.Files.createTempDirectory("graft-sidxv").toString
    PersistedIndex.buildShingleIndex(spark, corpus, sdir)
    val pinnedOverlap = PersistedIndex.overlapDeltaAgainstIndex(
      spark, probe, sdir, version = 1L)
    val overlapBefore = pinnedOverlap.collect().toSeq
    PersistedIndex.appendToShingleIndex(spark, day1, sdir) // -> version 2
    // the pinned reader's bloom AND hash segments are version-1's —
    // byte-identical re-read while the fold's bloom lives in its own
    // bloom/token dir (the old in-place overwrite window is gone)
    pinnedOverlap.collect().toSeq shouldBe overlapBefore
    // latest sees day-1 text as fully contaminated
    val d1probe = PersistedIndex.overlapDeltaAgainstIndex(spark,
      day1.select($"doc_id" + 100000L as "doc_id", $"text"), sdir).collect()
    d1probe should not be empty
    d1probe.foreach(_.getAs[Boolean]("contaminated") shouldBe true)
  }

  test("appending day 1 to the index makes day 2 see day-1 documents as duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-didx3").toString
    val corpus = Seq((1L, (101 to 140).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val day1 = Seq((10L, (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val day2 = Seq((20L, (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text") // same text day-1 ingested
    PersistedIndex.buildDedupIndex(spark, corpus, dir)
    // day 1: novel against the original corpus
    val d1 = PersistedIndex.dedupDeltaAgainstIndex(spark, day1, dir).collect()
    d1.map(_.getBoolean(3)).toSeq shouldBe Seq(true)
    PersistedIndex.appendToDedupIndex(spark, day1, dir)
    // day 2: the identical text is now an exact+near duplicate
    val d2 = PersistedIndex.dedupDeltaAgainstIndex(spark, day2, dir).collect()
    d2.length shouldBe 1
    d2(0).getBoolean(1) shouldBe true // dup_exact
    d2(0).getLong(2) should be >= 1L // n_near
    d2(0).getBoolean(3) shouldBe false // not novel
    // replaying day 1's fold is a no-op: no new version, n_near stable
    val v = graft.operators.StoreVersioning
      .latestVersion(spark, s"$dir/manifest")
    PersistedIndex.appendToDedupIndex(spark, day1, dir)
    graft.operators.StoreVersioning
      .latestVersion(spark, s"$dir/manifest") shouldBe v
    PersistedIndex.dedupDeltaAgainstIndex(spark, day2, dir)
      .collect()(0).getLong(2) shouldBe d2(0).getLong(2)
  }

  test("streaming embeddings are cluster-assigned identically to the batch kmeans assignment") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (cents, assigned) = SimilarityPipeline.kmeansModel(spark, sf, k = 8,
      iters = 2)
    val batchRows = assigned.select("vec_id", "v", "cluster", "d2")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getSeq[Double](1),
        r.getLong(2), r.getDouble(3)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    input.addData(batchRows.map(r => (r._1, r._2)).toSeq)
    val q = graft.streaming.StreamingSimilarity.assignStream(
      input.toDF().toDF("vec_id", "v"), cents)
      .select($"vec_id", $"cluster", $"d2")
      .writeStream.format("memory").queryName("assign_twin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-assign").toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("assign_twin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    streamed shouldBe batchRows.map(r => (r._1, r._3, r._4)).sortBy(_._1).toSeq
  }


  test("IVF+PQ store: pruned decode-probe equals the in-query composite; " +
    "pinned reader survives the fold; both code scans are cluster-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    PersistedIndex.buildIvfPqIndex(spark, sf, dir)
    val inQuery = SimilarityPipeline.simTopKIvfPq(spark, sf).collect()
    PersistedIndex.probeIvfPqIndex(spark, sf, dir)
      .collect().toSeq.map(_.toSeq) shouldBe inQuery.toSeq.map(_.toSeq)

    // plan shape: stage 1 reads codes WITHOUT the float column, and every
    // codes scan carries the runtime cluster partition filter (the
    // probeIvfIndexQ8 discipline applied to PQ payloads)
    val plan = PersistedIndex.probeIvfPqIndex(spark, sf, dir)
      .queryExecution.explainString(FormattedMode)
    val scanBlocks = """\(\d+\) Scan parquet[\s\S]*?ReadSchema: [^\n]*""".r
      .findAllIn(plan).toList
    val codeScans = scanBlocks.filter(_.contains("/codes"))
    codeScans.length should be >= 2 // stage 1 (codes) and stage 2 (v)
    def fields(b: String): Set[String] =
      "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(b)
        .map(_.group(1).split(",").map(_.trim.split(":")(0)).toSet)
        .getOrElse(Set.empty)
    withClue(s"no codes-only stage-1 scan in:\n${codeScans.mkString("\n")}\n") {
      codeScans.exists(b =>
        fields(b).contains("codes") && !fields(b).contains("v")) shouldBe true
    }
    codeScans.foreach { b =>
      withClue(s"unpruned codes scan:\n$b\n") {
        b should include("dynamicpruning")
      }
    }

    // pin version 1, fold a clone of the query vector INTO a probed
    // cluster (the top result's label), re-read pinned byte-identically
    val pinned = PersistedIndex.probeIvfPqIndex(spark, sf, dir, version = 1L)
    val before = pinned.collect().toSeq.map(_.toSeq)
    val topLabel = inQuery.head.getAs[Int]("label")
    val delta = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" === 0)
      .select(lit(77777L).as("vec_id"), lit(topLabel).as("label"),
        $"embedding")
    PersistedIndex.appendToIvfPqIndex(spark, delta, dir) // -> version 2
    pinned.collect().toSeq.map(_.toSeq) shouldBe before
    // latest: the clone decodes AND reranks to rank 1, exact sim 1.0
    val top = PersistedIndex.probeIvfPqIndex(spark, sf, dir).collect().head
    top.getAs[Long]("vec_id") shouldBe 77777L
    // replay: the same delta folds to a no-op
    PersistedIndex.appendToIvfPqIndex(spark, delta, dir)
    graft.operators.StoreVersioning
      .latestVersion(spark, s"$dir/manifest") shouldBe 2L
  }

  test("the delta probe plan never touches corpus text — only the day's shard and the index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-didx2").toString
    val sep = java.nio.file.Files.createTempDirectory("graft-didx2-src").toString
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    docsDf.filter($"doc_id" % 5 === 0).write.parquet(s"$sep/delta")
    PersistedIndex.buildDedupIndex(spark,
      docsDf.filter($"doc_id" % 5 =!= 0), dir)
    val plan = PersistedIndex.dedupDeltaAgainstIndex(spark,
      spark.read.parquet(s"$sep/delta"), dir)
      .queryExecution.explainString(FormattedMode)
    val locations = plan.linesIterator.filter(_.contains("Location"))
      .mkString("\n")
    withClue(locations) {
      // every scan resolves to the delta shard or an index table; the
      // corpus documents table appears nowhere
      locations should not include "documents.parquet"
      locations should include("delta")
      locations should include("bands")
      locations should include("sets")
      locations should include("digests")
    }
  }

  test("shingle-index probe equals the in-query overlap report") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shidx").toString
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    // the in-query operator's split convention: train = even doc_id
    PersistedIndex.buildShingleIndex(spark,
      corpus.filter($"doc_id" % 2 === 0), dir)
    val probed = PersistedIndex.overlapDeltaAgainstIndex(spark,
        corpus.filter($"doc_id" % 2 === 1), dir)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    val inQuery = graft.operators.SubstringDedup.overlapReportFrom(
        corpus, graft.operators.SubstringDedup.SpanLen)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    probed shouldBe inQuery
    probed.exists(_._3 > 0) shouldBe true // hits exist — join exercised
  }

  test("appending a train delta to the shingle index makes it probe-visible; bloom refreshed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shidx2").toString
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val train = corpus.filter($"doc_id" % 2 === 0)
    PersistedIndex.buildShingleIndex(spark,
      train.filter($"doc_id" % 4 === 0), dir)
    PersistedIndex.appendToShingleIndex(spark,
      train.filter($"doc_id" % 4 =!= 0), dir)
    val appended = PersistedIndex.overlapDeltaAgainstIndex(spark,
        corpus.filter($"doc_id" % 2 === 1), dir)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    val full = java.nio.file.Files.createTempDirectory("graft-shidx3").toString
    PersistedIndex.buildShingleIndex(spark, train, full)
    val oneShot = PersistedIndex.overlapDeltaAgainstIndex(spark,
        corpus.filter($"doc_id" % 2 === 1), full)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    appended shouldBe oneShot
    // the appended hash set is deduplicated, not just concatenated
    spark.read.parquet(s"$dir/hashes").count() shouldBe
      spark.read.parquet(s"$full/hashes").count()
  }

  test("the shingle probe plan never scans train text — only the delta and the index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shidx4").toString
    val sep = java.nio.file.Files.createTempDirectory("graft-shidx4-src").toString
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    corpus.filter($"doc_id" % 2 === 1).write.parquet(s"$sep/delta")
    PersistedIndex.buildShingleIndex(spark,
      corpus.filter($"doc_id" % 2 === 0), dir)
    val plan = PersistedIndex.overlapDeltaAgainstIndex(spark,
        spark.read.parquet(s"$sep/delta"), dir)
      .queryExecution.explainString(FormattedMode)
    val locations = plan.linesIterator.filter(_.contains("Location"))
      .mkString("\n")
    withClue(locations) {
      locations should not include "documents.parquet"
      locations should include("delta")
      locations should include("hashes")
    }
    // the bloom prefilter sits in the plan (the shuffle-killing stage);
    // the registered builder resolves to Spark's BloomFilterMightContain,
    // which the formatted plan prints as might_contain(<literal bytes>)
    plan should include("might_contain")
  }

  test("text index: build+append search equals the in-query indexTopK on the full corpus") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tidx").toString
    PersistedIndex.buildTextIndex(spark, corpus.filter($"doc_id" % 2 === 0), dir)
    PersistedIndex.appendToTextIndex(spark, corpus.filter($"doc_id" % 2 === 1), dir)
    val terms = graft.operators.Retrieval.QueryTerms
    val fromIndex = PersistedIndex.searchTextIndex(spark, dir, terms)
      .as[(Long, Long, Double)].collect().toSeq
    val inQuery = graft.operators.Retrieval
      .indexTopKFrom(spark, corpus, terms, 10)
      .as[(Long, Long, Double)].collect().toSeq
    fromIndex shouldBe inQuery
    fromIndex should have length 10
  }

  test("text index BM25 search equals the in-query bm25TopK and never scans corpus text") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tbm25").toString
    PersistedIndex.buildTextIndex(spark, corpus.filter($"doc_id" % 2 === 0), dir)
    PersistedIndex.appendToTextIndex(spark, corpus.filter($"doc_id" % 2 === 1), dir)
    val terms = graft.operators.Retrieval.QueryTerms
    val search = PersistedIndex.searchTextIndexBm25(spark, dir, terms)
    search.as[(Long, Long, Double)].collect().toSeq shouldBe
      graft.operators.Retrieval.bm25TopKFrom(spark, corpus, terms, 10)
        .as[(Long, Long, Double)].collect().toSeq
    // the scorer touches only index artifacts: postings (bucket-pruned),
    // doclens, meta — never the corpus parquet
    val locations = search.queryExecution.explainString(FormattedMode)
      .linesIterator.filter(_.contains("Location")).mkString("\n")
    withClue(locations) {
      locations should not include "documents.parquet"
      locations should include("postings")
      locations should include("doclens")
    }
  }

  test("compaction merges delta postings into one ingest with identical search answers") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val src = java.nio.file.Files.createTempDirectory("graft-tcsrc").toString
    // three ingest generations: base + two deltas (the daily-append shape)
    PersistedIndex.buildTextIndex(spark, corpus.filter($"doc_id" % 3 === 0), src)
    PersistedIndex.appendToTextIndex(spark, corpus.filter($"doc_id" % 3 === 1), src)
    PersistedIndex.appendToTextIndex(spark, corpus.filter($"doc_id" % 3 === 2), src)
    val terms = graft.operators.Retrieval.QueryTerms
    val before = PersistedIndex.searchTextIndexBm25(spark, src, terms)
      .as[(Long, Long, Double)].collect().toSeq

    val dst = java.nio.file.Files.createTempDirectory("graft-tcdst").toString
    PersistedIndex.compactTextIndex(spark, src, dst)
    val after = PersistedIndex.searchTextIndexBm25(spark, dst, terms)
      .as[(Long, Long, Double)].collect().toSeq
    after shouldBe before

    // row economics: a term's (term, shard) rows collapse across ingests
    val rowsBefore = spark.read.parquet(s"$src/postings").count()
    val rowsAfter = spark.read.parquet(s"$dst/postings").count()
    rowsAfter should be < rowsBefore
    // exactly one ingest generation remains
    spark.read.parquet(s"$dst/postings")
      .select($"ingest").distinct().collect().map(_.getString(0)) shouldBe
      Array("base")
    // TF-IDF search agrees too (df re-merge == compacted df)
    PersistedIndex.searchTextIndex(spark, dst, terms)
      .as[(Long, Long, Double)].collect().toSeq shouldBe
      PersistedIndex.searchTextIndex(spark, src, terms)
        .as[(Long, Long, Double)].collect().toSeq
  }

  test("tombstone deletes hide docs at search; compaction equals a fresh build on survivors") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val src = java.nio.file.Files.createTempDirectory("graft-tdel").toString
    PersistedIndex.buildTextIndex(spark, corpus.filter($"doc_id" % 2 === 0), src)
    PersistedIndex.appendToTextIndex(spark, corpus.filter($"doc_id" % 2 === 1), src)
    val terms = graft.operators.Retrieval.QueryTerms
    val before = PersistedIndex.searchTextIndexBm25(spark, src, terms)
      .as[(Long, Long, Double)].collect().toSeq
    // delete the top-2 hits (they must vanish) + one absent id (no-op)
    val dead = before.take(2).map(_._1)
    PersistedIndex.deleteFromTextIndex(spark,
      (dead :+ 999999L).toDF("doc_id"), src)
    val after = PersistedIndex.searchTextIndexBm25(spark, src, terms)
      .as[(Long, Long, Double)].collect().toSeq
    after.map(_._1).toSet.intersect(dead.toSet) shouldBe empty
    // stale-stats contract: surviving docs still rank (k results remain)
    after should have length before.length
    // compaction physically drops them AND recomputes stats: the result
    // equals a FRESH build on the surviving corpus, scores included
    val dst = java.nio.file.Files.createTempDirectory("graft-tdel2").toString
    PersistedIndex.compactTextIndex(spark, src, dst)
    val fresh = java.nio.file.Files.createTempDirectory("graft-tdel3").toString
    PersistedIndex.buildTextIndex(spark,
      corpus.filter(!$"doc_id".isin(dead: _*)), fresh)
    PersistedIndex.searchTextIndexBm25(spark, dst, terms)
      .as[(Long, Long, Double)].collect().toSeq shouldBe
      PersistedIndex.searchTextIndexBm25(spark, fresh, terms)
        .as[(Long, Long, Double)].collect().toSeq
    // and the physical rows are gone, not merely masked
    spark.read.parquet(s"$dst/doclens")
      .filter($"doc_id".isin(dead: _*)).count() shouldBe 0L
  }

  test("text index: a reader pinned before append/compaction answers " +
    "identically after them; gc keeps surviving versions whole") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val terms = graft.operators.Retrieval.QueryTerms
    val dir = java.nio.file.Files.createTempDirectory("graft-tidxv").toString
    PersistedIndex.buildTextIndex(spark, corpus.filter($"doc_id" % 2 === 0), dir)
    val pinned = PersistedIndex.searchTextIndexBm25(spark, dir, terms,
      version = 1L)
    val before = pinned.collect().toSeq.map(_.toSeq)

    PersistedIndex.appendToTextIndex(spark,
      corpus.filter($"doc_id" % 2 === 1), dir) // -> version 2
    // the pinned version-1 reader re-executes byte-identically
    pinned.collect().toSeq.map(_.toSeq) shouldBe before
    val latest = PersistedIndex.searchTextIndexBm25(spark, dir, terms)
      .collect().toSeq.map(_.toSeq)
    latest should not be before

    // in-place compaction publishes a merged segment as version 3;
    // BOTH pinned readers keep answering, latest is unchanged by value
    PersistedIndex.compactTextIndexInPlace(spark, dir)
    pinned.collect().toSeq.map(_.toSeq) shouldBe before
    PersistedIndex.searchTextIndexBm25(spark, dir, terms)
      .collect().toSeq.map(_.toSeq) shouldBe latest
    graft.operators.StoreVersioning
      .latestVersion(spark, s"$dir/manifest") shouldBe 3L

    // retention + gc: drop all but the current version, collect
    // unreferenced segments — the survivor still answers identically
    graft.operators.StoreVersioning
      .pruneVersions(spark, s"$dir/manifest", keep = 1)
    PersistedIndex.gcTextIndexSegments(spark, dir)
    new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("ingest=")) shouldBe 1
    PersistedIndex.searchTextIndexBm25(spark, dir, terms)
      .collect().toSeq.map(_.toSeq) shouldBe latest
    // and a read of the pruned version now fails fast, not silently-empty
    an[IllegalArgumentException] should be thrownBy
      PersistedIndex.searchTextIndexBm25(spark, dir, terms, version = 1L)
  }

  test("text index search prunes to the query terms' buckets and never scans corpus text") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tidx2").toString
    PersistedIndex.buildTextIndex(spark, corpus, dir)
    val search = PersistedIndex.searchTextIndex(spark, dir,
      graft.operators.Retrieval.QueryTerms)
    val plan = search.queryExecution.explainString(FormattedMode)
    val locations = plan.linesIterator.filter(_.contains("Location"))
      .mkString("\n")
    withClue(locations) {
      locations should not include "documents.parquet"
      locations should include("postings")
    }
    // the bucket predicate reaches the scan as a partition filter (the
    // hash-of-literal folds to constants at planning)
    val partLine = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    withClue(partLine)(partLine should include("bucket"))
    // and executing it reads only the pruned buckets' files — at most
    // one bucket directory per query term, strictly fewer than the
    // index's full file count
    // AQE final plans hide scans behind QueryStageExec leaves; a plain
    // plan exposes the FileSourceScanExec (and its numFiles metric)
    val scan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val rerun = PersistedIndex.searchTextIndex(spark, dir,
        graft.operators.Retrieval.QueryTerms)
      rerun.collect()
      rerun.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.getOrElse("Location", "").contains("postings") => f
      }.head
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    val allFiles = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten
          .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(s"$dir/postings"))
        .count(_.getName.endsWith(".parquet"))
    }
    val filesRead = scan.metrics("numFiles").value
    filesRead should be > 0L
    filesRead should be < allFiles.toLong
  }

  test("LSH store: build + append probe equals the in-query simTopKLsh; " +
    "replay is a no-op; pinned version survives a fold") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    val isDelta = $"vec_id" % 100 === 77
    PersistedIndex.buildLshIndex(spark, e.filter(!isDelta), dir)
    // a reader PINNED to version 1 before the fold
    val pinned = PersistedIndex.probeLshIndex(spark, dir, version = 1L)
    val pinnedBefore = pinned.collect().toSeq.map(_.toSeq)

    PersistedIndex.appendToLshIndex(spark, e.filter(isDelta), dir)
    // append == recompute: the store's probe equals the in-query LSH
    // top-k over the whole corpus (same frozen normals, vec_id < 16 all
    // in the base build)
    val got = PersistedIndex.probeLshIndex(spark, dir)
      .collect().toSeq.map(_.toSeq)
    got shouldBe SimilarityPipeline.simTopKLsh(spark, sf)
      .collect().toSeq.map(_.toSeq)
    // the BATCH probe over the same store equals the in-query batch
    PersistedIndex.probeLshIndexBatch(spark, dir)
      .collect().toSeq.map(_.toSeq) shouldBe
      SimilarityPipeline.simTopKLshBatch(spark, sf)
        .collect().toSeq.map(_.toSeq)
    // the pinned reader re-executes byte-identically AFTER the fold —
    // segments are immutable, the fold only published a new version
    pinned.collect().toSeq.map(_.toSeq) shouldBe pinnedBefore
    // at-least-once replay: folding the same batch again changes nothing
    PersistedIndex.appendToLshIndex(spark, e.filter(isDelta), dir)
    PersistedIndex.probeLshIndex(spark, dir)
      .collect().toSeq.map(_.toSeq) shouldBe got
    graft.operators.StoreVersioning
      .latestVersion(spark, s"$dir/manifest") shouldBe 2L

    // compaction folds segments into one; answers unchanged; retention +
    // gc drop the unreferenced segments while the live one keeps serving
    PersistedIndex.compactLshIndex(spark, dir)
    PersistedIndex.probeLshIndex(spark, dir)
      .collect().toSeq.map(_.toSeq) shouldBe got
    graft.operators.StoreVersioning
      .pruneVersions(spark, s"$dir/manifest", keep = 1)
    PersistedIndex.gcLshSegments(spark, dir)
    new java.io.File(s"$dir/buckets").listFiles()
      .count(_.getName.startsWith("ingest=")) shouldBe 1
    PersistedIndex.probeLshIndex(spark, dir)
      .collect().toSeq.map(_.toSeq) shouldBe got
  }

  test("LSH store probe prunes to the query's (band, pfx) bucket " +
    "directories") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-lshp").toString
    PersistedIndex.buildLshIndex(spark, e, dir)
    val probe = PersistedIndex.probeLshIndex(spark, dir)
    val plan = probe.queryExecution.explainString(FormattedMode)
    // the collected (band, pfx) literals reach the buckets scan as
    // partition filters — the probe lists 4 of the 64 bucket dirs
    val partLines = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    withClue(partLines) {
      partLines should include("band")
      partLines should include("pfx")
    }
    // and the probe reads strictly fewer bucket files than the index holds
    val scan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val rerun = PersistedIndex.probeLshIndex(spark, dir)
      rerun.collect()
      rerun.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.getOrElse("Location", "").contains("buckets") => f
      }.head
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten
        .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    val allFiles = walk(new java.io.File(s"$dir/buckets"))
      .count(_.getName.endsWith(".parquet"))
    val filesRead = scan.metrics("numFiles").value
    filesRead should be > 0L
    filesRead should be < allFiles.toLong
  }

  test("streaming IVF+PQ ingest equals batch appends; compaction folds " +
    "live segments to one, probe unchanged") {
    implicit val sqlCtxIp: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val dirS = java.nio.file.Files.createTempDirectory("graft-ivfpqs").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-ivfpqb").toString
    PersistedIndex.buildIvfPqIndex(spark, sf, dirS)
    PersistedIndex.buildIvfPqIndex(spark, sf, dirB)
    def clones(lo: Long, hi: Long) = e.filter($"vec_id" >= lo && $"vec_id" < hi)
      .select(($"vec_id" + 50000L).as("vec_id"), $"label", $"embedding")
    PersistedIndex.appendToIvfPqIndex(spark, clones(0, 2), dirB)
    PersistedIndex.appendToIvfPqIndex(spark, clones(2, 4), dirB)
    val input = MemoryStream[(Long, Int, Seq[Float])]
    val q = PersistedIndex.ivfPqIngestStream(
        input.toDF().toDF("vec_id", "label", "embedding"), dirS,
        java.nio.file.Files.createTempDirectory("chk-ivfpq").toString)
      .start()
    try {
      input.addData(clones(0, 2).as[(Long, Int, Seq[Float])].collect().toSeq)
      q.processAllAvailable()
      input.addData(clones(2, 4).as[(Long, Int, Seq[Float])].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def content(dir: String) = spark.read.parquet(s"$dir/codes")
      .select($"vec_id", $"label", $"codes")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toSeq)).sortBy(_._1).toSeq
    content(dirS) shouldBe content(dirB)
    graft.operators.StoreVersioning
      .latestVersion(spark, s"$dirS/manifest") shouldBe 3L
    // compaction: one live segment, probe byte-identical, old segments
    // untouched on disk (gc is the separate retention pass)
    val before = PersistedIndex.probeIvfPqIndex(spark, sf, dirS)
      .collect().toSeq.map(_.toSeq)
    PersistedIndex.compactIvfPqIndex(spark, dirS)
    graft.operators.StoreVersioning
      .liveTokens(spark, s"$dirS/manifest")("seg") shouldBe Seq("c4")
    PersistedIndex.probeIvfPqIndex(spark, sf, dirS)
      .collect().toSeq.map(_.toSeq) shouldBe before
  }

  test("streaming LSH ingest equals the batch fold") {
    implicit val sqlCtx2: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val isDelta = $"vec_id" % 100 === 77
    val dir = java.nio.file.Files.createTempDirectory("graft-lshs").toString
    PersistedIndex.buildLshIndex(spark, e.filter(!isDelta), dir)
    val input = MemoryStream[(Long, Int, Seq[Float])]
    val q = PersistedIndex.lshIndexIngestStream(
        input.toDF().toDF("vec_id", "label", "embedding"), dir,
        java.nio.file.Files.createTempDirectory("chk-lsh").toString)
      .start()
    try {
      input.addData(e.filter(isDelta)
        .select($"vec_id", $"label", $"embedding")
        .as[(Long, Int, Seq[Float])].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    PersistedIndex.probeLshIndex(spark, dir)
      .collect().toSeq.map(_.toSeq) shouldBe
      SimilarityPipeline.simTopKLsh(spark, sf).collect().toSeq.map(_.toSeq)
  }

  test("serving-path LSH probe: an external query id colliding with a " +
    "corpus id does not mask that corpus vector") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-lshc").toString
    PersistedIndex.buildLshIndex(spark, e, dir)
    // a query frame from an EXTERNAL id space whose id happens to equal
    // corpus vec 7, carrying vec 7's own embedding: the true top-1 IS
    // corpus vector 7 (cosine 1.0) — a self-exclusion keyed on the raw
    // id would silently drop it
    val queries = e.filter(col("vec_id") === 7L)
    val out = PersistedIndex.probeLshBatchFrame(spark, dir, queries)
      .collect()
    out.head.getAs[Long]("q_id") shouldBe 7L
    out.head.getAs[Long]("rank") shouldBe 1L
    out.head.getAs[Long]("vec_id") shouldBe 7L
    out.head.getAs[Double]("sim") shouldBe 1.0
  }

  test("streaming LSH query probe answers each batch like the static " +
    "batch probe") {
    implicit val sqlCtx3: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-lshq").toString
    PersistedIndex.buildLshIndex(spark, e, dir)
    val queries = e.filter($"vec_id" < 4)
      .select($"vec_id", $"label", $"embedding")
    val expected = PersistedIndex.probeLshBatchFrame(spark, dir, queries)
      .collect().toSeq.map(_.toSeq)
    expected should not be empty
    val out = java.nio.file.Files.createTempDirectory("graft-lshq-out").toString
    val input = MemoryStream[(Long, Int, Seq[Float])]
    val q = PersistedIndex.lshQueryStream(
        input.toDF().toDF("vec_id", "label", "embedding"), dir, out,
        java.nio.file.Files.createTempDirectory("chk-lshq").toString)
      .start()
    try {
      input.addData(queries.as[(Long, Int, Seq[Float])].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(out)
      .select($"q_id", $"rank", $"vec_id", $"sim")
      .orderBy("q_id", "rank")
      .collect().toSeq.map(_.toSeq) shouldBe expected
  }

  test("streaming overlap gate emits exactly the batch probe's overlapping docs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sovl").toString
    PersistedIndex.buildShingleIndex(spark,
      corpus.filter($"doc_id" % 2 === 0), dir)
    // batch expectation: the persisted-index probe, overlapping docs only
    // (the gate's contract — a clean document emits nothing)
    val expected = PersistedIndex.overlapDeltaAgainstIndex(spark,
        corpus.filter($"doc_id" % 2 === 1), dir)
      .filter($"n_hit" > 0)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq.sorted
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.overlapGateStream(spark,
        input.toDF().toDF("doc_id", "text"), dir)
      .writeStream.format("memory").queryName("overlap_gate")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("chk-ovl").toString)
      .outputMode("update").start()
    try {
      input.addData(corpus.filter($"doc_id" % 2 === 1)
        .as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("overlap_gate")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq.sorted
    streamed shouldBe expected
    expected should not be empty
  }
}
