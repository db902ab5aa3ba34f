package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{RankerEval, Retrieval, StoreVersioning}

/** The production-ranker scorecard (round 15): the seed-B relevance
  * grade must be INDEPENDENT enough of every ranker's scoring signal to
  * detect a ranker regression — a deliberately degraded (score-reversed)
  * ranking MUST score strictly lower than the true direction — while
  * still tracking true relevance (non-empty relevant sets per query).
  */
class RankerEvalSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val corpus = graft.sources.Tables.documents(spark, sf)

  private lazy val qrels =
    RankerEval.qrelsFrom(spark, corpus, Retrieval.QueryPanel)

  test("every panel query has a non-empty grade >= 2 relevant set " +
    "(the grade tracks true relevance at this corpus)") {
    val nRel = qrels.filter(col("grade") >= 2L)
      .groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Retrieval.QueryPanel.foreach { case (qid, _) =>
      withClue(s"query $qid:") { nRel.getOrElse(qid, 0L) should be >= 1L }
    }
  }

  test("the grade detects a ranker regression: the degraded " +
    "(score-ascending) ranking scores strictly lower NDCG than the " +
    "true TF-IDF ranking on EVERY panel query") {
    val truth = Retrieval
      .indexTopKBatchFrom(spark, corpus, Retrieval.QueryPanel, 5)
      .select(lit("tfidf").as("ranker"), col("query_id"), col("rank"),
        col("doc_id"))
    val degraded = RankerEval
      .degradedRanking(spark, corpus, Retrieval.QueryPanel, 5)
    val sc = RankerEval
      .scoreRankings(truth.unionAll(degraded), qrels, 5)
      .collect()
      .map(r => (r.getAs[String]("ranker"), r.getAs[Long]("query_id")) ->
        r.getAs[Long]("ndcg_q6")).toMap
    Retrieval.QueryPanel.foreach { case (qid, _) =>
      withClue(s"query $qid: degraded=${sc(("degraded", qid))} " +
        s"tfidf=${sc(("tfidf", qid))}") {
        sc(("degraded", qid)) should be < sc(("tfidf", qid))
      }
    }
  }

  test("the full scorecard emits one row per (ranker, query) for all " +
    "four production rankers, with NDCG/MRR/recall in micro-unit range") {
    val rows = RankerEval.rankerScorecard(spark, sf).collect()
    rows.length shouldBe 4 * Retrieval.QueryPanel.length
    rows.map(_.getAs[String]("ranker")).distinct.sorted.toSeq shouldBe
      Seq("bm25_index", "hybrid", "store", "tfidf")
    rows.foreach { r =>
      val clue = s"${r.getAs[String]("ranker")}/" +
        s"${r.getAs[Long]("query_id")}: "
      withClue(clue) {
        r.getAs[Long]("ndcg_q6") should (be >= 0L and be <= 1000000L)
        r.getAs[Long]("mrr_q6") should (be >= 0L and be <= 1000000L)
        if (!r.isNullAt(r.fieldIndex("recall_q6")))
          r.getAs[Long]("recall_q6") should
            (be >= 0L and be <= 1000000L)
      }
    }
  }

  test("a ranker that retrieves NOTHING for a query scores an explicit " +
    "0 row — empty results are a regression the scorecard must show") {
    val truth = Retrieval
      .indexTopKBatchFrom(spark, corpus, Retrieval.QueryPanel, 5)
      .select(lit("tfidf").as("ranker"), col("query_id"), col("rank"),
        col("doc_id"))
    // simulate a ranker erroring-to-empty on query 2
    val partial = truth.filter(col("query_id") =!= 2L)
    val sc = RankerEval.scoreRankings(partial, qrels, 5).collect()
    sc.length shouldBe Retrieval.QueryPanel.length // q2 row still there
    val q2 = sc.find(_.getAs[Long]("query_id") == 2L).get
    q2.getAs[Long]("ndcg_q6") shouldBe 0L
    q2.getAs[Long]("dcg_q9") shouldBe 0L
    q2.getAs[Long]("n_hits_rel") shouldBe 0L
    q2.getAs[Long]("mrr_q6") shouldBe 0L
    q2.getAs[Long]("recall_q6") shouldBe 0L
    q2.getAs[Long]("n_rel") should be > 0L
  }

  test("scorecard drift gate: an identical second release flags " +
    "NOTHING, a degraded release flags rows, and a pinned reader " +
    "still sees the clean comparison") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-scorecard-drift").toString
    val truth = Retrieval
      .indexTopKBatchFrom(spark, corpus, Retrieval.QueryPanel, 5)
      .select(lit("tfidf").as("ranker"), col("query_id"), col("rank"),
        col("doc_id"))
    val sc = RankerEval.scorecardLong(
      RankerEval.scoreRankings(truth, qrels, 5))
    RankerEval.appendScorecard(spark, sc, p) shouldBe 1L
    RankerEval.appendScorecard(spark, sc, p) shouldBe 2L
    val clean = RankerEval.scorecardDrift(spark, p).collect()
    clean should not be empty
    withClue(clean.mkString("\n")) {
      clean.count(_.getAs[Boolean]("flagged")) shouldBe 0
      all(clean.map(_.getAs[Long]("delta"))) shouldBe 0L
    }
    // a synthetically degraded release 3 MUST produce flagged deltas
    val degraded = RankerEval
      .degradedRanking(spark, corpus, Retrieval.QueryPanel, 5)
      .select(lit("tfidf").as("ranker"), col("query_id"), col("rank"),
        col("doc_id"))
    RankerEval.appendScorecard(spark, RankerEval.scorecardLong(
      RankerEval.scoreRankings(degraded, qrels, 5)), p) shouldBe 3L
    val drifted = RankerEval.scorecardDrift(spark, p).collect()
    withClue(drifted.mkString("\n")) {
      drifted.exists(_.getAs[Boolean]("flagged")) shouldBe true
    }
    // version 2 pinned: still the clean r1-vs-r2 comparison
    RankerEval.scorecardDrift(spark, p, 2L).collect()
      .count(_.getAs[Boolean]("flagged")) shouldBe 0
  }

  test("scorecard-store retention bounds the quality history: a " +
    "historyKeep window + retainStore physically drops old releases, " +
    "the drift gate still answers from the survivors") {
    val p = java.nio.file.Files
      .createTempDirectory("graft-scorecard-retain").toString
    val truth = Retrieval
      .indexTopKBatchFrom(spark, corpus, Retrieval.QueryPanel, 5)
      .select(lit("tfidf").as("ranker"), col("query_id"), col("rank"),
        col("doc_id"))
    val sc = RankerEval.scorecardLong(
      RankerEval.scoreRankings(truth, qrels, 5))
    (1 to 3).foreach(_ =>
      RankerEval.appendScorecard(spark, sc, p, historyKeep = 2))
    // version 3 references only r0002/r0003 (the window)
    StoreVersioning.liveTokens(spark, s"$p/manifest")("rel") shouldBe
      Seq("r0002", "r0003")
    val before = RankerEval.scorecardDrift(spark, p).collect()
    graft.operators.PersistedIndex.retainStore(spark, "scorecard", p,
      keep = 1)
    // only version 3 survives; the r0001 segment is physically gone
    StoreVersioning.listVersions(spark, s"$p/manifest") shouldBe Seq(3L)
    val fs = StoreVersioning.fs(spark, p)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/releases"))
      .map(_.getPath.getName).sorted.toSeq shouldBe
      Seq("ingest=r0002", "ingest=r0003")
    // the drift gate still answers from the surviving history
    RankerEval.scorecardDrift(spark, p).collect()
      .map(_.toSeq).toSeq shouldBe before.map(_.toSeq).toSeq
    // a 1-release window would starve the drift gate — refused loudly
    intercept[IllegalArgumentException] {
      RankerEval.appendScorecard(spark, sc, p, historyKeep = 1)
    }.getMessage should include("historyKeep")
  }

  test("the seed-B grade recipe is a distinct projection from the " +
    "rankers' seed-A embedding (different md5 digits)") {
    import spark.implicits._
    val toks = Seq("spark", "join", "window", "hash", "merge", "sort",
      "stream", "batch", "filter", "vector", "query", "table", "scan")
      .toDF("token")
    val both = toks.select(
      RankerEval.gradeBucket(col("token")).as("b"),
      graft.operators.TextPipeline.hashEmbedBucket(col("token")).as("a"))
      .collect()
    // not the identical bucket function (some token maps differently)
    both.exists(r => r.getLong(0) != r.getLong(1)) shouldBe true
  }
}
