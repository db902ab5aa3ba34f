package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Retrieval

/** Inverted-index retrieval: structural invariants of the document-
  * partitioned postings, reconstruction against a direct corpus count, and
  * TF-IDF score agreement with a brute-force recompute. The DuckDB oracle
  * (inverted_index / index_topk) pins exact values; this spec pins the
  * CONTRACT a consumer of the index relies on.
  */
class RetrievalSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // cached for the suite, dropped in afterAll — a lingering cache entry
  // would make CacheManager substitute an InMemoryRelation when another
  // suite (PlanAuditSpec) plans the same query and skew its exchange count
  private lazy val index = Retrieval.invertedIndex(spark, sf).cache()

  override def afterAll(): Unit = {
    index.unpersist()
    super.afterAll()
  }

  test("postings are document-partitioned and doc_id-sorted within a shard") {
    val rows = index
      .select($"shard", $"doc_ids", $"n_docs")
      .as[(Int, Seq[Long], Long)].collect()
    rows should not be empty
    rows.foreach { case (shard, docIds, nDocs) =>
      docIds should have length nDocs.toInt
      docIds shouldBe docIds.sorted
      docIds shouldBe docIds.distinct
      docIds.foreach(d => (d % 8).toInt shouldBe shard)
    }
  }

  test("per-term df/cf equal the sum of the term's shard postings") {
    val bad = index.groupBy($"term")
      .agg(max($"df").as("df"), max($"cf").as("cf"),
        sum($"n_docs").as("sum_docs"),
        sum(aggregate($"tfs", lit(0L), (a, b) => a + b)).as("sum_tf"))
      .filter($"df" =!= $"sum_docs" || $"cf" =!= $"sum_tf")
    bad.count() shouldBe 0L
  }

  test("a term's postings reconstruct the direct corpus count") {
    val term = index.select($"term").as[String].head()
    val fromIndex = index.filter($"term" === term)
      .select(explode(arrays_zip($"doc_ids", $"tfs")).as("e"))
      .select($"e.doc_ids".as("doc_id"), $"e.tfs".as("tf"))
      .as[(Long, Long)].collect().toMap
    val direct = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .filter($"t" === term)
      .groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    fromIndex shouldBe direct
  }

  test("indexTopK scores match a per-doc brute-force TF-IDF recompute") {
    val docsDf = graft.sources.Tables.documents(spark, sf)
    val n = docsDf.count().toDouble
    val toks = docsDf
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .filter($"t".isin(Retrieval.QueryTerms: _*))
      .as[(Long, String)].collect()
    val df = toks.groupBy(_._2).map { case (t, xs) =>
      t -> xs.map(_._1).distinct.size.toDouble
    }
    val expected = toks.groupBy(_._1).map { case (d, xs) =>
      d -> BigDecimal(xs.groupBy(_._2).map { case (t, o) =>
        o.size * math.log(n / df(t))
      }.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Retrieval.indexTopK(spark, sf)
      .select($"doc_id", $"score").as[(Long, Double)].collect()
    got should have length 10
    got.foreach { case (d, s) => s shouldBe expected(d) }
    // top-k really is the k best: no unreported doc scores above the cut
    val cut = got.map(_._2).min
    expected.values.count(_ > cut) should be <= 10
  }
}

/** The ranker-agreement diagnostic's structural contract: agreement flag
  * and delta derive from the two rank columns, each side's ranks are a
  * dense prefix, nothing ranks past k.
  */
class RankerAgreementSpec extends AnyFunSuite with Matchers with SparkTestBase {
  test("ranker agreement: consistent ranks, deltas only where both rank") {
    val rows = Retrieval
      .rankerAgreement(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    rows.length should be >= 20 // at least one full top-20 side
    rows.foreach { case (_, rt, rb, both, delta) =>
      both shouldBe (rt.isDefined && rb.isDefined)
      rt.foreach(_ should be <= 20L)
      rb.foreach(_ should be <= 20L)
      if (both) delta shouldBe Some(math.abs(rt.get - rb.get))
      else delta shouldBe None
    }
    // each side's ranks are a permutation prefix (dense from 1)
    rows.flatMap(_._2).sorted shouldBe (1L to rows.count(_._2.isDefined))
    rows.flatMap(_._3).sorted shouldBe (1L to rows.count(_._3.isDefined))
  }
}

/** The retrieval-quality scorecard's exact-math contract (round 14):
  * ideal-ranking ties break by doc_id, the grade >= 2 relevance
  * plumbing feeds MRR/recall, and an all-equal-grade ranking scores a
  * perfect NDCG.
  */
class RetrievalEvalSpec extends AnyFunSuite with Matchers
    with SparkTestBase {
  import spark.implicits._

  test("ideal-ranking ties break by doc_id; all-equal grades score a " +
    "perfect NDCG; one-term queries have no grade-2 relevant set") {
    // four docs tie at grade 1 for a one-term query; the score ranking
    // and the ideal ranking carry the SAME grades in every position, so
    // ndcg == 1e6 exactly, and n_rel (grade >= 2) is structurally 0
    val corpus = Seq(
      (1L, "spark alpha"), (2L, "spark beta"), (3L, "spark gamma"),
      (4L, "spark delta"), (5L, "nothing here")).toDF("doc_id", "text")
    val out = Retrieval
      .retrievalEvalFrom(spark, corpus, Seq(1L -> Seq("spark")), 5)
      .collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[Long]("n_rel") shouldBe 0L
    r.getAs[Long]("mrr_q6") shouldBe 0L
    assert(r.isNullAt(r.fieldIndex("recall_q6")))
    r.getAs[Long]("ndcg_q6") shouldBe 1000000L
  }

  test("grade >= 2 relevance feeds MRR and recall; the bi-term doc " +
    "outranks single-term docs and takes reciprocal rank 1") {
    val corpus = Seq(
      (6L, "spark join spark join"), (7L, "spark alpha"),
      (8L, "join beta"), (9L, "nothing")).toDF("doc_id", "text")
    val out = Retrieval
      .retrievalEvalFrom(spark, corpus, Seq(1L -> Seq("spark", "join")), 5)
      .collect().head
    out.getAs[Long]("n_rel") shouldBe 1L
    out.getAs[Long]("n_hits_rel") shouldBe 1L
    out.getAs[Long]("recall_q6") shouldBe 1000000L
    out.getAs[Long]("mrr_q6") shouldBe 1000000L
    // DCG: doc6(grade2, rank1) + doc7/8 (grade1, ranks 2-3 by doc_id);
    // ideal is the same multiset of grades in the same order → perfect
    out.getAs[Long]("ndcg_q6") shouldBe 1000000L
  }

  test("a relevant doc ranked below an irrelevant one degrades NDCG " +
    "below 1 and MRR to the matching reciprocal") {
    // doc 11 matches both terms once (grade 2); doc 10 stuffs 'spark'
    // so TF-IDF ranks it first (grade 1) — the eval must notice
    val corpus = Seq(
      (10L, "spark spark spark spark spark spark"),
      (11L, "spark join"), (12L, "filler words only"),
      (13L, "more filler")).toDF("doc_id", "text")
    val out = Retrieval
      .retrievalEvalFrom(spark, corpus, Seq(1L -> Seq("spark", "join")), 5)
      .collect().head
    out.getAs[Long]("n_rel") shouldBe 1L
    out.getAs[Long]("ndcg_q6") should be < 1000000L
    out.getAs[Long]("mrr_q6") shouldBe 500000L // first grade-2 at rank 2
  }
}
