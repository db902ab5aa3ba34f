package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.CorpusRules

/** Invariants of the rule-based curation family (CorpusRules): the
  * Gopher battery's rule semantics on crafted documents, the epoch
  * schedule's cap arithmetic, and the overlap matrix's Jaccard
  * identities. (Cross-engine value equality is the DuckDB oracle's job;
  * these pin the SEMANTICS on inputs the synthetic corpus can't
  * exercise.)
  */
class CorpusRulesSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  test("gopher rules: crafted pass/fail per rule; keep is the conjunction") {
    val passText = ((1 to 56).map(i => s"word$i") ++
      Seq("the", "of", "and", "is")).mkString(" ")       // 60 words, 2+ stops
    val shortText = "the of and is tiny"                 // fails word count
    val repetitive = (Seq.fill(30)("spam") ++
      (1 to 28).map(i => s"w$i") ++ Seq("the", "of")).mkString(" ") // top 50%
    val noStops = (1 to 60).map(i => s"word$i").mkString(" ")
    val corpus = Seq(
      (1L, passText), (2L, shortText), (3L, repetitive), (4L, noStops)
    ).toDF("doc_id", "text")
    val rows = CorpusRules.gopherRulesFrom(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    rows(1L).getAs[Boolean]("keep") shouldBe true
    rows(2L).getAs[Boolean]("r_word_count") shouldBe false
    rows(2L).getAs[Boolean]("keep") shouldBe false
    rows(3L).getAs[Boolean]("r_repetition") shouldBe false
    rows(3L).getAs[Long]("top_share_q4") shouldBe 5000L
    rows(4L).getAs[Boolean]("r_stopwords") shouldBe false
    rows.values.foreach { r =>
      r.getAs[Boolean]("keep") shouldBe (
        r.getAs[Boolean]("r_word_count") && r.getAs[Boolean]("r_mean_len") &&
        r.getAs[Boolean]("r_stopwords") && r.getAs[Boolean]("r_repetition"))
    }
  }

  test("data epochs: multiplier caps at 4x and effective tokens follow it") {
    val rows = CorpusRules.dataEpochs(spark, "/root/testdata/sf0.001")
      .collect()
    rows.length should be > 1
    rows.foreach { r =>
      val (avail, target, eq4, eff) = (r.getAs[Long]("avail_tokens"),
        r.getAs[Long]("target_tokens"), r.getAs[Long]("epochs_q4"),
        r.getAs[Long]("effective_tokens"))
      eq4 should be <= 40000L
      eq4 should be > 0L
      eff shouldBe (eq4 * avail) / 10000L
      r.getAs[Boolean]("capped") shouldBe (eq4 == 40000L)
      // uncapped sources land within a quantization step of their share
      if (eq4 < 40000L) {
        math.abs(eff - target) should be <= (avail / 10000L + 1L)
      }
    }
  }

  test("source overlap: identical sources score 1e6, disjoint pairs are absent") {
    graft.expressions.VectorExpressions.register(spark)
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val half = (1 to 10).map(i => if (i <= 6) s"tok$i" else s"alt$i")
      .mkString(" ")
    val corpus = Seq(
      (1L, "a", shared), (2L, "b", shared), (3L, "h", half),
      (4L, "c", "completely different words here entirely now today ok")
    ).toDF("doc_id", "source", "text")
    val rows = CorpusRules.sourceOverlapFrom(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap

    // identical sources: full overlap
    rows(("a", "b")).getAs[Long]("jaccard_q6") shouldBe 1000000L
    rows(("a", "b")).getAs[Long]("n_common") shouldBe 8L // 10 words, k=3
    // partial overlap: strictly between 0 and 1e6, symmetric inputs
    val ah = rows(("a", "h"))
    ah.getAs[Long]("jaccard_q6") should (be > 0L and be < 1000000L)
    ah.getAs[Long]("n_common") shouldBe 4L // shingles within tok1..tok6
    // disjoint pairs never emit a row
    rows.keySet should not contain (("a", "c"))
    rows.keySet should not contain (("b", "c"))
    // Jaccard identity holds for every emitted pair
    rows.values.foreach { r =>
      val (na, nb, nc) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_common"))
      r.getAs[Long]("jaccard_q6") shouldBe
        math.floor(nc.toDouble / (na + nb - nc) * 1000000d + 0.5d).toLong
    }
  }

  test("overlap sketch: exact extremes recovered, every pair emitted, est identity") {
    graft.expressions.VectorExpressions.register(spark)
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, "a", shared), (2L, "b", shared),
      (3L, "c", "completely different words here entirely now today ok")
    ).toDF("doc_id", "source", "text")
    val rows = CorpusRules.sourceOverlapSketchFrom(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap

    // all 3 pairs present (the sketch emits the full #sources² grid)
    rows.keySet shouldBe Set(("a", "b"), ("a", "c"), ("b", "c"))
    // identical sources: all 16 mins agree; disjoint: none do — and the
    // estimate recovers the exact value at both extremes
    rows(("a", "b")).getAs[Long]("n_match") shouldBe 16L
    rows(("a", "b")).getAs[Long]("est_jaccard_q6") shouldBe 1000000L
    rows(("a", "b")).getAs[Long]("err_q6") shouldBe 0L
    rows(("a", "c")).getAs[Long]("n_match") shouldBe 0L
    rows(("a", "c")).getAs[Long]("err_q6") shouldBe 0L
    // est/err integer identities hold on every row
    rows.values.foreach { r =>
      r.getAs[Long]("est_jaccard_q6") shouldBe
        r.getAs[Long]("n_match") * 62500L
      r.getAs[Long]("err_q6") shouldBe math.abs(
        r.getAs[Long]("est_jaccard_q6") - r.getAs[Long]("exact_jaccard_q6"))
    }
  }

  test("water-filling: allocations sum to min(budget, total), caps respected") {
    for (budget <- Seq(0L, 7L, 30000L, 100000000L)) {
      val rows = CorpusRules
        .budgetWaterfill(spark, "/root/testdata/sf0.001", budget).collect()
      rows.length should be > 1
      val total = rows.map(_.getAs[Long]("avail_tokens")).sum
      rows.map(_.getAs[Long]("alloc_tokens")).sum shouldBe
        math.min(budget, total)
      rows.foreach { r =>
        val (avail, alloc) = (r.getAs[Long]("avail_tokens"),
          r.getAs[Long]("alloc_tokens"))
        alloc should be >= 0L
        alloc should be <= avail
        r.getAs[Boolean]("fully_used") shouldBe (alloc == avail)
      }
      // water-filling shape: uncapped sources differ by at most one token
      val uncapped = rows.filter(r =>
        r.getAs[Long]("alloc_tokens") < r.getAs[Long]("avail_tokens"))
        .map(_.getAs[Long]("alloc_tokens"))
      if (uncapped.nonEmpty) {
        (uncapped.max - uncapped.min) should be <= 1L
        // every fully-used source's supply is <= any uncapped allocation
        // + 1 (no source was starved below the level while another sat
        // above it)
        rows.filter(_.getAs[Boolean]("fully_used"))
          .map(_.getAs[Long]("avail_tokens"))
          .foreach(_ should be <= uncapped.max + 1L)
      }
    }
  }

  test("eval_alloc: Hamilton quotas sum to exactly evalN and respect cell sizes") {
    val rows = CorpusRules.evalAlloc(spark, "/root/testdata/sf0.001", evalN = 100L).collect()
    rows.map(_.getAs[Long]("quota")).sum shouldBe 100L
    rows.foreach { r =>
      r.getAs[Long]("quota") should be <= r.getAs[Long]("n_cell")
      // base <= quota <= base + 1 (largest-remainder adds at most one)
      val base = r.getAs[Long]("quota_base")
      r.getAs[Long]("quota") should (be >= base and be <= base + 1)
    }
    // the extras go to the LARGEST remainders: every extra cell's
    // remainder >= every non-extra cell's (ties broken by cell id)
    val extras = rows.filter(_.getAs[Boolean]("extra"))
      .map(_.getAs[Long]("rem_num"))
    val plains = rows.filterNot(_.getAs[Boolean]("extra"))
      .map(_.getAs[Long]("rem_num"))
    if (extras.nonEmpty && plains.nonEmpty)
      extras.min should be >= plains.max - 0L // allow tie at the boundary
  }

  test("eval_sample admits exactly each cell's quota in seeded-hash order") {
    val quotas = CorpusRules.evalAlloc(spark, "/root/testdata/sf0.001", evalN = 100L).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        r.getAs[Long]("quota")).toMap
    val sample = CorpusRules.evalSample(spark, "/root/testdata/sf0.001", evalN = 100L).collect()
    sample.length shouldBe 100
    val perCell = sample.groupBy(r =>
      (r.getAs[String]("lang"), r.getAs[String]("source")))
      .view.mapValues(_.length.toLong).toMap
    perCell.foreach { case (cell, n) => n shouldBe quotas(cell) }
    // ranks are 1..quota within each cell
    sample.groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
      .foreach { case (_, rs) =>
        rs.map(_.getAs[Long]("rk")).sorted.toSeq shouldBe
          (1L to rs.length.toLong)
      }
  }
}
