package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.SimilarityPipeline

/** Product-quantization contracts — the semantic invariants behind the
  * pq_topk / pq_recon_error oracle rows: codebooks are bounded and
  * deterministic, every reported candidate's EXACT score is the true
  * cosine (stage 2 cannot be damaged by quantization), and the PQ
  * stage-1 recalls most of the brute-force top-k on the synthetic table.
  */
class PqSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("codebooks: 4 subspaces, <= 16 codewords of dim 16, deterministic across builds") {
    val a = SimilarityPipeline.pqCodebooks(spark, sf)
    a.length shouldBe 4
    a.foreach { case (ids, vecs) =>
      ids.length shouldBe vecs.length
      ids.length should be <= 16
      ids.length should be >= 1
      ids.toSeq shouldBe ids.toSeq.sorted
      vecs.foreach(_.length shouldBe 16)
    }
    val b = SimilarityPipeline.pqCodebooks(spark, sf)
    a.map(x => (x._1.toSeq, x._2.map(_.toSeq).toSeq)) shouldBe
      b.map(x => (x._1.toSeq, x._2.map(_.toSeq).toSeq))
  }

  test("pq_topk: exact column is the true cosine; ranks dense; decent stage-1 recall") {
    import spark.implicits._
    val out = SimilarityPipeline.pqTopK(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    out.map(_._1).toSeq shouldBe (1L to out.length)
    out.length shouldBe 10

    // recompute the true cosines driver-side from the raw table
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs(0L)
    out.foreach { case (_, id, simPq, sim) =>
      sim shouldBe (math.floor(cos(vecs(id), q) * 1e4 + 0.5) / 1e4 +- 1e-4)
      simPq should (be >= -1.0001 and be <= 1.0001)
    }

    // stage-1 recall vs brute force: the PQ top-10 must recover most of
    // the exact top-10 (deterministic data -> a stable measured floor)
    val exactTop = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (cos(v, q), id) }
      .sortBy { case (c, id) => (-c, id) }.take(10).map(_._2).toSet
    val recall = out.map(_._2).count(exactTop) / 10.0
    withClue(s"pq recall@10 = $recall: ") { recall should be >= 0.5 }
  }

  test("sim_topk_ivfpq: results come only from the probed clusters; " +
    "exact column is the true cosine; ranks dense") {
    import spark.implicits._
    val out = SimilarityPipeline.simTopKIvfPq(spark, sf)
      .as[(Long, Long, Int, Double, Double)].collect()
    out.map(_._1).toSeq shouldBe (1L to out.length)
    out.length shouldBe 10

    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) v", "label")
      .as[(Long, Seq[Double], Int)].collect()
    val vecs = rows.map(r => r._1 -> r._2).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs(0L)
    // the coarse-quantizer decision, re-derived driver-side: per-label
    // mean centroid, top-2 by cosine to the query — every emitted row's
    // label must be one of the probed clusters (the inverted-list prune
    // is real, not advisory)
    val probed = rows.groupBy(_._3).map { case (label, g) =>
      val n = g.length.toDouble
      val c: Seq[Double] =
        (0 until 64).map(i => g.map(_._2(i)).sum / n)
      (label, cos(c, q))
    }.toSeq.sortBy { case (l, c) => (-c, l) }.take(2).map(_._1).toSet
    out.foreach { case (_, id, label, simPq, sim) =>
      withClue(s"vec $id label $label outside probed $probed: ") {
        probed should contain(label)
      }
      sim shouldBe (math.floor(cos(vecs(id), q) * 1e4 + 0.5) / 1e4 +- 1e-4)
      simPq should (be >= -1.0001 and be <= 1.0001)
    }
  }

  test("pq_recon_error: every subspace encodes every vector; usage bounded by K") {
    import spark.implicits._
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val rows = SimilarityPipeline.pqReconError(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    rows.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    rows.foreach { case (_, nVecs, used, sumD2) =>
      nVecs shouldBe n
      used should (be >= 1L and be <= 16L)
      sumD2 should be >= 0L
    }
  }
}
