package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.MixtureOptimizer

/** The EG reweighting contracts the hash compare can't express: weights
  * stay a (smoothed) distribution, order by excess loss, and collapse to
  * uniform when no domain is worse than another.
  */
class MixtureOptimizerSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("weights form a near-1e6-ppm distribution, monotone in excess loss") {
    import spark.implicits._
    val rows = MixtureOptimizer.domainReweight(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    rows.length should be > 1
    val total = rows.map(_._6).sum
    // floor-quantization loses at most a few ppm per domain per round
    total shouldBe 1000000L +- (rows.length * 10L)
    // the smoothing floor keeps every domain alive (no starvation)
    rows.foreach(_._6 should be >= 20000L / rows.length)
    // EG with a static loss is monotone: more excess never means less weight
    rows.sortBy(_._4).map(_._6).toSeq shouldBe
      rows.map(_._6).sorted.toSeq
    // the baseline domain has excess 0 and ef 1e6 exactly
    rows.map(_._4).min shouldBe 0L
    rows.find(_._4 == 0L).get._5 shouldBe 1000000L
  }

  test("identical domains get identical (uniform) weights") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a", "the quick brown fox"), (2L, "a", "jumps over the dog"),
      (3L, "b", "the quick brown fox"), (4L, "b", "jumps over the dog"),
      (5L, "c", "the quick brown fox"), (6L, "c", "jumps over the dog"))
      .toDF("doc_id", "source", "text")
    val rows = MixtureOptimizer.domainReweightFrom(spark, corpus)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    rows.length shouldBe 3
    rows.map(_._4).toSet shouldBe Set(0L) // no excess anywhere
    rows.map(_._6).toSet.size shouldBe 1  // equal weights
  }
}
