package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.CurationProgram

/** Internal consistency of the composed batch curation program (stage
  * values are oracle-pinned; stream equivalence lives in
  * ComposedIngestSpec).
  */
class CurationProgramSpec extends AnyFunSuite with Matchers
    with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("funnel is monotone non-increasing and its last stage IS the manifest") {
    val funnel = CurationProgram.curationFunnel(spark, sf)
      .as[(Int, String, Long, Long)].collect().toSeq
    funnel.map(_._2) shouldBe Seq("ingest", "gated", "deduped", "capped",
      "budgeted")
    // every stage can only drop documents and tokens
    funnel.sliding(2).foreach { case Seq(a, b) =>
      withClue(s"${a._2} -> ${b._2}: ") {
        b._3 should be <= a._3
        b._4 should be <= a._4
      }
    }
    // the gate and the budget bind on this corpus (dedup is a known
    // pass-through on the dup-free snapshot and the per-source cap does
    // not reach 30 at this SF — both oracle-pinned)
    funnel(1)._3 should be < funnel(0)._3
    funnel(4)._3 should be < funnel(3)._3
    // the funnel's terminal row counts exactly the manifest's rows/tokens
    val manifest = CurationProgram.curationProgram(spark, sf)
      .select($"n_tokens").as[Long].collect()
    funnel.last._3 shouldBe manifest.length.toLong
    funnel.last._4 shouldBe manifest.sum
  }

  test("manifest coordinates respect every stage's bound") {
    val rows = CurationProgram.curationProgram(spark, sf)
      .as[(Long, String, String, Long, Long, Long, Long, Long, String)]
      .collect().toSeq
    rows.nonEmpty shouldBe true
    rows.foreach { case (_, _, _, _, qualityQ4, capRk, startOffset, bucket,
        split) =>
      // quality leaves scaled (quality_q4 = floor(q·10⁴ + 0.5) BIGINT)
      qualityQ4 should be >= 5000L
      capRk should (be >= 1L and be <= 30L)
      startOffset should be < 2000L
      val expected = if (bucket < 90) "train"
        else if (bucket < 95) "val" else "test"
      split shouldBe expected
    }
    // the budget allowance actually binds at this SF (the cap's best
    // source stops at 24 of 30 — no source has 30 gated docs here)
    rows.groupBy(_._3).values.exists(_.map(_._4).sum >= 2000L) shouldBe true
  }
}
