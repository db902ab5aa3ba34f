package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Preference

/** Bradley-Terry contracts the hash compare can't express: ratings form
  * a mean-10⁶ system, and a strictly dominant source rates strictly
  * above a strictly dominated one.
  */
class PreferenceSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("ratings are a mean-1e6 system over all sources; games/wins consistent") {
    import spark.implicits._
    val rows = Preference.btRatings(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    rows.length should be > 1
    // mean-1e6 normalization (floor-quantization slack per player)
    rows.map(_._4).sum shouldBe rows.length * 1000000L +- (rows.length * 5L)
    // wins never exceed games; total wins == total games / 2 (every
    // match has exactly one winner, games double-counts directions)
    rows.foreach { case (_, g, w, _) => w should be <= g }
    rows.map(_._3).sum shouldBe rows.map(_._2).sum / 2
  }

  test("a strictly better source outrates a strictly worse one") {
    import spark.implicits._
    // lang-interleaved docs: source 'hi' long diverse text (high quality),
    // 'lo' short repetitive text — hi beats lo in every adjacent pair
    val hiText = (1 to 60).map(i => s"tok$i the of and").mkString(" ")
    val loText = "x x"
    val corpus = (0 until 12).map { i =>
      val src = if (i % 2 == 0) "hi" else "lo"
      (i.toLong, "en", src, if (src == "hi") hiText else loText)
    }.toDF("doc_id", "lang", "source", "text")
    val rows = Preference.btRatingsFrom(spark, corpus)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    rows("hi")._3 shouldBe rows("hi")._2 // hi wins every game
    rows("lo")._3 shouldBe 0L
    rows("hi")._4 should be > rows("lo")._4
    rows("lo")._4 shouldBe 0L // MM sends a win-less (but played) player to 0
  }

  test("prefCycles pins zeta to 1e6 when fewer than 3 sources exist") {
    import spark.implicits._
    // 2 sources -> 0 triads and a 0 Kendall denominator: the consistency
    // coefficient must pin to the scaled 1 (no cycles can exist), never
    // divide 0/0 (the gateKappa degenerate-case rule)
    val corpus = (0 until 8).map { i =>
      (i.toLong, "en", if (i % 2 == 0) "a" else "b",
        s"some text tok$i with words")
    }.toDF("doc_id", "lang", "source", "text")
    val row = Preference.prefCyclesFrom(spark, corpus).collect().head
    row.getAs[Long]("n_sources") shouldBe 2L
    row.getAs[Long]("n_triads") shouldBe 0L
    row.getAs[Long]("zeta_q6") shouldBe 1000000L
  }
}
