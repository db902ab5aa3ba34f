package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, Preference, RangeSession,
  SimilarityPipeline, TextPipeline}

/** Semantic invariants of the round-9 operators that the oracle hash
  * compare can't express (the hash proves cross-engine equality, not that
  * the numbers mean what the scaladoc claims).
  */
class RoundNineOpsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("pref_cycles: a strictly ordered panel is perfectly transitive " +
    "(zeta = 1), and the triad/pair counts are the binomials") {
    import spark.implicits._
    // three sources with strictly ordered quality -> no cycle possible
    val hi = (1 to 60).map(i => s"tok$i the of and").mkString(" ")
    val mid = (1 to 20).map(i => s"tok$i the of").mkString(" ")
    val lo = "x x"
    val corpus = (0 until 12).map { i =>
      val (src, txt) = (i % 3) match {
        case 0 => ("a_hi", hi)
        case 1 => ("b_mid", mid)
        case _ => ("c_lo", lo)
      }
      (i.toLong, "en", src, txt)
    }.toDF("doc_id", "lang", "source", "text")
    val r = Preference.prefCyclesFrom(spark, corpus)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val (nSrc, nPairs, nPlayed, _, nTriads, nCyclic, zeta) = r
    nSrc shouldBe 3L
    nPairs shouldBe 3L // C(3,2)
    nTriads shouldBe 1L // C(3,3)
    nPlayed should be >= 2L
    nCyclic shouldBe 0L
    zeta shouldBe 1000000L
  }

  test("pref_cycles: full-corpus counts are the binomials and zeta is " +
    "a valid consistency coefficient") {
    import spark.implicits._
    val r = Preference.prefCycles(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    val (n, nPairs, nPlayed, nTies, nTriads, nCyclic, zeta) = r
    nPairs shouldBe n * (n - 1) / 2
    nTriads shouldBe n * (n - 1) * (n - 2) / 6
    nPlayed should be <= nPairs
    nTies should be <= nPlayed
    val maxd = if (n % 2 == 1) (n * n * n - n) / 24.0
    else (n * n * n - 4 * n) / 24.0
    nCyclic.toDouble should be <= maxd
    zeta should (be >= 0L and be <= 1000000L)
  }

  test("canonical_select keeps exactly one member per cluster — the " +
    "max-quality one (doc_id tiebreak)") {
    val rows = TextPipeline.canonicalSelect(spark, "/root/testdata/sf0.01")
      .collect()
    rows.length should be > 0
    val byCluster = rows.groupBy(_.getLong(0))
    byCluster.foreach { case (_, members) =>
      members.count(_.getBoolean(4)) shouldBe 1
      // every member row carries the cluster size
      members.foreach(_.getLong(2) shouldBe members.length.toLong)
      val kept = members.find(_.getBoolean(4)).get
      val best = members.map(m => (-m.getLong(3), m.getLong(1))).min
      (-kept.getLong(3), kept.getLong(1)) shouldBe best
    }
  }

  test("sft_pack: the kept suffix fits the context, loss-mask tokens are " +
    "a subset, and untruncated sessions keep everything") {
    val rows = RangeSession.sftPack(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nTurns, total, keptTurns, keptTok, asstTok, trunc) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getBoolean(7))
      keptTok should be <= 8L
      asstTok should be <= keptTok
      keptTurns should be <= nTurns
      if (!trunc) {
        keptTurns shouldBe nTurns
        keptTok shouldBe total
      } else total should be > 8L
    }
    // the accountant exists to catch these: some session somewhere must
    // actually truncate at C=64 on real data
    rows.exists(_.getBoolean(7)) shouldBe true
  }

  test("k_anonymity: classes partition the table and the flags match " +
    "the thresholds") {
    val rows = DataQuality.kAnonymity(spark, sf).collect()
    val total = graft.sources.Tables.customer(spark, sf).count()
    rows.map(_.getLong(2)).sum shouldBe total
    rows.foreach { r =>
      r.getBoolean(4) shouldBe (r.getLong(2) < 5)
      r.getBoolean(5) shouldBe (r.getLong(3) < 2)
      r.getLong(3) should be <= r.getLong(2) // l <= k always
    }
  }

  test("emb_eff_rank: PR is within [1, 64] and the top share is " +
    "consistent with it") {
    val rows = SimilarityPipeline.embEffRank(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val pr = r.getLong(2)
      val topShare = r.getLong(4)
      pr should (be >= 10000L and be <= 640000L)
      r.getLong(3) should (be >= 0L and be < 64L)
      // PR >= 1/maxShare: sum(l^2) <= max * sum(l) since every l <= max,
      // so (sum)^2/(sum sq) >= sum/max; in q units pr * topShare >= 1e8
      // (minus floor-quantization slack on both factors)
      (pr * topShare) should be >= 99980000L
      topShare should be >= 156L // max share >= 1/64 of the total
    }
  }

  test("hard_negatives: mined pairs come from outside the panel and the " +
    "margin is the similarity gap") {
    val rows = SimilarityPipeline.hardNegatives(spark, sf).collect()
    rows.length shouldBe 8
    rows.foreach { r =>
      r.getLong(1) should be >= 8L // pos_id outside the panel
      r.getLong(3) should be >= 8L // neg_id outside the panel
      val gap = r.getDouble(2) - r.getDouble(4)
      math.abs(r.getDouble(5) - gap) should be <= 2e-4 // independent rounding
    }
  }

  test("label_noise ranks are contiguous from 1 per language") {
    val rows = DataQuality.labelNoise(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      rs.map(_.getLong(1)).sorted shouldBe (1L to rs.length.toLong)
    }
  }
}
