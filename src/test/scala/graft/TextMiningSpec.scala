package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextPipeline

/** Hand-computed oracles for the text-mining operators the DuckDB replay
  * checks only at corpus scale — tiny corpora where PMI (and friends) can
  * be verified against pencil-and-paper values.
  */
class TextMiningSpec extends AnyFunSuite with Matchers with SparkTestBase {

  import spark.implicits._

  test("collocations: PMI matches hand computation and orders phrase > habit > reverse") {
    // 25 docs "p q": bigram (p q) x25; 25 docs "m n m n": (m n) x50, (n m) x25.
    // N_tok = 150, N_bi = 100:
    //   pmi(p q) = ln((25/100)/((25/150)^2))      = ln(9)    = 2.1972
    //   pmi(m n) = ln((50/100)/((50/150)^2))      = ln(4.5)  = 1.5041
    //   pmi(n m) = ln((25/100)/((50/150)^2))      = ln(2.25) = 0.8109
    val corpus = ((1 to 25).map(i => (i.toLong, "p q")) ++
      (26 to 50).map(i => (i.toLong, "m n m n")))
      .toDF("doc_id", "text")
    val out = TextPipeline.collocationsFrom(corpus)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    out.map(_._1) shouldBe Array("p q", "m n", "n m")
    val byBigram = out.toMap
    byBigram("p q")._4 shouldBe math.log(9.0) +- 1e-5
    byBigram("m n")._4 shouldBe math.log(4.5) +- 1e-5
    byBigram("n m")._4 shouldBe math.log(2.25) +- 1e-5
    byBigram("p q")._1 shouldBe 25L
    byBigram("m n")._2 shouldBe 50L // n_left = count of m
  }

  test("text entropy: uniform doc hits ln(k), constant doc hits 0, ttr exact") {
    val corpus = Seq(
      (1L, "a b c d"),      // uniform over 4 types: H = ln 4, norm = 1
      (2L, "x x x x"),      // constant: H = 0, n_types = 1 -> norm 0
      (3L, "a a b"))        // H = -(2/3 ln 2/3 + 1/3 ln 1/3)
      .toDF("doc_id", "text")
    val out = TextPipeline.textEntropyFrom(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    out(1L)._4 shouldBe math.log(4.0) +- 1e-5
    out(1L)._5 shouldBe 1.0 +- 1e-5
    out(2L) shouldBe ((4L, 1L, 0.25, 0.0, 0.0))
    val h3 = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    out(3L)._4 shouldBe h3 +- 1e-5
    out(3L)._1 shouldBe 3L
    out(3L)._2 shouldBe 2L
  }

  test("containment flags the asymmetric doc-inside-doc pair with direction") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = a + " lambda mu" // a's shingles are a strict subset of b's
    val corpus = Seq((1L, a), (2L, b), (3L, "totally different words here now ok"))
      .toDF("doc_id", "text")
    val out = TextPipeline.dedupContainmentFrom(corpus).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getString(5))))
      .toMap
    out.keySet shouldBe Set((1L, 2L))
    val (nCommon, contAb, contBa, dir) = out((1L, 2L))
    nCommon shouldBe 8L
    contAb shouldBe 1.0 // every shingle of the short doc is in the long one
    contBa shouldBe 0.8
    dir shouldBe "a_in_b"
  }

  test("corpus patch round-trip: v1 + patch(v1, v2) reconstructs v2 exactly") {
    val v1 = Seq((1L, "kept as is"), (2L, "will change"), (3L, "will vanish"),
      (4L, "also kept")).toDF("doc_id", "text")
    val v2 = Seq((1L, "kept as is"), (2L, "changed now"), (4L, "also kept"),
      (5L, "brand new")).toDF("doc_id", "text")
    val patch = TextPipeline.corpusPatchFrom(v1, v2)
    // the patch is delta-sized: changed + removed + added only
    patch.collect().map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
      Set((2L, "changed"), (3L, "removed"), (5L, "added"))
    val rebuilt = TextPipeline.applyCorpusPatch(v1, patch)
      .as[(Long, String)].collect().toSet
    rebuilt shouldBe v2.as[(Long, String)].collect().toSet
  }

  test("collocations: min support drops rare pairs even with high PMI") {
    // one doc "rare pair" (pmi would be huge) + filler to keep totals up
    val corpus = ((1 to 30).map(i => (i.toLong, "a b")) :+ (31L, "rare pair"))
      .toDF("doc_id", "text")
    val out = TextPipeline.collocationsFrom(corpus).collect().map(_.getString(0))
    out should contain("a b")
    out should not contain "rare pair"
  }
}
