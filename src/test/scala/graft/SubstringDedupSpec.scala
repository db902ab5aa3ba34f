package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.SubstringDedup

/** Semantic invariants of the cross-document substring dedup (exact
  * values at the driver SFs are pinned by the DuckDB oracles; these pin
  * the semantics on corpora built to exercise each rule).
  */
class SubstringDedupSpec extends AnyFunSuite with Matchers
    with SparkTestBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def corpus(rows: (Long, String)*) =
    rows.map { case (id, text) => (id, "en", text) }
      .toDF("doc_id", "lang", "text")

  private def words(r: Range, p: String = "w"): String =
    r.map(i => s"$p$i").mkString(" ")

  test("a shared run of shingles merges into one maximal span on both documents") {
    // doc 1: 30 unique tokens with tokens 10..19 shared verbatim by doc 2
    val shared = words(0 until 10, "s")
    val c = corpus(
      1L -> s"${words(0 until 10, "a")} $shared ${words(0 until 10, "b")}",
      2L -> s"${words(0 until 10, "c")} $shared ${words(0 until 10, "d")}")
    val spans = SubstringDedup.dupSpansFrom(c, 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // the shared block spans token positions 10..19 on both docs: three
    // overlapping length-8 shingles (starts 10, 11, 12) merge into ONE
    // maximal span [10, 20)
    spans shouldBe Seq((1L, 10L, 20L, 10L), (2L, 10L, 20L, 10L))
  }

  test("within-document repetition is not flagged; cross-document is") {
    val block = words(0 until 8, "r")
    val c = corpus(
      1L -> s"$block ${words(0 until 8, "x")} $block", // self-repeat only
      2L -> words(0 until 20, "y"),
      3L -> s"${words(0 until 4, "z")} $block") // cross-doc with doc 1
    val spans = SubstringDedup.dupSpansFrom(c, 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1's two copies of the block are cross-duplicated with doc 3's
    // one copy; doc 2 (disjoint vocabulary) is untouched. Were WITHIN-doc
    // repetition counted, removing doc 3 would still flag doc 1.
    spans shouldBe Seq((1L, 0L, 8L, 8L), (1L, 16L, 24L, 8L),
      (3L, 4L, 12L, 8L))
    val withoutDoc3 = SubstringDedup.dupSpansFrom(
      c.filter($"doc_id" =!= 3L), 8)
    withoutDoc3.count() shouldBe 0L
  }

  test("documents shorter than the shingle length are never flagged") {
    val c = corpus(1L -> words(0 until 7), 2L -> words(0 until 7))
    SubstringDedup.dupSpansFrom(c, 8).count() shouldBe 0L
  }

  test("span removal keeps untouched tokens in order, digest-proven; full duplicates empty out") {
    val shared = words(0 until 10, "s")
    val c = corpus(
      1L -> s"${words(0 until 10, "a")} $shared ${words(0 until 10, "b")}",
      2L -> s"${words(0 until 10, "c")} $shared ${words(0 until 10, "d")}",
      3L -> shared, // doc 3 and 4: exact duplicates, fully removed
      4L -> shared)
    val out = SubstringDedup.substringDedupFrom(c, 8)
      .as[(Long, Long, Long, Double, String)].collect().toSeq
    out.map(r => (r._1, r._2, r._3, r._4)) shouldBe Seq(
      (1L, 30L, 20L, 0.3333), (2L, 30L, 20L, 0.3333),
      (3L, 10L, 0L, 1.0), (4L, 10L, 0L, 1.0))
    // digests are the md5 of the kept tokens space-joined in position
    // order — recomputed independently here
    val expect1 = md5Hex(s"${words(0 until 10, "a")} ${words(0 until 10, "b")}")
    val expect2 = md5Hex(s"${words(0 until 10, "c")} ${words(0 until 10, "d")}")
    out.map(_._5) shouldBe Seq(expect1, expect2, md5Hex(""), md5Hex(""))
  }

  test("overlap report counts eval shingles hit by the train side, direction-sensitive") {
    val shared = words(0 until 9, "s") // 9 tokens -> 2 shingles at L=8
    val c = corpus(
      2L -> s"$shared ${words(0 until 11, "t")}", // train (even)
      1L -> s"$shared ${words(0 until 11, "e")}", // eval (odd): 2/13 hit
      3L -> words(0 until 20, "u")) // eval, disjoint: 0/13
    val out = SubstringDedup.overlapReportFrom(c, 8)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    // eval docs only (train rows never appear); 20 tokens -> 13 shingles;
    // the 9-token shared prefix contributes its 2 shingles as hits
    out shouldBe Seq((1L, 13L, 2L, 0.1538, false), (3L, 13L, 0L, 0.0, false))
    // direction matters: overlap is measured against the TRAIN hash set,
    // so an eval-only shared block (docs 1 and 3 both odd) counts nothing
    val evalOnly = corpus(
      1L -> s"$shared ${words(0 until 11, "e")}",
      3L -> s"$shared ${words(0 until 11, "u")}")
    SubstringDedup.overlapReportFrom(evalOnly, 8)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(_._3).sum shouldBe 0L
    // the 20% bar: an eval doc that IS a train doc's prefix run is
    // contaminated (13 shingles, all hit)
    val heavy = corpus(
      2L -> words(0 until 40, "v"),
      1L -> words(0 until 20, "v"))
    SubstringDedup.overlapReportFrom(heavy, 8)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq shouldBe
      Seq((1L, 13L, 13L, 1.0, true))
  }
}
