package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.WordPieceTrainer

/** WordPiece likelihood-merge learning: the merge sequence on a crafted
  * corpus is hand-computable AND differs from BPE's on the same corpus
  * (the likelihood ratio prefers rare-symbol fusions), the hybrid's two
  * engines agree byte-for-byte, the frozen release is provenance-pinned,
  * and greedy longest-match inference round-trips.
  */
class WordPieceTrainerSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  import spark.implicits._

  test("learns the hand-computed likelihood sequence on a crafted corpus") {
    // vocab: aaab x2 -> [a,##a,##a,##b], ab x1 -> [a,##b]
    // r1: uni a:3 ##a:4 ##b:3; pairs (a,##a):2 (##a,##a):2 (##a,##b):2
    //     (a,##b):1; scores 2/12, 2/16, 2/12, 1/9 — tie 2/12 breaks to
    //     the UTF-8-smaller sym_a '##a' => (##a,##b) -> ##ab   [BPE would
    //     have merged (a,a) here — the family difference, measured]
    // r2: aaab=[a,##a,##ab]; (##a,##ab): 2/(2*2) wins       -> ##aab
    // r3: aaab=[a,##aab]; (a,##aab) ties (a,##b) at 1/3, smaller sym_b
    //     wins                                               -> aaab
    // r4: only (a,##b):1 in 'ab'                             -> ab
    val corpus = Seq("aaab aaab ab").toDF("text")
    val merges = WordPieceTrainer
      .wordpieceMergesFrom(spark, corpus, nMerges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    merges shouldBe Seq(
      (1L, "##a", "##b", "##ab", 2L, 4L, 3L),
      (2L, "##a", "##ab", "##aab", 2L, 2L, 2L),
      (3L, "a", "##aab", "aaab", 2L, 3L, 2L),
      (4L, "a", "##b", "ab", 1L, 1L, 1L))
  }

  test("local and distributed merge loops learn the byte-identical sequence") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(120)
    val local = WordPieceTrainer
      .wordpieceMergesFrom(spark, corpus, nMerges = 30)
      .collect().map(_.toSeq).toSeq
    val dist = WordPieceTrainer
      .wordpieceMergesDistributedFrom(spark, corpus, nMerges = 30)
      .collect().map(_.toSeq).toSeq
    local shouldBe dist
  }

  test("FrozenPieces is exactly the release on its provenance corpus") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    WordPieceTrainer.FrozenPieces shouldBe
      WordPieceTrainer.releasedPieces(spark, corpus,
        WordPieceTrainer.FrozenMergeCount)
  }

  test("releasedPieces' driver fetch is bounded: the over-limit fallback " +
      "releases the identical vocabulary") {
    // the BpeTrainer hybrid guard applied to the release path: with a
    // localVocabLimit below the corpus vocab size, the merges must come
    // from the distributed loop and the alphabet from a distinct-symbol
    // agg — bounded fetches — and the released list must be IDENTICAL
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(120)
    val local = WordPieceTrainer.releasedPieces(spark, corpus,
      WordPieceTrainer.FrozenMergeCount)
    val forcedDistributed = WordPieceTrainer.releasedPieces(spark, corpus,
      WordPieceTrainer.FrozenMergeCount, localVocabLimit = 1L)
    forcedDistributed shouldBe local
  }

  test("the ## marker is unambiguous: no corpus text contains a literal #") {
    // greedyEncode and the oracle classify pieces by the ## prefix; a
    // corpus '#' could mint a plain piece that reads as a continuation
    for (sf <- Seq("0.001", "0.01")) {
      spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
        .filter(col("text").contains("#")).count() shouldBe 0L
    }
  }

  test("greedy inference round-trips and covers the provenance corpus") {
    val pieces = WordPieceTrainer.FrozenPieces.toSet
    val words = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .distinct().as[String].collect()
    words should not be empty
    words.foreach { w =>
      val segs = WordPieceTrainer.greedyEncode(w, pieces)
      withClue(s"word '$w': ") {
        // the frozen alphabet comes FROM this corpus, so every word
        // segments (worst case: char-by-char), and greedy matches are
        // exact substrings, so concatenation is lossless structurally —
        // both invariants measured here, not assumed
        segs should not be empty
        segs.map(s => if (s.startsWith("##")) s.substring(2) else s)
          .mkString("") shouldBe w
        // first piece plain, rest continuation-marked
        segs.head should not startWith "##"
        segs.tail.foreach(_ should startWith("##"))
      }
    }
  }

  test("merged pieces strip the inner continuation mark") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = WordPieceTrainer
      .wordpieceMergesFrom(spark, corpus,
        nMerges = WordPieceTrainer.FrozenMergeCount).collect()
    merges.foreach { r =>
      val (a, b, m) = (r.getString(1), r.getString(2), r.getString(3))
      m shouldBe a + (if (b.startsWith("##")) b.substring(2) else b)
      m should not include "####"
    }
  }
}
