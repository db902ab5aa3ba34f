package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.BpeTrainer

/** BPE merge learning: the merge sequence on a crafted corpus is
  * hand-computable, ties break deterministically, and the apply side
  * (encode) round-trips — every learned merge strictly shrinks the symbol
  * count of some word, and concatenating a word's encoded symbols
  * reconstructs the word.
  */
class BpeTrainerSpec extends AnyFunSuite with Matchers with SparkTestBase {

  import spark.implicits._

  test("learns the classic merge sequence on a crafted corpus") {
    // vocab: aaab x2, ab x1 (chars: [a,a,a,b] / [a,b])
    // round 1: pairs (a,a)->4 (two per aaab occurrence), (a,b)->3  => (a,a)
    // round 2: aaab=[aa,a,b], ab=[a,b]: (aa,a)->2, (a,b)->3        => (a,b)
    // round 3: aaab=[aa,ab], ab=[ab]:   (aa,ab)->2                 => (aa,ab)
    val corpus = Seq("aaab aaab ab").toDF("text")
    val merges = BpeTrainer.bpeMergesFrom(spark, corpus, nMerges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    merges shouldBe Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 2L))
    // nMerges=5 requested but the pair supply is exhausted after 3: the
    // trainer stops instead of looping on nothing
  }

  test("ties break on (count desc, sym_a, sym_b) so the sequence is unique") {
    // "xy" and "yz" pair counts tie at 2; (x,y) < (y,z) lexicographically
    val corpus = Seq("xy xy yz yz").toDF("text")
    val first = BpeTrainer.bpeMergesFrom(spark, corpus, nMerges = 1)
      .collect().head
    (first.getString(1), first.getString(2)) shouldBe ("x", "y")
  }

  test("encode round-trips: symbols concatenate back to the word and shrink monotonically") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val merges = BpeTrainer.bpeMergesFrom(spark, corpus, nMerges = 8)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    merges.length shouldBe 8
    val enc = BpeTrainer.bpeEncode(spark, corpus, merges).collect()
    enc.foreach { r =>
      val word = r.getString(0)
      val syms = r.getAs[scala.collection.Seq[String]]("syms")
      syms.mkString("") shouldBe word          // lossless
      r.getAs[Long]("n_symbols") should be <= word.length.toLong // compression
    }
    // the learned merges actually compress: total symbols < total chars
    val totalSyms = enc.map(_.getAs[Long]("n_symbols")).sum
    val totalChars = enc.map(_.getString(0).length.toLong).sum
    totalSyms should be < totalChars
  }
}
