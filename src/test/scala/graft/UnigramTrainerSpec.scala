package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.UnigramTrainer

/** The unigram-LM tokenizer trainer: Viterbi determinism (score max +
  * lexicographic tie-break), training invariants on a tiny corpus, and
  * the vocab/coverage query shapes. The cross-engine contract itself is
  * oracle-checked (generated recursive-CTE replay); these specs pin the
  * Scala-side semantics the oracle generation assumes.
  */
class UnigramTrainerSpec extends AnyFunSuite with SparkTestBase
    with Matchers {

  test("viterbi maximizes the integer score sum") {
    // "abc": pieces a,b,c (score -10 each), ab (-12), bc (-25).
    // ab+c = -22 beats a+b+c = -30 and a+bc = -35.
    val lp = Map("a" -> -10L, "b" -> -10L, "c" -> -10L,
      "ab" -> -12L, "bc" -> -25L)
    UnigramTrainer.viterbi("abc", lp) shouldBe List("ab", "c")
  }

  test("viterbi breaks exact score ties by the smaller joined segs string") {
    // "ab" as [ab] (score -20) vs [a, b] (-10 + -10 = -20): exact tie.
    // Joined strings: "ab" vs "ab";  < 'b', so the split
    // segmentation sorts first — the DuckDB `ORDER BY score DESC, segs`
    // row_number pick.
    val lp = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    UnigramTrainer.viterbi("ab", lp) shouldBe List("a", "b")
  }

  test("viterbi returns empty for unsegmentable words") {
    UnigramTrainer.viterbi("xy", Map("x" -> -1L)) shouldBe Nil
  }

  test("training invariants on a tiny corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "a cat sat"))
      .toDF("doc_id", "text")
    val t = UnigramTrainer.trainOn(spark, corpus)
    // release contract: every MULTI piece has positive final usage;
    // single chars always release (segmentability guarantee), possibly
    // with zero usage; micro-logs are negative
    t.released.foreach { case (p, c) =>
      if (p.length >= 2) c should be > 0L else c should be >= 0L
    }
    // every corpus character is released as a single
    Seq("the", "cat", "sat", "ran", "a").flatMap(_.toSeq).distinct
      .foreach(ch => t.released.keySet should contain(ch.toString))
    t.released.keySet shouldBe t.lpFinal.keySet
    t.lpFinal.values.foreach(_ should be < 0L)
    // released vocab segments every corpus word (all single chars
    // release, so every alphabet word keeps a path; the final
    // re-estimation makes cnt the true usage under lpFinal)
    val words = Seq("the", "cat", "sat", "ran", "a")
    words.foreach { w =>
      val segs = UnigramTrainer.viterbi(w, t.lpFinal)
      segs.mkString("") shouldBe w
      segs.foreach(p => t.released.keySet should contain(p))
    }
    // usage accounting: summed piece usage == freq-weighted path lengths
    val freqs = Map("the" -> 2L, "cat" -> 3L, "sat" -> 2L,
      "ran" -> 1L, "a" -> 1L)
    val expected = freqs.map { case (w, f) =>
      f * UnigramTrainer.viterbi(w, t.lpFinal).length
    }.sum
    t.released.values.sum shouldBe expected
  }

  test("FrozenVocab provenance: the sf0.001 trainer reproduces it exactly") {
    val t = UnigramTrainer.trainOn(spark,
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
    val trained = t.released.keys.toSeq.sorted
      .map(p => (p, t.lpFinal(p)))
    trained shouldBe UnigramTrainer.FrozenVocab
  }

  test("frozen pricing covers every sf0.001 word; budget rows obey the cut") {
    val corpus = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val syms = UnigramTrainer.unigramWordSymbols(corpus)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import spark.implicits._
    val words = corpus
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("w"))
      .filter(org.apache.spark.sql.functions.length($"w") > 0)
      .distinct().as[String].collect()
    words.foreach(w => syms.keySet should contain(w))
    val out = UnigramTrainer
      .tokenBudgetSampleUnigram(spark, "/root/testdata/sf0.001", 500L)
      .collect()
    out.foreach(_.getAs[Long]("start_offset") should be < 500L)
  }

  test("unigram_vocab and unigram_coverage shapes on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val vocab = UnigramTrainer.unigramVocab(spark, sf).collect()
    vocab.length should be > 0
    // column contract the oracle compares on
    vocab.head.schema.fieldNames shouldBe
      Array("piece", "n_chars", "cnt", "lp_micro")
    // pieces are unique and sorted
    val pieces = vocab.map(_.getString(0)).toSeq
    pieces.distinct.length shouldBe pieces.length
    val cov = UnigramTrainer.unigramCoverage(spark, sf).collect()
    cov.length should be > 0
    cov.foreach { r =>
      r.getAs[Long]("uni_tokens") should be >= r.getAs[Long]("n_words")
      r.getAs[Long]("bpe_tokens") should be >= r.getAs[Long]("n_words")
    }
  }
}
