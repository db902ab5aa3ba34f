package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{Sketches, TextPipeline}

/** Semantic invariants of the cardinality sketch and the temperature
  * resampler (exact values are pinned by their DuckDB oracles; these are
  * the properties the hash compare can't express).
  */
class SketchesSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("HLL estimate is duplication-invariant and inside the error envelope") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
    val once = Sketches.hllDistinctTokensFrom(corpus)
      .select($"lang", $"hll_distinct", $"exact_distinct")
      .as[(String, Double, Long)].collect().toSeq.sorted
    once.nonEmpty shouldBe true
    // duplicating every document changes NO register (same tokens -> same
    // hashes), so the sketch — and the exact count — are unchanged; this
    // is the property that makes the sketch safe to run pre-dedup
    val doubled = Sketches.hllDistinctTokensFrom(
      corpus.unionByName(corpus.withColumn("doc_id", $"doc_id" + 1000000L)))
      .select($"lang", $"hll_distinct", $"exact_distinct")
      .as[(String, Double, Long)].collect().toSeq.sorted
    doubled shouldBe once
    // m=256 gives sigma = 1.04/sqrt(256) = 6.5%; 3 sigma is the sanity
    // fence (the oracle pins the exact figure)
    once.foreach { case (lang, est, exact) =>
      withClue(s"$lang: ") {
        math.abs(est - exact) / exact.toDouble should be <= 0.20
      }
    }
  }

  test("temperature resampling admits min(target, n_docs) per language, ranks dense") {
    val out = TextPipeline.temperatureSample(spark, sf)
      .select($"lang", $"rk", $"target")
      .as[(String, Long, Long)].collect().toSeq
    val nDocs = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val target = rows.head._3
      withClue(s"$lang: ") {
        rows.length.toLong shouldBe math.min(target, nDocs(lang))
        rows.map(_._2).sorted shouldBe (1L to rows.length).toSeq
      }
    }
    // alpha < 1 flattens the distribution: every language's admitted
    // share of its own corpus is at least the head language's share
    // (tail languages are upweighted relative to their natural share)
    val shares = out.groupBy(_._1).map { case (lang, rows) =>
      lang -> rows.length.toDouble / nDocs(lang) }
    val head = nDocs.maxBy(_._2)._1
    shares.values.foreach(_ should be >= shares(head) - 1e-9)
  }
}
