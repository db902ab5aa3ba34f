package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextPipeline

/** Semantics + plan shape of the cross-run (delta vs corpus-index) dedup —
  * the production daily-ingest shape the whole-corpus pair queries don't
  * cover. The hash-level contract is pinned by the dedup_incremental
  * oracle; these are the crafted-case and scan-shape invariants.
  */
class IncrementalDedupSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  import spark.implicits._

  private def mk(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val base = (1 to 40).map(i => s"w$i").mkString(" ")

  test("exact copy, near-dup, and novel delta docs are classified correctly") {
    val corpus = mk(
      1L -> base,
      2L -> (101 to 140).map(i => s"x$i").mkString(" "))
    val delta = mk(
      10L -> base, // identical to corpus doc 1
      11L -> ((1 to 39).map(i => s"w$i").mkString(" ") + " w99"), // near-dup of 1
      12L -> (201 to 240).map(i => s"z$i").mkString(" ")) // novel
    val got = TextPipeline.dedupIncrementalFrom(spark, corpus, delta)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getBoolean(3))).toMap
    got(10L) shouldBe ((true, 1L, false)) // exact AND trivially near
    got(11L)._1 shouldBe false
    got(11L)._2 should be >= 1L
    got(11L)._3 shouldBe false
    got(12L) shouldBe ((false, 0L, true))
  }

  test("a delta-internal duplicate is NOT flagged (the index is the corpus, not the day)") {
    val corpus = mk(1L -> (101 to 140).map(i => s"x$i").mkString(" "))
    val delta = mk(10L -> base, 11L -> base)
    val got = TextPipeline.dedupIncrementalFrom(spark, corpus, delta)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    got(10L) shouldBe true
    got(11L) shouldBe true
  }

  test("the demo entry equals the explicit split it documents") {
    val sf = "/root/testdata/sf0.001"
    val a = TextPipeline.dedupIncremental(spark, sf).collect().toSeq
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val bucket = org.apache.spark.sql.functions.expr(
      """CAST(conv(substring(md5(concat('inc:', doc_id)), 1, 4), 16, 10) AS BIGINT) % 100""")
    val b = TextPipeline.dedupIncrementalFrom(spark,
      docsDf.filter(bucket >= 10).select($"doc_id", $"text"),
      docsDf.filter(bucket < 10).select($"doc_id", $"text"))
      .collect().toSeq
    a shouldBe b
  }

  test("each side's text is scanned a bounded number of times (fenced prep, keyed joins)") {
    // separate physical sources so the plan attributes scans to a side; the
    // delta (the day's shard) must not be re-scanned per use of its prep
    // table beyond the documented fence branches, and there must be no
    // corpus-x-corpus pair generation anywhere
    val dir = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val sf = "/root/testdata/sf0.001"
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    docsDf.filter($"doc_id" % 5 === 0).write.parquet(s"$dir/delta")
    docsDf.filter($"doc_id" % 5 =!= 0).write.parquet(s"$dir/corpus")
    val plan = TextPipeline.dedupIncrementalFrom(spark,
      spark.read.parquet(s"$dir/corpus"), spark.read.parquet(s"$dir/delta"))
      .queryExecution.explainString(FormattedMode)
    def scansOf(path: String): Int =
      s"""(?s)Location: [^\\n]*$path""".r.findAllIn(plan).size
    withClue(plan.linesIterator.filter(_.contains("Location")).mkString("\n")) {
      scansOf("delta") should be <= 3 // bands + verify-s + skeleton-h branches
      scansOf("corpus") should be <= 3
    }
    plan should not include "CartesianProduct"
  }
}
