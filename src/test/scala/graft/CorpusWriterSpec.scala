package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextPipeline
import graft.sources.CorpusWriter

/** The write path: directory-partitioned layout (pruning + in-file order +
  * no small-file spray) and bucketed layout (zero-exchange co-located
  * joins — the one-time layout cost that deletes the recurring shuffle).
  */
class CorpusWriterSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("partitioned write: pruned directories, sorted files, exact roundtrip") {
    val out = Files.createTempDirectory("graft_part_").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val labeled = docs.join(
      TextPipeline.splitTrain(spark, sf).select("doc_id", "split"), "doc_id")

    CorpusWriter.writePartitioned(labeled, out, Seq("split"), "doc_id")

    // hive-style dirs per split value
    Seq("train", "val", "test").foreach { s =>
      withClue(s"split=$s: ") {
        Files.exists(Paths.get(out, s"split=$s")) shouldBe true
      }
    }
    // roundtrip: same rows
    val back = spark.read.parquet(out)
    back.count() shouldBe labeled.count()
    back.agg(sum("doc_id")).collect()(0).getLong(0) shouldBe
      labeled.agg(sum("doc_id")).collect()(0).getLong(0)
    // one file per partition dir (no per-task small-file spray), sorted rows
    Seq("train", "val", "test").foreach { s =>
      val files = Files.list(Paths.get(out, s"split=$s")).toArray
        .map(_.toString).filter(_.endsWith(".parquet"))
      withClue(s"split=$s: ") {
        files.length shouldBe 1
        val ids = spark.read.parquet(files.head)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        ids shouldBe ids.sorted
      }
    }
  }

  test("bucketed tables join with zero exchanges") {
    val base = Files.createTempDirectory("graft_bucket_").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    CorpusWriter.writeBucketed(docs, "graft_bk_a", s"$base/a", "doc_id", 4)
    CorpusWriter.writeBucketed(docs.withColumn("flag", col("doc_id") % 2),
      "graft_bk_b", s"$base/b", "doc_id", 4)
    // disable broadcast so the assertion exercises the bucketed sort-merge
    // path (a broadcast join has no exchange either, proving nothing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bk_a")
        .join(spark.table("graft_bk_b"), "doc_id")
      joined.count() shouldBe docs.count()
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        "Exchange".r.findAllIn(plan).size shouldBe 0
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bk_a")
      spark.sql("DROP TABLE IF EXISTS graft_bk_b")
    }
  }
}
