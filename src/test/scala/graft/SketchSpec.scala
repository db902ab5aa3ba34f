package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TextPipeline
import graft.sources.Tables

/** The approximate twins the exact operators swap to at 100 TB —
  * approx_count_distinct (HLL++) for corpusDistinct and approx_percentile
  * for statsQuantiles — pinned to their error envelopes against the exact
  * answers, so the swap is a measured decision, not a hope.
  */
class SketchSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct stays inside the HLL error envelope per language") {
    val exact = TextPipeline.corpusDistinct(spark, sf)
      .select("lang", "distinct_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang")
      .agg(approx_count_distinct(col("token"), 0.02).as("apx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, ex) =>
      val err = math.abs(approx(lang) - ex).toDouble / ex
      withClue(s"$lang: exact=$ex approx=${approx(lang)}: ") {
        err should be < 0.1 // rsd 0.02, wide margin for small cardinalities
      }
    }
  }

  test("approx_percentile brackets the exact per-key percentiles") {
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, ex) =>
      withClue(s"$k: exact=$ex approx=${approx(k)}: ") {
        math.abs(approx(k) - ex) / math.max(math.abs(ex), 1e-9) should be < 0.05
      }
    }
  }
}
