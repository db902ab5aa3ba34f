package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{Relational, TextPipeline}
import graft.sources.Tables

/** The `spark.sql` entry point: registered views + native functions must be
  * a full equivalent of the DataFrame route — same results, same pushdown.
  */
class SqlSurfaceSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("SQL over registered views matches the DataFrame operators") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |  CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(l_discount AS DECIMAL(4,2))
        |    BETWEEN CAST(0.05 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
        |  AND l_quantity < 24""".stripMargin).collect()
    val viaDf = Relational.q6Filter(spark, sf).collect()
    viaSql.map(_.getDouble(0)).toSeq shouldBe viaDf.map(_.getDouble(0)).toSeq
  }

  test("native graft functions are callable from SQL and agree with the pipeline") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT doc_id, graft_minhash1(graft_shingle_set(text), 99) AS mh
        |FROM documents ORDER BY doc_id LIMIT 20""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    viaSql.length shouldBe 20
    // cross-check against the expression route used by dedupJaccard
    import org.apache.spark.sql.functions._
    val ve = graft.expressions.VectorExpressions
    val viaDf = Tables.documents(spark, sf)
      .select(col("doc_id"),
        ve.minHash1Native(ve.shingleSetNative(col("text")), 99).as("mh"))
      .orderBy("doc_id").limit(20)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    viaSql.toSeq shouldBe viaDf.toSeq
  }

  test("pushdown and pruning survive the view layer") {
    Tables.registerAll(spark, sf)
    val plan = spark.sql(
      "SELECT l_quantity FROM lineitem WHERE l_quantity < 5")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    plan should include("PushedFilters")
    plan should include("LessThan(l_quantity")
    """ReadSchema: struct<([^>]*)>""".r.findFirstMatchIn(plan)
      .get.group(1).split(",").length shouldBe 1
  }
}
