package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.PlannerTelemetry
import graft.sources.Tables

/** The planner telemetry must be TRUE, not just deterministic: the
  * join-cardinality report is checked against the actually-executed
  * joins (exact row counts), and the skew report against directly
  * computed key frequencies — at sf0.001, where running the joins it
  * predicts is still cheap.
  */
class PlannerTelemetrySpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("join_cardinality equals the executed joins' exact row counts") {
    val rows = PlannerTelemetry.joinCardinality(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap

    val ol = Tables.orders(spark, sf).join(
      Tables.lineitem(spark, sf),
      org.apache.spark.sql.functions.col("o_orderkey") ===
        org.apache.spark.sql.functions.col("l_orderkey")).count()
    rows("orders*lineitem.orderkey").getAs[Long]("join_rows") shouldBe ol

    val dd = {
      val d = Tables.documents(spark, sf).select("lang")
      d.as("a").join(d.as("b"), "lang").count()
    }
    rows("documents*documents.lang").getAs[Long]("join_rows") shouldBe dd

    // the self-join axes must also satisfy join_rows >= n_left (every
    // row matches at least itself through its key's block)
    val selfAxis = rows("events*events.user_id")
    selfAxis.getAs[Long]("join_rows") should be >=
      selfAxis.getAs[Long]("n_left")
  }

  test("plan_advisor applies the documented rule ladder to the " +
    "cardinality rows") {
    val jc = PlannerTelemetry.joinCardinality(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val adv = PlannerTelemetry.planAdvisor(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    adv.keySet shouldBe jc.keySet
    jc.foreach { case (axis, r) =>
      val (nl, nr, jr, mk) = (r.getAs[Long]("n_left"),
        r.getAs[Long]("n_right"), r.getAs[Long]("join_rows"),
        r.getAs[Long]("max_key_rows"))
      val want =
        if (math.min(nl, nr) <= 100000L) "broadcast_smaller"
        else if (mk * 5 > jr) "salt_hot_keys"
        else if (jr > (nl + nr) * 4) "pre_aggregate"
        else "shuffle_hash"
      adv(axis) shouldBe want
    }
    // at test SFs every side fits the broadcast budget — the ladder's
    // first rung must fire everywhere
    adv.values.toSet shouldBe Set("broadcast_smaller")
  }

  test("skew report matches directly computed key frequencies") {
    val rows = PlannerTelemetry.skewReport(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.size shouldBe 6

    val lang = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(_.getLong(1))
    val r = rows("documents.lang")
    r.getAs[Long]("n_rows") shouldBe lang.sum
    r.getAs[Long]("n_keys") shouldBe lang.length
    r.getAs[Long]("top1_cnt") shouldBe lang.max
    r.getAs[Long]("top1_share_q6") shouldBe
      math.floor(lang.max.toDouble / lang.sum * 1000000d + 0.5d).toLong
    r.getAs[Long]("skew_factor_q2") shouldBe
      math.floor(lang.max.toDouble * lang.length / lang.sum * 100d
        + 0.5d).toLong

    // a second axis cross-checked directly (the near-uniform key case)
    val ok = Tables.lineitem(spark, sf).groupBy("l_orderkey").count()
      .collect().map(_.getLong(1))
    rows("lineitem.l_orderkey").getAs[Long]("top1_cnt") shouldBe ok.max
    rows("lineitem.l_orderkey").getAs[Long]("n_keys") shouldBe ok.length
  }
}
