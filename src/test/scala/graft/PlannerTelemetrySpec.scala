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

  // ---- round 11: the telemetry→ACTION loop — each advisor rung is
  // pinned to the engine behavior it prescribes, so the advisor cannot
  // drift from the engine it describes ----

  test("broadcast_smaller advice ⇒ the executed canonical join plans a BroadcastHashJoin") {
    import org.apache.spark.sql.functions.col
    val adv = PlannerTelemetry.planAdvisor(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    val joins = Map(
      "orders*lineitem.orderkey" -> (() => Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))),
      "customer*orders.custkey" -> (() => Tables.customer(spark, sf)
        .join(Tables.orders(spark, sf),
          col("c_custkey") === col("o_custkey"))),
      "part*lineitem.partkey" -> (() => Tables.part(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("p_partkey") === col("l_partkey"))))
    // at sf0.001 every canonical axis IS advised broadcast (asserted in
    // the ladder test above) — so each must actually plan one
    joins.foreach { case (axis, mk) =>
      adv(axis) shouldBe "broadcast_smaller"
      val plan = mk().queryExecution.executedPlan.toString
      withClue(s"$axis advised broadcast_smaller but planned: ") {
        plan should include("BroadcastHashJoin")
      }
    }
  }

  test("salt_hot_keys advice fires exactly where the engine's auto-salting gate fires") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one key holding 3/4 of each side, sides past the broadcast budget:
    // max_key_rows·5 > join_rows and min(n)·> 100k ⇒ the salt rung
    val mkSide = (n: Long) => spark.range(n)
      .select(when(col("id") < n * 3 / 4, lit("hot"))
        .otherwise(col("id").cast("string")).as("k"),
        col("id").as("v"))
    val l = mkSide(120000L).localCheckpoint()
    val r = mkSide(120000L).localCheckpoint()
    val adv = PlannerTelemetry.planAdvisorFrom(Seq(
      PlannerTelemetry.JoinAxis("skewed", l, "k", r, "k")))
      .collect().head.getString(5)
    adv shouldBe "salt_hot_keys"
    // the engine's salting remedy keys off the same dominance: the
    // skewProbe gate behind salted_auto engages on this distribution
    // (Relational.saltedCountsAuto picks the salted two-phase plan
    // whenever the probed top-key share exceeds 1/2)
    graft.operators.Relational.skewProbe(l, "k") should be > 0.5
    // and a benign near-uniform axis of the same size draws NEITHER the
    // advice nor the gate
    val u = spark.range(120000L)
      .select(col("id").cast("string").as("k"), col("id").as("v"))
      .localCheckpoint()
    PlannerTelemetry.planAdvisorFrom(Seq(
      PlannerTelemetry.JoinAxis("uniform", u, "k", u, "k")))
      .collect().head.getString(5) shouldBe "shuffle_hash"
    graft.operators.Relational.skewProbe(u, "k") should be <= 0.5
  }

  test("pre_aggregate advice ⇒ the pushed-down agg answers identically while moving n_keys rows, not join_rows") {
    import org.apache.spark.sql.functions._
    // 120k×120k rows, 12k keys, 10 rows per key per side: join_rows =
    // 12k·100 = 1.2M > 4·240k, no key holds 1/5 ⇒ pre_aggregate
    val mkSide = (tag: String) => spark.range(120000L)
      .select((col("id") % 12000).cast("string").as("k"),
        lit(1L).as(s"v_$tag")).localCheckpoint()
    val l = mkSide("l")
    val r = mkSide("r")
    val card = PlannerTelemetry.joinCardinalityFrom(Seq(
      PlannerTelemetry.JoinAxis("fanout", l, "k", r, "k"))).collect().head
    card.getAs[Long]("join_rows") shouldBe 1200000L
    PlannerTelemetry.planAdvisorFrom(Seq(
      PlannerTelemetry.JoinAxis("fanout", l, "k", r, "k")))
      .collect().head.getString(5) shouldBe "pre_aggregate"
    // the prescribed action: aggregate BEFORE the join. Same answer,
    // and the join's inputs collapse from 240k rows to 2·n_keys rows —
    // exactly what the advice's exact counts promised
    val naive = l.join(r, "k").groupBy("k")
      .agg(sum(col("v_l") * col("v_r")).as("s"))
    val pushed = l.groupBy("k").agg(sum(col("v_l")).as("sl"))
      .join(r.groupBy("k").agg(sum(col("v_r")).as("sr")), "k")
      .select(col("k"), (col("sl") * col("sr")).as("s"))
    naive.orderBy("k").collect() shouldBe pushed.orderBy("k").collect()
    pushed.queryExecution.optimizedPlan.stats.rowCount
      .foreach(_.toLong should be <= 12000L)
  }

  test("layout_advisor's file counts match an actual advised write") {
    import org.apache.spark.sql.functions._
    val advice = PlannerTelemetry.layoutAdvisor(spark, sf).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_files"))).toMap
    // cross-check the counts against the actual split assignment
    val bucket = graft.operators.TextPipeline.hashBucket("split:")
    val actual = Tables.documents(spark, sf)
      .select(when(bucket < 90, "train").when(bucket < 95, "val")
        .otherwise("test").as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    advice.foreach { case (split, (nRows, _)) =>
      nRows shouldBe actual(split)
    }
    // the prescribed action: repartition(n_files) before the write
    // produces exactly n_files part files
    val (trainRows, trainFiles) = advice("train")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-layout").toString
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"), bucket.as("b"))
      .filter(when(col("b") < 90, "train").when(col("b") < 95, "val")
        .otherwise("test") === "train")
      .repartition(trainFiles.toInt)
      .write.mode("overwrite").parquet(dir)
    val parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
    parts shouldBe trainFiles.toInt
    spark.read.parquet(dir).count() shouldBe trainRows
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
