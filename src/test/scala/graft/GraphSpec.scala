package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Graph

/** PageRank invariants the DuckDB oracle's exact replay doesn't state
  * directly: probability-mass conservation, node-universe completeness,
  * and run-to-run determinism (the per-iteration rounding contract).
  */
class GraphSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val ranks =
    Graph.pagerank(spark, sf).as[(String, Long, Double)].collect()

  test("pagerank mass sums to 1 (no dangling leakage on the symmetric graph)") {
    val mass = ranks.map(_._3).sum
    mass shouldBe 1.0 +- 1e-6
    all(ranks.map(_._3)) should be > 0.0
  }

  test("node universe = trading customers + trading suppliers, both sides present") {
    val o = graft.sources.Tables.orders(spark, sf)
    val l = graft.sources.Tables.lineitem(spark, sf)
    val nCust = o.join(l, $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey").distinct().count()
    val nSupp = l.select($"l_suppkey").distinct().count()
    ranks.count(_._1.startsWith("c")) shouldBe nCust
    ranks.count(_._1.startsWith("s")) shouldBe nSupp
  }

  test("pagerank is deterministic across runs (per-iteration rounding pins floats)") {
    val again = Graph.pagerank(spark, sf).as[(String, Long, Double)].collect()
    again shouldBe ranks
  }

  test("personalized pagerank concentrates mass near the seed set") {
    val ppr = Graph.pagerankPersonalized(spark, sf)
      .as[(String, Long, Double)].collect()
    val byNode = ppr.map(r => r._1 -> r._3).toMap
    // mass conserved (up to per-iteration rounding) and all positive
    val mass = ppr.map(_._3).sum
    mass shouldBe 1.0 +- 1e-5
    // every seed present and each outranks the global uniform share —
    // teleport returns to seeds, so they hold concentrated mass
    val uniform = 1.0 / ranks.length
    (1 to 5).foreach { i =>
      byNode(s"s$i") should be > uniform
    }
    // seed average strictly above non-seed average
    val (seed, rest) = ppr.partition(r => (1 to 5).exists(i => r._1 == s"s$i"))
    (seed.map(_._3).sum / seed.length) should be >
      (rest.map(_._3).sum / rest.length)
  }

  test("hits: sides partition by prefix, scores in (0,1], each side's max is 1") {
    val rows = Graph.hits(spark, sf).as[(String, String, Double)].collect()
    rows.filter(_._2 == "hub").map(_._1).foreach(n => n should startWith("c"))
    rows.filter(_._2 == "authority").map(_._1).foreach(n => n should startWith("s"))
    all(rows.map(_._3)) should (be > 0.0 and be <= 1.0)
    rows.filter(_._2 == "hub").map(_._3).max shouldBe 1.0
    rows.filter(_._2 == "authority").map(_._3).max shouldBe 1.0
    // node universe matches pagerank's (same trading graph, both sides)
    rows.length shouldBe ranks.length
  }

  test("hits is deterministic across runs (DECIMAL-exact sums, max norm)") {
    val a = Graph.hits(spark, sf).as[(String, String, Double)].collect()
    val b = Graph.hits(spark, sf).as[(String, String, Double)].collect()
    a shouldBe b
  }

  test("high-degree nodes outrank low-degree nodes on average") {
    val (hi, lo) = ranks.partition(_._2 >= ranks.map(_._2).sorted.apply(ranks.length / 2))
    (hi.map(_._3).sum / hi.length) should be > (lo.map(_._3).sum / lo.length)
  }

  test("components: valid partition of the thresholded node universe") {
    val rows = Graph.components(spark, sf)
      .as[(String, String, Long)].collect()
    rows.nonEmpty shouldBe true
    // a component id IS one of its member nodes (min-label), and sizes
    // agree with the actual member counts
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (cid, members) =>
      members.map(_._1) should contain(cid)
      // min-label: the id is the smallest member
      members.map(_._1).min shouldBe cid
      members.foreach(_._3 shouldBe members.length.toLong)
    }
    // every labeled node appears exactly once
    rows.map(_._1).distinct.length shouldBe rows.length
    // two nodes sharing an edge share a component (spot-check via the
    // thresholded pair list itself)
    val o = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey")
    val l = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_suppkey")
    val pairs = o.join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy(concat(lit("c"), $"o_custkey").as("a"),
        concat(lit("s"), $"l_suppkey").as("b"))
      .agg(count(lit(1)).as("n")).filter($"n" >= 4)
      .select($"a", $"b").as[(String, String)].collect()
    val label = rows.map(r => r._1 -> r._2).toMap
    pairs.foreach { case (a, b) => label(a) shouldBe label(b) }
  }
}
