package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Relational

/** Structural invariants of the warehouse-maintenance operators that the
  * DuckDB value replay doesn't state directly — interval tiling, single
  * open row, change minimality.
  */
class WarehouseOpsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("scd2: intervals tile per customer, one open row, no no-op changes") {
    val rows = Relational.scd2History(spark, sf)
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Long, Boolean)]
      .collect()
    rows.groupBy(_._1).foreach { case (cust, hist) =>
      withClue(s"cust $cust: ") {
        val sorted = hist.sortBy(_._5)
        // versions dense from 1
        sorted.map(_._5) shouldBe (1L to hist.length)
        // exactly one open (is_current) interval, and it is the last
        sorted.count(_._6) shouldBe 1
        sorted.last._6 shouldBe true
        sorted.last._4 shouldBe None
        // closed intervals tile: valid_to == next valid_from
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            a._4 shouldBe Some(b._3)
            // adjacent versions always differ in status (change rows only)
            a._2 should not be b._2
          case _ =>
        }
      }
    }
    rows.length should be > 0
  }

  test("transition probabilities are a stochastic matrix over observed froms") {
    val rows = Relational.eventTransitions(spark, sf)
      .as[(String, String, Long, Double)].collect()
    rows.map(_._3).foreach(_ should be > 0L)
    rows.groupBy(_._1).foreach { case (from, tos) =>
      withClue(s"$from: ") {
        tos.map(_._4).sum shouldBe 1.0 +- 0.001
      }
    }
    rows.map(_._1).distinct.length shouldBe 5 // every event type transitions
  }

  test("rolling 7-day uniques dominate the daily uniques and match a hand recompute") {
    val wau = Relational.rollingDistinctUsers(spark, sf)
      .as[(java.sql.Date, Long)].collect().toMap
    val ud = graft.sources.Tables.events(spark, sf)
      .select($"user_id", org.apache.spark.sql.functions.to_date($"ts").as("d"))
      .distinct().as[(Long, java.sql.Date)].collect()
    val daily = ud.groupBy(_._2).map { case (d, us) => d -> us.map(_._1).toSet }
    wau.foreach { case (day, n) =>
      val expect = daily.filter { case (d, _) =>
        !d.after(day) && d.toLocalDate.plusDays(6).compareTo(day.toLocalDate) >= 0
      }.values.flatten.toSet.size
      withClue(s"$day: ") { n shouldBe expect.toLong }
    }
    // rolling uniques never below the day's own uniques
    daily.foreach { case (d, us) => wau(d) should be >= us.size.toLong }
  }

  test("skew probe separates dominated from uniform keys; both agg paths agree") {
    val skewed = ((1 to 900).map(i => (i.toLong, "hot")) ++
      (1 to 100).map(i => (i.toLong + 900, s"k${i % 10}")))
      .toDF("event_id", "event_type")
    Relational.skewProbe(skewed, "event_type") should be > 0.5
    val uniform = (1 to 1000).map(i => (i.toLong, s"k${i % 10}"))
      .toDF("event_id", "event_type")
    Relational.skewProbe(uniform, "event_type") should be < 0.3
    // the plan choice never changes the answer
    Relational.saltedCountsAuto(spark, sf).collect() shouldBe
      Relational.saltedEventCounts(spark, sf).collect()
  }

  test("funnel stages are monotone non-increasing and rates consistent") {
    val rows = Relational.eventFunnel(spark, sf)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    rows.map(_._2) shouldBe
      Array("view", "click_after_view", "purchase_after_click")
    val ns = rows.map(_._3)
    ns(0) should be >= ns(1)
    ns(1) should be >= ns(2)
    ns(0) should be > 0L
    rows(0)._4 shouldBe 1.0
    rows(1)._4 shouldBe
      (math.floor(ns(1).toDouble / ns(0) * 10000 + 0.5) / 10000)
    rows(2)._4 shouldBe
      (math.floor(ns(2).toDouble / ns(1) * 10000 + 0.5) / 10000)
  }
}
