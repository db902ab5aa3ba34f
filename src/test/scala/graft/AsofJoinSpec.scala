package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.AsofJoin

/** As-of join semantics on a hand-built frame: inclusive tie at equal ts,
  * null before any match, latest-prior selection, key isolation.
  */
class AsofJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(s * 1000L)

  test("asof join picks the latest right row at or before each left ts, per key") {
    val left = Seq(
      (1L, "a", ts(5)), (2L, "a", ts(10)), (3L, "a", ts(20)),
      (4L, "b", ts(10)), (5L, "b", ts(3)))
      .toDF("id", "k", "ts")
    val right = Seq(
      ("a", ts(4), 40.0), ("a", ts(10), 100.0), ("a", ts(15), 150.0),
      ("b", ts(9), 90.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asof(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[Double])]
      .collect().toMap
    out(1L) shouldBe Some(40.0)   // prior row
    out(2L) shouldBe Some(100.0)  // inclusive tie at equal ts
    out(3L) shouldBe Some(150.0)  // latest prior among several
    out(4L) shouldBe Some(90.0)   // key-isolated
    out(5L) shouldBe None         // before any right row
  }

  test("forward asof picks the earliest right row at or after each left ts, per key") {
    val left = Seq(
      (1L, "a", ts(5)), (2L, "a", ts(10)), (3L, "a", ts(20)),
      (4L, "b", ts(2)), (5L, "b", ts(10)))
      .toDF("id", "k", "ts")
    val right = Seq(
      ("a", ts(4), 40.0), ("a", ts(10), 100.0), ("a", ts(15), 150.0),
      ("b", ts(9), 90.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asofForward(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[Double])]
      .collect().toMap
    out(1L) shouldBe Some(100.0)  // next row strictly after
    out(2L) shouldBe Some(100.0)  // inclusive tie at equal ts
    out(3L) shouldBe None         // after every right row
    out(4L) shouldBe Some(90.0)   // key-isolated
    out(5L) shouldBe None         // b has nothing at or after 10
  }

  test("duplicate (key, ts) right rows resolve deterministically: greatest value backward, least forward") {
    // the documented tertiary sort on the carried value tuple: with
    // several right rows sharing (key, ts), `last` over the
    // value-ascending window picks the GREATEST tuple (backward) and
    // `first` the LEAST (forward) — a total, repartition-stable pick
    // instead of whichever row the shuffle happened to order last
    val left = Seq((1L, "a", ts(10)), (2L, "a", ts(12))).toDF("id", "k", "ts")
    val right = Seq(
      ("a", ts(10), 7.0), ("a", ts(10), 3.0), ("a", ts(10), 9.0),
      ("a", ts(12), 2.0), ("a", ts(12), 5.0))
      .toDF("k", "ts", "v")
    val back = AsofJoin.asof(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[Double])].collect().toMap
    back(1L) shouldBe Some(9.0)  // greatest among the ts(10) ties
    back(2L) shouldBe Some(5.0)  // greatest among the ts(12) ties
    val fwd = AsofJoin.asofForward(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[Double])].collect().toMap
    fwd(1L) shouldBe Some(3.0)   // least among the ts(10) ties
    fwd(2L) shouldBe Some(2.0)   // least among the ts(12) ties
    // the pick survives an adversarial input order (repartitioned input)
    val backShuffled = AsofJoin.asof(left, right.repartition(7), Seq("k"),
      "ts", Seq("v"))
      .select($"id", $"asof_v").as[(Long, Option[Double])].collect().toMap
    backShuffled shouldBe back
  }
}
