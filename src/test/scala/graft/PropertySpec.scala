package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.HealthCheckFunctions._
import graft.functions.TextFunctions._
import graft.operators.HealthCheckBatch

/** ScalaCheck properties (SURVEY §5.4). Each property evaluates a batch of
  * generated cases through ONE Spark job to keep the suite fast.
  */
class PropertySpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  test("latency is non-negative and truncates like Duration.toSeconds (B3)") {
    val cases = Gen.listOfN(60, for {
      base <- Gen.choose(0L, 4102444800L)
      delta <- Gen.choose(0L, 100000L)
    } yield (base, base + delta)).sample.get
    val out = cases.toDF("a", "b")
      .select($"a", $"b",
        latencySeconds(fromEpochSeconds($"b"), fromEpochSeconds($"a")).as("l"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, l) => l shouldBe (b - a) }
  }

  test("isoUtc/parseIso round-trip is identity on whole-second timestamps") {
    val cases = Gen.listOfN(60, Gen.choose(0L, 4102444800L)).sample.get
    val out = cases.toDF("e")
      .select($"e", unix_timestamp(parseIso(isoUtc(fromEpochSeconds($"e")))).as("r"))
      .as[(Long, Long)].collect()
    out.foreach { case (e, r) => r shouldBe e }
  }

  test("periodStart is idempotent and total: every ts lands in its own period") {
    val cases = Gen.listOfN(60, for {
      epoch <- Gen.choose(0L, 4102444800L)
      period <- Gen.oneOf(1, 2, 5, 15)
    } yield (epoch, period)).sample.get
    cases.groupBy(_._2).foreach { case (p, group) =>
      val out = group.map(_._1).toDF("e")
        .select($"e",
          unix_timestamp(HealthCheckBatch.periodStart(fromEpochSeconds($"e"), p))
            .as("w"))
        .as[(Long, Long)].collect()
      out.foreach { case (e, w) =>
        w % (p * 60L) shouldBe 0
        w should be <= e
        (e - w) should be < (p * 60L)
      }
    }
  }

  test("jaccard is bounded in [0,1], symmetric, and 1 iff equal sets") {
    val word = Gen.oneOf((1 to 12).map(i => s"w$i"))
    val text = Gen.listOfN(10, word).map(_.mkString(" "))
    val cases = Gen.listOfN(40, Gen.zip(text, text)).sample.get
    val out = cases.toDF("ta", "tb")
      .select(
        jaccard(shingleSet($"ta", 1), shingleSet($"tb", 1)).as("jab"),
        jaccard(shingleSet($"tb", 1), shingleSet($"ta", 1)).as("jba"),
        (array_sort(shingleSet($"ta", 1)) === array_sort(shingleSet($"tb", 1)))
          .as("eq"))
      .as[(Double, Double, Boolean)].collect()
    out.foreach { case (jab, jba, eq) =>
      jab should (be >= 0.0 and be <= 1.0)
      jab shouldBe jba
      if (eq) jab shouldBe 1.0 else jab should be < 1.0
    }
  }

  test("simhash is invariant under token permutation") {
    val word = Gen.oneOf((1 to 20).map(i => s"w$i"))
    val tokens = Gen.nonEmptyListOf(word).map(_.take(30))
    val cases = Gen.listOfN(30, tokens).sample.get
    val pairs = cases.map(t => (t.mkString(" "),
      scala.util.Random.shuffle(t).mkString(" ")))
    val out = pairs.toDF("ta", "tb")
      .select(simHash($"ta"), simHash($"tb")).as[(Long, Long)].collect()
    out.foreach { case (a, b) => a shouldBe b }
  }

  test("winnowing guarantee: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    graft.expressions.VectorExpressions.register(spark)
    // Schleimer et al. SIGMOD'03: with shingle width k=3 and window w=4,
    // any shared token run of length >= w+k-1 = 6 produces >= w shared
    // positional hashes, whose window MIN is selected on both sides.
    val word = Gen.oneOf((1 to 50).map(i => s"w$i"))
    val run = Gen.listOfN(6, word) // the planted shared run
    val pad = Gen.listOfN(12, word)
    val cases = Gen.listOfN(30, for {
      r <- run; p1 <- pad; p2 <- pad
    } yield (p1 ++ r).mkString(" ") -> (r ++ p2).mkString(" ")).sample.get
    val out = cases.toDF("ta", "tb")
      .select(graft.expressions.VectorExpressions.winnowNative($"ta").as("fa"),
        graft.expressions.VectorExpressions.winnowNative($"tb").as("fb"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (fa, fb) => fa.intersect(fb) should not be empty }
  }

  test("tick grid day-chunks a multi-year key across multiple tasks") {
    val cfg = graft.model.HealthCheckConfig()
    val events = Seq(
      ("s", Timestamp.valueOf("2020-01-01 00:00:30"), 1.0),
      ("s", Timestamp.valueOf("2023-01-01 00:00:30"), 1.0))
      .toDF("event_type", "ts", "value")
    val grid = HealthCheckBatch.tickGrid(events, cfg)
    val expected = (Timestamp.valueOf("2023-01-01 00:00:30").getTime -
      Timestamp.valueOf("2020-01-01 00:00:30").getTime) / 60000 + 1
    grid.count() shouldBe expected
    // chunk rows are hash-distributed before the big explode: a multi-year
    // key's ~1.6M-row grid must not materialize inside one task
    val perPart = grid.rdd.mapPartitions(it => Iterator(it.size)).collect()
    perPart.count(_ > 0) should be > 1
    perPart.max.toLong should be < expected
  }

  test("alarm transitions: states alternate and reasons are consistent") {
    // replayed on the real sf0.001 table — an invariant check of the batch
    // alarm operator rather than a generated-input property
    val df = HealthCheckBatch.alarmTransitions(spark, "/root/testdata/sf0.001",
      graft.model.HealthCheckConfig(thresholdSeconds = 150.0))
    val rows = df.collect()
    rows should not be empty
    rows.groupBy(_.getString(0)).foreach { case (_, ts) =>
      val states = ts.sortBy(_.getTimestamp(1).getTime).map(_.getString(2))
      states.sliding(2).foreach {
        case Array(a, b) => a should not be b // transitions only on change
        case _ =>
      }
      ts.foreach { r =>
        val (state, reason) = (r.getString(2), r.getString(3))
        if (reason == "missing_data") r.isNullAt(4) shouldBe true
        if (state == "OK") reason shouldBe "none"
      }
    }
  }
}
