package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.{AlarmStatus, BreachReason, HealthCheckConfig}
import graft.streaming.{AlarmPipeline, TransitionEvent}

/** Generative equivalence: random metric scripts through the REAL streaming
  * operator must match a ~20-line reference evaluator of the alarm
  * semantics (per-minute max; missing minute = breach; M-of-N over trailing
  * evaluations with partial history; transition on change). The reference
  * is deliberately naive — a different shape of the same spec.
  */
class AlarmPropertySpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  /** Naive single-threaded evaluator of the alarm spec. */
  private def reference(cfg: HealthCheckConfig,
      points: Seq[(Int, Double)], horizonMin: Int): Seq[(Long, String, String)] = {
    val byMinute = points.groupBy(_._1 / 60).view.mapValues(_.map(_._2).max).toMap
    if (byMinute.isEmpty) return Seq.empty
    val first = byMinute.keys.min
    var status = AlarmStatus.Ok
    var history = List.empty[Boolean]
    val out = Seq.newBuilder[(Long, String, String)]
    (first to horizonMin).foreach { m =>
      val observed = byMinute.get(m)
      val breach = observed.forall(_ > cfg.thresholdSeconds)
      val reason = observed match {
        case None => BreachReason.MissingData
        case Some(v) if v > cfg.thresholdSeconds => BreachReason.Threshold
        case _ => BreachReason.None
      }
      history = (breach :: history).take(cfg.evaluationPeriods)
      val newStatus =
        if (history.count(identity) >=
          math.min(cfg.datapointsToAlarm, history.length)) AlarmStatus.Alarm
        else AlarmStatus.Ok
      if (newStatus != status)
        out += (((m + 1) * 60000L, newStatus, reason))
      status = newStatus
    }
    out.result()
  }

  test("random scripts: streaming operator matches the reference evaluator") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val scriptGen = for {
      n <- Gen.choose(5, 25)
      points <- Gen.listOfN(n, for {
        sec <- Gen.choose(0, 12 * 60) // up to 12 minutes of activity
        v <- Gen.oneOf(Gen.choose(0.0, 0.9), Gen.choose(1.5, 9.0))
      } yield (sec, v))
      m <- Gen.choose(1, 3)
      nEval <- Gen.choose(m, 3)
    } yield (points.distinctBy(_._1), m, nEval)

    (0 until 5).foreach { i =>
      val (points, m, nEval) = scriptGen.pureApply(Gen.Parameters.default,
        Seed(42L + i))
      val cfg = HealthCheckConfig(datapointsToAlarm = m, evaluationPeriods = nEval)
      val maxMin = points.map(_._1 / 60).max
      val expected = reference(cfg, points, maxMin)

      val input = MemoryStream[(String, Timestamp, Double)]
      val metrics = input.toDF().toDF("streamName", "ts", "value")
      val q = AlarmPipeline.transitions(metrics, cfg)
        .writeStream.format("memory").queryName(s"prop_$i")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"chk-p$i").toString)
        .outputMode("append").start()
      try {
        val rows = points.sortBy(_._1)
          .map { case (sec, v) => ("s", new Timestamp(sec * 1000L), v) }
        // batches split by time (watermark semantics), but rows WITHIN a
        // batch deliberately shuffled — micro-batch row order is arbitrary
        // in production and the operator must not care
        rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
          input.addData(b.sortBy(r => (r._2.getTime * 2654435761L) % 97))
          q.processAllAvailable()
        }
        // flush: sentinel far past the horizon + an empty batch for timers
        input.addData(Seq(("__flush__",
          new Timestamp((maxMin + 10) * 60000L), 0.0)))
        q.processAllAvailable()
        input.addData(Seq.empty); q.processAllAvailable()
        val got = spark.table(s"prop_$i").as[TransitionEvent].collect()
          .filter(_.streamName == "s")
          .filter(_.atMs <= (maxMin + 1) * 60000L) // cap at reference horizon
          .sortBy(_.atMs)
          .map(t => (t.atMs, t.to, t.reason)).toSeq
        withClue(s"script $i (m=$m of $nEval, points=$points): ") {
          got shouldBe expected
        }
      } finally q.stop()
    }
  }
}
