package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Volume twin of PlanAuditSpec's exchange-count gate: exchange COUNTS
  * pin plan shape, but a keyed join that silently starts shuffling
  * carried text keeps the count constant while bytes explode. This spec
  * executes the queries whose scaladoc claims TEXT-FREE shuffles at
  * sf0.001 and pins their total shuffle-write bytes — the same
  * task-metrics counter Bench surfaces as `shuffle_bytes` per query in
  * bench_out.json. Ceilings are ~4x the measured values (byte counts are
  * deterministic up to partition-serialization overhead, so 4x is pure
  * headroom): a fence removal, a text column leaking into a shuffle key
  * frame, or a re-execution amplification trips them; sub-4x creep is
  * caught by the per-round shuffle_bytes history in BENCH_r{N} at sf0.1.
  */
class BenchTelemetrySpec extends AnyFunSuite with SparkTestBase
    with Matchers {

  private val sf = "/root/testdata/sf0.001"

  private def shuffleBytesOf(name: String): Long = {
    val counter = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(end: SparkListenerTaskEnd): Unit = {
        val m = end.taskMetrics
        if (m != null) counter.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      // the listener bus posts task events asynchronously — wait for the
      // counter to quiesce before reading (Bench.stableShuffleBytes twin)
      var prev = -1L
      var cur = counter.get()
      var waited = 0
      while (cur != prev && waited < 2000) {
        prev = cur; Thread.sleep(50); waited += 50; cur = counter.get()
      }
      cur
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // (query, byte ceiling at sf0.001): each claims its shuffles carry
  // doc-/node-/digest-sized rows, never corpus text
  private val ceilings = Seq(
    // post-fence manifest: doc-sized, text-free (CurationProgram
    // scaladoc); measured 93 KB
    "curation_program" -> 384L * 1024,
    // digest equi-join: (doc_id, md5) rows only; measured 42 KB
    "dedup_exact" -> 176L * 1024,
    // node/edge-keyed frames; text never enters the graph; < 512 KB
    "graph_pagerank" -> 2048L * 1024,
    // banded signature self-join: (doc_id, band, digest) rows only;
    // measured 468 KB
    "dedup_minhash" -> 1872L * 1024)

  test("bench lines carry the noise-adjudication columns: gc_ms/cpu_ms " +
    "of the median run, requiesced_s above the threshold") {
    // drive the REAL sweep on two queries with the re-measure threshold
    // forced to 0 so both get the end-of-sweep quiesced pass — pins the
    // report schema the judge adjudicates phantom-vs-real from
    val (full, summary) = Bench.run(spark, sf,
      only = Some(Set("q1_agg", "dedup_exact")), requiesceThreshold = 0.0)
    Seq("q1_agg", "dedup_exact").foreach { q =>
      full should include(s""""$q":{"s":""")
      val entry = full.split(s""""$q":\\{""")(1).split("}")(0)
      entry should include(""""gc_ms":""")
      entry should include(""""cpu_ms":""")
      entry should include(""""requiesced_s":""")
      entry should include(""""shuffle_bytes":""")
    }
    // the build lines carry the same gc/cpu indicators (no requiesce —
    // a re-run would hit the cache the build just filled)
    val build = full.split(""""graph_edge_build":\{""")(1).split("}")(0)
    build should include(""""gc_ms":""")
    build should include(""""cpu_ms":""")
    // and the stdout summary surfaces requiesced_s for the top lines
    summary should include(""""requiesced_s":""")
    // round 16 (VERDICT r15 Next #2): the summary line carries the FULL
    // per-query map as seconds-only numbers — the driver's per-query and
    // scaling comparisons read THIS line, not bench_out.json
    summary should include(""""top5":{""")
    Seq("q1_agg", "dedup_exact").foreach { q =>
      summary should include regex s""""$q":\\d+\\.?\\d*"""
    }
  }

  test("a memory-pressure-inflated query is labelled ambient:true " +
    "in-report; a consistently-slow one gets ambient:false") {
    // simulate BENCH_r12's failure shape with injected queries: the
    // "ambient" probe is slow ONLY during its three timed median runs
    // (invocations 2-4; invocation 1 is the untimed exchange pre-pass)
    // and fast when the quiesced re-measure re-runs it — the verdict
    // must collapse the gap and say so; the "real" probe is slow on
    // EVERY run, so its cost reproduces quiesced and must NOT be
    // written off as noise
    val calls = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]
    def probe(name: String, slowOn: Long => Boolean)
        : (org.apache.spark.sql.SparkSession, String) =>
          org.apache.spark.sql.DataFrame = (s, _) => {
      val n = calls.computeIfAbsent(name, _ => new AtomicLong).incrementAndGet()
      if (slowOn(n)) Thread.sleep(1500)
      s.range(10).toDF("x")
    }
    val over = Map(
      "zz_ambient_probe" -> probe("a", n => n >= 2 && n <= 4),
      "zz_real_probe" -> probe("r", _ => true))
    val (full, _) = Bench.run(spark, sf,
      only = Some(over.keySet), requiesceThreshold = 0.5,
      queriesOverride = Some(over))
    val amb = full.split(""""zz_ambient_probe":\{""")(1).split("}")(0)
    amb should include(""""ambient":true""")
    amb should include(""""requiesced_s":""")
    amb should include(""""requiesced_gc_ms":""")
    val real = full.split(""""zz_real_probe":\{""")(1).split("}")(0)
    real should include(""""ambient":false""")
  }

  test("the store_serving block reports p50/p95 of repeated store " +
    "probes next to the in-query twin's sweep median (round 15)") {
    // the bm25_store/bm25_topk pair is the cheapest store+twin — the
    // session text index builds once at sf0.001 and the probes re-read it
    val (full, _) = Bench.run(spark, sf,
      only = Some(Set("bm25_store", "bm25_topk")))
    full should include(""""store_serving":{"bm25_store":{"p50_s":""")
    val entry = full.split(""""store_serving":\{"bm25_store":\{""")(1)
      .split("}")(0)
    entry should include(""""p95_s":""")
    entry should include(""""n":5""")
    entry should include(""""inquery":"bm25_topk"""")
    entry should include(""""inquery_s":""")
    entry should include(""""ratio":""")
    // a selection without a complete pair reports an EMPTY block (the
    // driver's full sweep always carries every pair)
    val (none, _) = Bench.run(spark, sf, only = Some(Set("q1_agg")))
    none should include(""""store_serving":{}""")
  }

  ceilings.foreach { case (name, ceiling) =>
    test(s"$name shuffles stay text-free-sized at sf0.001 (<= $ceiling B)") {
      // graph queries share cached edge artifacts per (app, sfDir): warm
      // the cache first so this measures the warm-cache plan the ceiling
      // documents, regardless of which suite/test ran earlier in the
      // shared session (cold-cache would include the one-time build)
      if (name.startsWith("graph_"))
        graft.operators.Graph.warmSharedEdges(spark, sf)
      val bytes = shuffleBytesOf(name)
      withClue(s"$name shuffle bytes: ") { bytes should be <= ceiling }
    }
  }
}
