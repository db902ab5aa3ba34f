package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sources.Tables

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Measurement fixes vs round 1 (VERDICT "What's wrong" 1-3):
  *  - queries are materialized via a `noop`-format write, which evaluates
  *    EVERY column of EVERY row — `.count()` let Catalyst prune all
  *    projection work and time a bare parquet row-count;
  *  - a failed query reports `"err"`, not a ~0s timing that improves totals;
  *  - the JSON line is also written to bench_out.json so the driver never
  *    has to fish it out of sbt log noise.
  *
  * Reading regressions: trust the exchange count and shuffle_bytes
  * columns before the seconds. Case study (round 8→9):
  * hc_alarm_m_of_n/hc_alarm_transitions reported 1.76 s/1.48 s in
  * BENCH_r08 vs 0.94 s/0.93 s in r07; a re-run of the identical code
  * measured 1.12 s/1.07 s with exchange counts AND shuffle bytes
  * byte-identical to r08 — a 40% wall swing with zero plan or volume
  * change is the local[32] noise floor for ~1 s queries, not a
  * regression. Sub-second-scale deltas with unchanged telemetry are
  * measurement artifacts; only chase seconds when a telemetry column
  * moved too.
  *
  * Second case study (round 9→10): BENCH_r09 reported graph_hits at
  * 9.90 s and graph_lpa at 4.78 s (vs 2.92/2.49 in r08) with
  * byte-identical plans and shuffle volumes. An isolated re-measure
  * (fresh JVM, SPARK_GRAFT_BENCH_ONLY=graph family, same sf0.1, same
  * warmed shared edges) read graph_hits 3.62 s, graph_lpa 1.93 s,
  * graph_components 3.29 s, graph_pagerank 2.52 s, graph_ppr 1.91 s —
  * i.e. the r9 numbers were block-manager/GC wake from the 214-query
  * JVM (graph_components' CC loop runs immediately before graph_hits
  * alphabetically), not a regression. The HITS per-half-round
  * checkpoint fences are KEPT deliberately: halving them would
  * re-execute the corpus-sized edge joins 2-3x per round to save
  * node-sized materializations — the wrong trade at 100 TB.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.expressions.VectorExpressions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")

    // volume telemetry: total shuffle bytes WRITTEN per query, summed
    // over task-end events. The exchange COUNT pins plan shape but not
    // volume — a keyed join that silently starts shuffling carried text
    // keeps `exchanges` constant while bytes explode; this counter makes
    // that regression visible in the BENCH_r{N} history (and
    // BenchTelemetrySpec pins ceilings for the text-free-shuffle
    // queries). Listener events are posted asynchronously, so readings
    // go through `stableShuffleBytes` which waits for the counter to
    // quiesce.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            end: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = end.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })
    def stableShuffleBytes(): Long = {
      var prev = -1L
      var cur = shuffleBytes.get()
      var waited = 0
      while (cur != prev && waited < 2000) {
        prev = cur
        Thread.sleep(50)
        waited += 50
        cur = shuffleBytes.get()
      }
      cur
    }

    // Warm the JVM, parquet footer caches, codegen, and the shuffle stack so
    // the first measured query (alphabetical order) is not charged for
    // session bring-up.
    Seq("region", "documents", "embeddings").foreach(t =>
      Tables.load(spark, sfDir, t).write.format("noop").mode("overwrite").save())
    Tables.load(spark, sfDir, "region").groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }

    // JIT/shuffle-stack warm-up BEYOND the trivial region agg above: the
    // three shared-artifact builds below are each timed ONCE, FIRST, and
    // before round 11 they ran in a cold-JIT JVM — BENCH_r10 charged
    // dedup_cluster_build 17.86 s for a build that measures 4.1-4.8 s in
    // any warm or isolated JVM (and round 9 burned an investigation on
    // the same artifact class with graph_hits). One representative
    // shuffling/codegen-heavy pass over the real tables (hash agg +
    // sort-merge-join + md5/window codegen paths) brings the JVM to the
    // same state the median-of-3 queries enjoy, WITHOUT touching the
    // shared caches the build lines are supposed to pay for.
    {
      import org.apache.spark.sql.functions._
      val d = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(col("text")).as("h"))
      d.groupBy("lang").agg(count(lit(1)), sum(col("n_chars")))
        .write.format("noop").mode("overwrite").save()
      d.select(col("doc_id"), col("h"))
        .join(d.select(col("doc_id"), col("lang")), "doc_id")
        .write.format("noop").mode("overwrite").save()
    }

    // Shared-artifact builds, each reported as its own line item: the
    // exchange pre-pass below constructs each query's DataFrame before
    // its timed runs, which would otherwise build the checkpointed
    // leaves during the UNTIMED planning phase — the build's seconds and
    // shuffle bytes would be charged to nobody (and per-round
    // comparisons against pre-cache rounds would flatter the consumers).
    // Builds get the SAME quiesce discipline as the timed queries
    // (System.gc() + shuffle-counter quiesce before the clock starts);
    // they cannot get median-of-3 — a re-run would hit the cache they
    // just filled — so the warm-up above stands in for the JIT half.
    def buildLine(name: String)(body: => Unit)
        : (String, Double, Option[String], Option[Int], Long) = {
      System.gc()
      val b0 = stableShuffleBytes()
      val t0 = System.nanoTime()
      val err =
        try { body; None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      val secs = (System.nanoTime() - t0) / 1e9
      (name, secs, err, None: Option[Int], stableShuffleBytes() - b0)
    }

    val graphBuild = buildLine("graph_edge_build") {
      graft.operators.Graph.warmSharedEdges(spark, sfDir)
    }
    // dedup_clusters and canonical_select measure warm-cache; the one-time
    // dedup+CC chain is charged here (round-10 discipline).
    val clusterBuild = buildLine("dedup_cluster_build") {
      graft.operators.TextPipeline.warmSharedClusterLabels(spark, sfDir)
    }
    // knn_triangles/knn_kcore/quality_propagate measure warm-cache; the
    // kmeans + kNN build is charged here.
    val knnEdgeBuild = buildLine("knn_edge_build") {
      graft.operators.SimilarityPipeline.warmMutualKnnEdges(spark, sfDir)
    }

    // Three measured runs per query, keep the MEDIAN, with a GC quiesce
    // before each run: local[32] timings carry multi-second scheduler/GC/JIT
    // noise across a 56-query JVM, and round 3's min-of-2 still let one
    // driver run report a 3x outlier (BENCH_r03 dedup_pipeline 4.90s vs
    // 1.65s on re-runs of identical code). The median of three quiesced runs
    // is robust to a single interference spike in either direction.
    // Optional isolation filter (comma-separated names): lets a perf
    // investigation re-measure one family in a fresh JVM without the
    // other 200 queries' block-manager/GC wake. The driver never sets
    // it, so the contract run always measures everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // plan-shape telemetry: shuffle-exchange count from the FORMATTED
      // explain (planning only, measured outside the timed runs). Written
      // next to seconds so a plan regression — a new shuffle — is visible in
      // the BENCH_r{N} history even when timing noise hides it. Same counter
      // and ceilings as the PlanAuditSpec CI gate (PlanAudit.exchangeCount).
      val exch =
        try Some(PlanAudit.exchangeCount(fn(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)))
        catch { case _: Throwable => None }
      def once(): (Double, Option[String]) = {
        System.gc()
        val t0 = System.nanoTime()
        val err =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            None
          } catch { case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      // shuffle-bytes delta across the FIRST measured run. The baseline
      // read QUIESCES first: the exchange pre-pass above runs real Spark
      // jobs for eager-building queries (unigram training, curation
      // checkpoints), and their async task-end stragglers would
      // otherwise land inside this query's delta. Both waits happen
      // OUTSIDE the timed section.
      val bytesBefore = stableShuffleBytes()
      val (s1, e1) = once()
      val shufB = stableShuffleBytes() - bytesBefore
      if (e1.isDefined) (name, s1, e1, exch, shufB)
      else {
        // any run's failure is THE result (a flaky query must not report
        // errors=0), and errored runs' time-to-exception stays out of the
        // median — only clean timings are measurements
        val (s2, e2) = once()
        val (s3, e3) = once()
        val clean = Seq((s1, e1), (s2, e2), (s3, e3))
          .collect { case (s, None) => s }.sorted
        (name, clean(clean.size / 2), e2.orElse(e3), exch, shufB)
      }
    }
    val qs = (graphBuild +: clusterBuild +: knnEdgeBuild +: results).map {
      case (k, v, None, Some(x), b) =>
        s""""$k":{"s":$v,"exchanges":$x,"shuffle_bytes":$b}"""
      case (k, v, None, None, b) => s""""$k":{"s":$v,"shuffle_bytes":$b}"""
      case (k, _, Some(e), _, _) => s""""$k":{"err":"${esc(e)}"}"""
    }.mkString("{", ",", "}")
    val total = (graphBuild +: clusterBuild +: knnEdgeBuild +: results)
      .collect { case (_, v, None, _, _) => v }.sum
    val nErr = (graphBuild +: clusterBuild +: knnEdgeBuild +: results).count(_._3.isDefined)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"${esc(sfDir)}","errors":$nErr}"""
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    // The full per-query map outgrew the driver's bounded stdout tail at
    // 134 queries (BENCH_r05/r06 "parsed": null) — the LAST printed line
    // must be a compact (~300 B) summary that always fits the tail; the
    // complete map lives in bench_out.json.
    val top5 = results.collect { case (k, v, None, _, _) => (k, v) }
      .sortBy(-_._2).take(5)
      .map { case (k, v) => s""""$k":${math.round(v * 100) / 100.0}""" }
      .mkString("{", ",", "}")
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$top5,"sf":"${esc(sfDir)}","errors":$nErr,"n_queries":${results.size},"queries_note":"top-5 slowest; full map in bench_out.json"}"""
    println(summary)
    spark.stop()
  }
}
