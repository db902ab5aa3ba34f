package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: dumps scan pruning + exchange stats per SparkEntry query so
  * plan regressions (lost pushdown, interpreted hot paths, surprise
  * exchanges) show up as diffs. Not part of the driver contract — the
  * CI-enforced subset of these invariants lives in PlanAuditSpec.
  *
  * Parses the FORMATTED explain: the compact plan string truncates long
  * fields, so `PushedFilters` counts from it silently under-report.
  */
object PlanAudit {

  /** Queries whose BroadcastNestedLoopJoin is a deliberate 1-row (or
    * nprobe-row) broadcast — the global-now aggregate, query vector,
    * centroid probe, or corpus-size count. Shared with PlanAuditSpec so the
    * dev dump and the CI gate cannot drift.
    */
  val bnljWhitelist: Set[String] = Set(
    "hc_latency_arrival", "hc_latency_event_time",
    "sim_topk", "sim_topk_ivf", "sim_topk_batch", "emb_neardup",
    "emb_centroid_stats", "text_tfidf",
    // 1-row scalar-subquery broadcasts (max revenue / global average /
    // corpus-total threshold)
    "q15_top_supplier", "q22_idle", "q11_important_part", "heavy_hitters")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      val scans = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(plan)
        .map(_.group(1).split(",").length).toList
      val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan)
        .flatMap(m => m.group(1).split(",").map(_.trim).filter(_.nonEmpty))
        .size
      val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(plan).size
      val reused = "(?m)^\\(\\d+\\) ReusedExchange".r.findAllIn(plan).size
      val bad = Seq(
        if (plan.contains("CartesianProduct")) "CARTESIAN" else "",
        if (plan.contains("BroadcastNestedLoopJoin") &&
          !PlanAudit.bnljWhitelist.contains(name))
          "BNLJ" else "").filter(_.nonEmpty)
      println(f"$name%-22s scanCols=${scans.mkString("/")}%-14s pushed=$pushed exch=$exchanges reused=$reused ${bad.mkString(",")}")
    }
    spark.stop()
  }
}
