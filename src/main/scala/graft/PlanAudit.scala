package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: dumps scan pruning + codegen stats per SparkEntry query so
  * plan regressions (lost pushdown, interpreted hot paths, surprise
  * exchanges) show up as diffs. Not part of the driver contract.
  */
object PlanAudit {
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
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
    val scans = "ReadSchema: struct<([^>]*)".r.findAllMatchIn(plan)
        .map(_.group(1).split(",").length).toList
      val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan)
        .map(_.group(1)).filter(_.nonEmpty).size
      val exchanges = "Exchange ".r.findAllIn(plan).size
      val wsc = "WholeStageCodegen".r.findAllIn(plan).size
      val bad = Seq(
        if (plan.contains("CartesianProduct")) "CARTESIAN" else "",
        if (plan.contains("BroadcastNestedLoopJoin") &&
          !Set("sim_topk", "sim_topk_ivf", "emb_neardup").exists(name.startsWith))
          "BNLJ" else "").filter(_.nonEmpty)
      println(f"$name%-22s scanCols=${scans.mkString("/")}%-12s pushed=$pushed exch=$exchanges wsc=$wsc ${bad.mkString(",")}")
    }
    spark.stop()
  }
}
