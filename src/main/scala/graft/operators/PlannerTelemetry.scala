package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Plan-safety telemetry — the numbers an operator (or a planner) needs
  * BEFORE committing a 100 TB shuffle, computed exactly from keyed
  * counts:
  *
  *  - [[skewReport]]: per join/partition key axis, the key-frequency
  *    concentration (top-1 share, max-over-average skew factor) that
  *    predicts whether a shuffle on that key needs AQE skew splitting
  *    or salting (the repo's salted_counts remedy);
  *  - [[joinCardinality]]: the EXACT output row count of each canonical
  *    equi-join (`sum over keys of n_left·n_right`) plus its hottest
  *    key — the estimate that decides broadcast vs shuffle vs pre-
  *    aggregation long before the join runs.
  *
  * Both are pure keyed aggregates (map-side combined, AQE-splittable)
  * over the scans they describe — the telemetry never performs the join
  * it is costing. The reference system has no planner surface; this
  * family is engine-ops tooling for the 100 TB mandate.
  */
object PlannerTelemetry {

  /** Key-skew report over the canonical shuffle axes. Output one row
    * per axis: total rows, distinct keys, the heaviest key's count, its
    * q6 share of the table, and the q2 max-over-average skew factor
    * (`top1_cnt · n_keys / n_rows` — 100 means the hottest partition of
    * a key-hash shuffle carries ~100× the average key's rows).
    *
    * Scale: per axis ONE `groupBy(key).count()` (map-side combined;
    * output is key-cardinality-sized) + ONE 1-row rollup over it; the
    * axis frames union into a #axes-row result. No window, no join, no
    * funnel — the report on a skewed table is itself skew-immune because
    * the count agg combines map-side before the hot key ever shuffles.
    */
  def skewReport(spark: SparkSession, sfDir: String): DataFrame = {
    def axis(name: String, df: DataFrame, key: String): DataFrame =
      df.select(col(key).cast("string").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).cast(LongType).as("n_rows"),
          count(lit(1)).cast(LongType).as("n_keys"),
          max(col("n")).cast(LongType).as("top1_cnt"))
        .select(lit(name).as("axis"), col("n_rows"), col("n_keys"),
          col("top1_cnt"),
          floor(col("top1_cnt").cast("double") / col("n_rows") * 1000000d
            + 0.5d).cast(LongType).as("top1_share_q6"),
          floor(col("top1_cnt").cast("double") * col("n_keys")
            / col("n_rows") * 100d + 0.5d).cast(LongType)
            .as("skew_factor_q2"))
    val axes = Seq(
      axis("lineitem.l_orderkey", Tables.lineitem(spark, sfDir),
        "l_orderkey"),
      axis("lineitem.l_suppkey", Tables.lineitem(spark, sfDir),
        "l_suppkey"),
      axis("orders.o_custkey", Tables.orders(spark, sfDir), "o_custkey"),
      axis("events.user_id", Tables.events(spark, sfDir), "user_id"),
      axis("documents.lang", Tables.documents(spark, sfDir), "lang"),
      axis("documents.source", Tables.documents(spark, sfDir), "source"))
    axes.reduce(_.unionByName(_)).orderBy("axis")
  }

  /** The DuckDB replay of [[skewReport]]. */
  private[graft] def skewReportOracleSql: String = {
    def axisSql(name: String, table: String, key: String): String =
      s"""SELECT '$name' AS axis,
  CAST(sum(n) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
  CAST(max(n) AS BIGINT) AS top1_cnt,
  CAST(floor(CAST(max(n) AS DOUBLE) / sum(n) * 1000000 + 0.5) AS BIGINT) AS top1_share_q6,
  CAST(floor(CAST(max(n) AS DOUBLE) * count(*) / sum(n) * 100 + 0.5) AS BIGINT) AS skew_factor_q2
FROM (SELECT CAST($key AS VARCHAR) AS k, count(*) AS n FROM $table GROUP BY 1)"""
    Seq(
      axisSql("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      axisSql("lineitem.l_suppkey", "lineitem", "l_suppkey"),
      axisSql("orders.o_custkey", "orders", "o_custkey"),
      axisSql("events.user_id", "events", "user_id"),
      axisSql("documents.lang", "documents", "lang"),
      axisSql("documents.source", "documents", "source"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY axis")
  }

  /** Exact equi-join output cardinality per canonical join axis,
    * WITHOUT running the join: both sides collapse to keyed counts
    * first, the counts join on the key (count-frame-sized, AQE-
    * splittable), and `sum(n_l · n_r)` is the exact output rows.
    * `max_key_rows` names the hottest key's contribution — the number
    * that decides salting. `join_rows` vs `n_left`/`n_right` decides
    * broadcast (tiny side) vs shuffle (both big, benign) vs
    * pre-aggregate (join_rows ≫ inputs: the join explodes and the
    * downstream agg should be pushed through it).
    *
    * Scale: the expensive thing about a 100 TB join — moving the fact
    * rows — never happens here; only key-cardinality-sized count frames
    * shuffle.
    */
  def joinCardinality(spark: SparkSession, sfDir: String): DataFrame =
    joinCardinalityFrom(canonicalAxes(spark, sfDir))

  /** One join axis to cost: (report name, left frame, left key, right
    * frame, right key). The generic form lets a caller (or spec) advise
    * an arbitrary planned join, not just the canonical table axes.
    */
  private[graft] case class JoinAxis(name: String, left: DataFrame,
      lk: String, right: DataFrame, rk: String)

  private def canonicalAxes(spark: SparkSession,
      sfDir: String): Seq[JoinAxis] = Seq(
    JoinAxis("orders*lineitem.orderkey", Tables.orders(spark, sfDir),
      "o_orderkey", Tables.lineitem(spark, sfDir), "l_orderkey"),
    JoinAxis("customer*orders.custkey", Tables.customer(spark, sfDir),
      "c_custkey", Tables.orders(spark, sfDir), "o_custkey"),
    JoinAxis("part*lineitem.partkey", Tables.part(spark, sfDir),
      "p_partkey", Tables.lineitem(spark, sfDir), "l_partkey"),
    JoinAxis("documents*documents.lang", Tables.documents(spark, sfDir),
      "lang", Tables.documents(spark, sfDir), "lang"),
    JoinAxis("events*events.user_id", Tables.events(spark, sfDir),
      "user_id", Tables.events(spark, sfDir), "user_id"))

  private[graft] def joinCardinalityFrom(axes: Seq[JoinAxis]): DataFrame = {
    // round 16 (§2.4 remove shuffles outright): n_left/n_right derive as
    // sum(n_l)/sum(n_r) over the keyed-count frames — every base row
    // lands in exactly ONE key group (null keys included), so the sums
    // equal the bare count(*) — via one FULL OUTER key join + 1-row agg.
    // Previously each axis re-scanned both base tables for count(*)
    // frames and cross-joined them in: 2 extra scans + 2 extra exchanges
    // per axis, 25 exchanges across the 5-axis report. The matched-side
    // stats are unchanged: rows_k is null exactly on unmatched keys, so
    // count(rows_k)/sum/max over the full-outer rows equal the inner
    // join's count(*)/sum/max.
    def one(a: JoinAxis): DataFrame = {
      val lc = a.left.select(col(a.lk).cast("string").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_l"))
      val rc = a.right.select(col(a.rk).cast("string").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_r"))
      lc.join(rc, Seq("k"), "full_outer")
        .select(col("n_l"), col("n_r"),
          (col("n_l") * col("n_r")).as("rows_k"))
        .agg(
          coalesce(sum(col("n_l")), lit(0L)).cast(LongType).as("n_left"),
          coalesce(sum(col("n_r")), lit(0L)).cast(LongType).as("n_right"),
          count(col("rows_k")).cast(LongType).as("n_keys_matched"),
          coalesce(sum(col("rows_k")), lit(0L)).cast(LongType)
            .as("join_rows"),
          coalesce(max(col("rows_k")), lit(0L)).cast(LongType)
            .as("max_key_rows"))
        .select(lit(a.name).as("axis"), col("n_left"), col("n_right"),
          col("n_keys_matched"), col("join_rows"), col("max_key_rows"))
    }
    axes.map(one).reduce(_.unionByName(_)).orderBy("axis")
  }

  /** Broadcast threshold for [[planAdvisor]] — rows, standing in for
    * `spark.sql.autoBroadcastJoinThreshold` bytes (the advisor works in
    * exact row counts; a deployment multiplies by row width).
    */
  private val BroadcastRows = 100000L

  /** The planner decision layer on top of [[joinCardinality]]: per
    * canonical join axis, the strategy the exact numbers dictate,
    * decided by the same rules a 100 TB engine room applies —
    *
    *  - `broadcast_smaller` when either side fits the broadcast budget
    *    (no shuffle at all);
    *  - `salt_hot_keys` when one key contributes > 1/5 of the join
    *    output (AQE can split a skewed PARTITION, but a single hot KEY
    *    still lands in one task — salting is the remedy);
    *  - `pre_aggregate` when the join output explodes past 4× its
    *    inputs (push the downstream aggregation through the join);
    *  - `shuffle_hash` otherwise (both big, benign — the default).
    *
    * All comparisons are exact integer arithmetic on the keyed-count
    * estimates, so the decision is deterministic and oracle-replayable
    * — the point being that broadcast/salt/pre-agg decisions at 100 TB
    * should come from measured counts, not guesses.
    */
  def planAdvisor(spark: SparkSession, sfDir: String): DataFrame =
    planAdvisorFrom(canonicalAxes(spark, sfDir))

  /** [[planAdvisor]] over arbitrary join axes — the rule ladder applied
    * to any planned join's exact counts (PlannerTelemetrySpec drives
    * constructed skew/fan-out fixtures through it to pin each rung to
    * the engine behavior it prescribes).
    */
  private[graft] def planAdvisorFrom(axes: Seq[JoinAxis]): DataFrame = {
    val jc = joinCardinalityFrom(axes)
    jc.select(col("axis"), col("n_left"), col("n_right"),
      col("join_rows"), col("max_key_rows"),
      when(least(col("n_left"), col("n_right")) <= BroadcastRows,
        lit("broadcast_smaller"))
        .when(col("max_key_rows") * 5 > col("join_rows"),
          lit("salt_hot_keys"))
        .when(col("join_rows") > (col("n_left") + col("n_right")) * 4,
          lit("pre_aggregate"))
        .otherwise(lit("shuffle_hash")).as("strategy"))
      .orderBy("axis")
  }

  /** The DuckDB replay of [[planAdvisor]] (same integer rule ladder
    * over the [[joinCardinalityOracleSql]] body).
    */
  private[graft] def planAdvisorOracleSql: String =
    s"""SELECT axis, n_left, n_right, join_rows, max_key_rows,
  CASE
    WHEN least(n_left, n_right) <= $BroadcastRows THEN 'broadcast_smaller'
    WHEN max_key_rows * 5 > join_rows THEN 'salt_hot_keys'
    WHEN join_rows > (n_left + n_right) * 4 THEN 'pre_aggregate'
    ELSE 'shuffle_hash' END AS strategy
FROM ($joinCardinalityBodySql)
ORDER BY axis"""

  /** The DuckDB replay of [[joinCardinality]]. */
  private[graft] def joinCardinalityOracleSql: String =
    s"$joinCardinalityBodySql\nORDER BY axis"

  /** [[joinCardinalityOracleSql]] without the final ORDER BY — reused
    * as the subquery of [[planAdvisorOracleSql]].
    */
  private def joinCardinalityBodySql: String = {
    def axisSql(name: String, lt: String, lk: String, rt: String,
        rk: String): String =
      s"""SELECT '$name' AS axis,
  (SELECT CAST(count(*) AS BIGINT) FROM $lt) AS n_left,
  (SELECT CAST(count(*) AS BIGINT) FROM $rt) AS n_right,
  CAST(count(*) AS BIGINT) AS n_keys_matched,
  CAST(coalesce(sum(n_l * n_r), 0) AS BIGINT) AS join_rows,
  CAST(coalesce(max(n_l * n_r), 0) AS BIGINT) AS max_key_rows
FROM (SELECT CAST($lk AS VARCHAR) AS k, count(*) AS n_l FROM $lt GROUP BY 1) lc
JOIN (SELECT CAST($rk AS VARCHAR) AS k, count(*) AS n_r FROM $rt GROUP BY 1) rc USING (k)"""
    Seq(
      axisSql("orders*lineitem.orderkey", "orders", "o_orderkey",
        "lineitem", "l_orderkey"),
      axisSql("customer*orders.custkey", "customer", "c_custkey",
        "orders", "o_custkey"),
      axisSql("part*lineitem.partkey", "part", "p_partkey",
        "lineitem", "l_partkey"),
      axisSql("documents*documents.lang", "documents", "lang",
        "documents", "lang"),
      axisSql("events*events.user_id", "events", "user_id",
        "events", "user_id"))
      .mkString("\nUNION ALL\n")
  }

  /** Target parquet file size for [[layoutAdvisor]] — bytes, the usual
    * 128 MB HDFS-block-aligned target scaled down so the synthetic SFs
    * exercise multi-file partitions (a deployment passes its own).
    */
  private val TargetFileBytes = 4096L

  /** Partitioned-write layout planner — the small-files / giant-files
    * advisor a 100 TB writer consults BEFORE `partitionBy(split)`:
    * per hive-partition value, the exact row count and payload bytes
    * (sum of n_chars — the dominant column), the file count that hits
    * the target size (`ceil(bytes/target)`, min 1), rows per file, and
    * the verdict — `coalesce_small` when the whole partition is under
    * half a target file (the small-files problem: merge it into a
    * sibling write or cut task parallelism), `split_large` when any
    * single file would exceed 2× target without the advised count
    * (i.e. the partition NEEDS an explicit repartition(n) before the
    * write), `ok` otherwise.
    *
    * Scale: ONE map-side-combined groupBy(split) agg (#partitions rows
    * out), then pure integer arithmetic — the advisor never moves a
    * payload row, exactly like [[joinCardinality]]. Exercised on the
    * deterministic split assignment (TextPipeline.hashBucket), so the
    * report is stable and oracle-replayable.
    */
  def layoutAdvisor(spark: SparkSession, sfDir: String,
      targetBytes: Long = TargetFileBytes): DataFrame = {
    val bucket = graft.operators.TextPipeline.hashBucket("split:")
    Tables.documents(spark, sfDir)
      .select(when(bucket < 90, "train").when(bucket < 95, "val")
        .otherwise("test").as("split"), col("n_chars"))
      .groupBy("split")
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        sum(col("n_chars")).cast(LongType).as("n_bytes"))
      .select(col("split"), col("n_rows"), col("n_bytes"),
        greatest(lit(1L),
          expr(s"(n_bytes + $targetBytes - 1) div $targetBytes"))
          .cast(LongType).as("n_files"))
      .withColumn("rows_per_file",
        expr("(n_rows + n_files - 1) div n_files").cast(LongType))
      .withColumn("verdict",
        when(col("n_bytes") * 2 < targetBytes, "coalesce_small")
          .when(col("n_bytes") > col("n_files") * targetBytes * 2,
            "split_large")
          .otherwise("ok"))
      .orderBy("split")
  }

  /** The DuckDB replay of [[layoutAdvisor]]. */
  private[graft] def layoutAdvisorOracleSql(
      targetBytes: Long = TargetFileBytes): String =
    s"""WITH lb AS (SELECT CASE
    WHEN CAST(list_sum(list_transform(range(4), dd ->
      CAST(strpos('0123456789abcdef', md5('split:' || CAST(doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)
        * (1::BIGINT << (4*(3-dd))))) % 100 AS BIGINT) < 90 THEN 'train'
    WHEN CAST(list_sum(list_transform(range(4), dd ->
      CAST(strpos('0123456789abcdef', md5('split:' || CAST(doc_id AS VARCHAR))[dd+1:dd+1]) - 1 AS BIGINT)
        * (1::BIGINT << (4*(3-dd))))) % 100 AS BIGINT) < 95 THEN 'val'
    ELSE 'test' END AS split, n_chars FROM documents),
lg AS (SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(n_chars) AS BIGINT) AS n_bytes FROM lb GROUP BY split),
lf AS (SELECT *, CAST(greatest(1, (n_bytes + $targetBytes - 1) // $targetBytes)
    AS BIGINT) AS n_files FROM lg)
SELECT split, n_rows, n_bytes, n_files,
  CAST((n_rows + n_files - 1) // n_files AS BIGINT) AS rows_per_file,
  CASE WHEN n_bytes * 2 < $targetBytes THEN 'coalesce_small'
    WHEN n_bytes > n_files * $targetBytes * 2 THEN 'split_large'
    ELSE 'ok' END AS verdict
FROM lf ORDER BY split"""
}
