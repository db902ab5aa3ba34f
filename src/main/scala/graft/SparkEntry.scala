package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.HealthCheckConfig
import graft.operators.{HealthCheckBatch, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has an entry in [[queries]]
  * (Spark side) and, when ANSI-SQL-expressible, a matching DuckDB oracle in
  * [[oracleSql]] with IDENTICAL column names and a total ORDER BY on both
  * sides.
  */
object SparkEntry {

  /** Flagship: the full health-check alarm pipeline replayed in batch —
    * tick grid -> 1-min windowed max -> threshold + missing-data evaluation ->
    * alarm transitions (SURVEY §2 A1/O1/O2/P13). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    HealthCheckBatch.alarmTransitions(spark, "/root/testdata/sf0.001",
      SyntheticCfg)

  /** Reference defaults are threshold=1s / period=1min (HealthCheckConfig());
    * the synthetic `events.value` column is ~uniform(0,200), so oracle
    * queries pin an explicit mid-range threshold instead.
    */
  private val SyntheticCfg = HealthCheckConfig(thresholdSeconds = 150.0)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Health-check pipeline operators (batch twins over `events`)
    "hc_tracer_encode" -> ((s, d) => HealthCheckBatch.tracerEncode(s, d)),
    "hc_decode_extract" -> ((s, d) => HealthCheckBatch.decodeExtract(s, d)),
    "hc_arn_parse" -> ((s, d) => HealthCheckBatch.arnParse(s, d)),
    "hc_latency_arrival" -> ((s, d) => HealthCheckBatch.latencyArrival(s, d)),
    "hc_latency_event_time" -> ((s, d) => HealthCheckBatch.latencyEventTime(s, d)),
    "hc_metric_projection" -> ((s, d) => HealthCheckBatch.metricProjectionQ(s, d)),
    "hc_threshold_filter" -> ((s, d) => HealthCheckBatch.thresholdFilter(s, d,
      HealthCheckConfig(thresholdSeconds = 100.0))),
    "hc_first_record" -> ((s, d) => HealthCheckBatch.firstRecord(s, d)),
    "hc_window_max" -> ((s, d) => HealthCheckBatch.windowMax(s, d)),
    "hc_gap_detect" -> ((s, d) => HealthCheckBatch.gapDetect(s, d)),
    "hc_alarm_transitions" -> ((s, d) =>
      HealthCheckBatch.alarmTransitions(s, d, SyntheticCfg)),
    // Relational coverage
    "q1_agg" -> ((s, d) => Relational.q1Agg(s, d)),
    "q3_topk" -> ((s, d) => Relational.q3TopK(s, d)),
    "q5_join" -> ((s, d) => Relational.q5Join(s, d)),
  )

  /** DuckDB-runnable oracle SQL for each key in [[queries]]. */
  def oracleSql: Map[String, String] = Map(
    "hc_tracer_encode" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS current_instant,
        |  '{"currentInstant":"' || strftime(ts, '%Y-%m-%dT%H:%M:%SZ') || '"}' AS tracer_json
        |FROM events ORDER BY event_id""".stripMargin,
    "hc_decode_extract" ->
      """SELECT event_id, props AS decoded,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "hc_arn_parse" ->
      """SELECT event_id,
        |  'arn:aws:kinesis:us-east-1:123456789012:stream/' || event_type AS arn,
        |  split_part(split_part('arn:aws:kinesis:us-east-1:123456789012:stream/' || event_type, ':', 6), '/', 2)
        |    AS stream_name
        |FROM events ORDER BY event_id""".stripMargin,
    "hc_latency_arrival" ->
      """WITH now_t AS (SELECT max(ts) AS now_ts FROM events)
        |SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
        |  date_diff('second', ts, now_ts) AS latency_s
        |FROM events, now_t ORDER BY event_id""".stripMargin,
    "hc_latency_event_time" ->
      """WITH now_t AS (SELECT max(ts) AS now_ts FROM events)
        |SELECT event_id,
        |  date_trunc('second', ts) AS event_ts,
        |  date_diff('second', date_trunc('second', ts), now_ts) AS latency_s
        |FROM events, now_t ORDER BY event_id""".stripMargin,
    "hc_metric_projection" ->
      """SELECT event_type AS "streamName", ts,
        |  'HealthCheckSinceSeconds' AS "metricName", value
        |FROM events ORDER BY "streamName", ts, value""".stripMargin,
    "hc_threshold_filter" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE value > 100.0 ORDER BY event_id""".stripMargin,
    "hc_first_record" ->
      """SELECT event_id, event_type, window_start, value FROM (
        |  SELECT event_id, event_type, date_trunc('minute', ts) AS window_start, value,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('minute', ts)
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY event_type, window_start""".stripMargin,
    "hc_window_max" ->
      """SELECT date_trunc('minute', ts) AS window_start, event_type,
        |  max(value) AS max_value, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "hc_gap_detect" ->
      """WITH b AS (SELECT event_type, date_trunc('minute', min(ts)) AS mn,
        |                  date_trunc('minute', max(ts)) AS mx
        |           FROM events GROUP BY event_type),
        |g AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM b),
        |p AS (SELECT DISTINCT event_type, date_trunc('minute', ts) AS minute FROM events)
        |SELECT g.event_type, g.minute FROM g
        |LEFT JOIN p ON g.event_type = p.event_type AND g.minute = p.minute
        |WHERE p.event_type IS NULL
        |ORDER BY g.event_type, g.minute""".stripMargin,
    "hc_alarm_transitions" ->
      """WITH b AS (SELECT event_type, date_trunc('minute', min(ts)) AS mn,
        |                  date_trunc('minute', max(ts)) AS mx
        |           FROM events GROUP BY event_type),
        |g AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 MINUTE)) AS minute FROM b),
        |m AS (SELECT event_type, date_trunc('minute', ts) AS minute, max(value) AS max_value
        |      FROM events GROUP BY 1, 2),
        |e AS (SELECT g.event_type, g.minute, m.max_value,
        |        CASE WHEN m.max_value IS NULL THEN 'ALARM'
        |             WHEN m.max_value > 150.0 THEN 'ALARM' ELSE 'OK' END AS state,
        |        CASE WHEN m.max_value IS NULL THEN 'missing_data'
        |             WHEN m.max_value > 150.0 THEN 'threshold' ELSE 'none' END AS reason
        |      FROM g LEFT JOIN m ON g.event_type = m.event_type AND g.minute = m.minute),
        |t AS (SELECT *, lag(state) OVER (PARTITION BY event_type ORDER BY minute) AS prev_state FROM e)
        |SELECT event_type, minute, state, reason, max_value FROM t
        |WHERE prev_state IS NULL OR prev_state <> state
        |ORDER BY event_type, minute""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM region, nation, customer, supplier, orders, lineitem
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND c_nationkey = n_nationkey AND s_nationkey = n_nationkey
        |  AND o_custkey = c_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
  )
}
