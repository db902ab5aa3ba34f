package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the last Structured Streaming operator family
  * the engine's batch side ([[graft.operators.RangeSession]]) had no
  * online twin for.
  */
object StreamingJoins {

  /** Streaming twin of the batch interval join
    * ([[graft.operators.RangeSession.rangeJoinCounts]]'s pair-finding
    * core): click events LEFT OUTER joined to purchase events of the
    * same user within ±`toleranceSec` seconds, both sides watermarked so
    * Spark bounds the join state (a click can stop waiting for matches
    * once the purchase watermark passes its upper bound, and vice
    * versa) and unmatched clicks emit with a NULL purchase timestamp
    * once provably final.
    *
    * Emits the raw matched/unmatched PAIRS rather than per-click counts:
    * a stream-stream outer join followed by another stateful aggregation
    * would chain two stateful operators in one query — the pair stream
    * is the composable surface (count downstream, batch or in the sink).
    *
    * State size: bounded by events inside the watermark horizon — at any
    * volume the join buffers only `delay + tolerance` worth of rows per
    * side, the textbook watermarked interval-join shape.
    */
  def clickPurchaseJoinStream(clicks: DataFrame, purchases: DataFrame,
      toleranceSec: Int = 300, delay: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("event_id"), col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", delay)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
    c.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr(s"INTERVAL $toleranceSec SECONDS") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $toleranceSec SECONDS"),
      "leftOuter")
      .select(col("event_id"), col("user_id"), col("c_ts"), col("p_ts"))
  }
}
