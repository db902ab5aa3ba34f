package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming sessionization — the ingest twin of
  * [[graft.operators.RangeSession.sessionize]] (user activity sessions
  * with a 30-minute inactivity gap), built on Spark's NATIVE session
  * window: `session_window` merges events whose gap windows overlap, the
  * state store holds one open window per (user, session), and the
  * watermark closes and emits a session once no event can extend it —
  * constant state per active session, the exact operator a cluster runs
  * for product analytics at ingest time.
  *
  * Boundary convention: the native window starts a NEW session at
  * gap >= gapMinutes where the batch operator's `lag` test splits at
  * gap > gapMinutes — the two differ only on an event landing at the
  * exact gap boundary (a measure-zero tick; StreamingSessionsSpec pins
  * equivalence on the events fixture, which has no such tick).
  */
object StreamingSessions {

  /** Append-mode session aggregation over a watermarked (user_id, ts,
    * value) stream: one row per CLOSED session with the batch twin's
    * columns (minus its presentation-only session_seq).
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"),
        (unix_timestamp(col("session_end")) -
          unix_timestamp(col("session_start"))).cast(LongType)
          .as("duration_s"))
}
