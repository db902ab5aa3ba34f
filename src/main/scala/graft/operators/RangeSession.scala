package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Range (interval) join and sessionization — two more operator classes
  * Spark either lacks (range join without a cross product) or that deserve
  * an explicit scale-safe shape.
  */
object RangeSession {

  /** Range join via bucketing: for every click, count the same user's
    * purchases within +-`windowSec`. Each right row is replicated into its
    * bucket and both neighbors (explode), then an EQUI-join on
    * (user, bucket) + an exact |dt| filter — the shuffle is keyed, the
    * candidate set per row is ~3 buckets, and there is no inequality-join
    * cross product (which Spark would otherwise plan as a nested loop over
    * the key group). Bucket width = the range bound, so every true match
    * falls in a neighbor bucket by construction.
    */
  def rangeJoinCounts(spark: SparkSession, sfDir: String,
      windowSec: Long = 300): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("t"))
      .withColumn("bucket", (col("t") / windowSec).cast(LongType))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_timestamp(col("ts")).as("pt"))
      .withColumn("bucket", explode(array(
        (col("pt") / windowSec).cast(LongType) - 1,
        (col("pt") / windowSec).cast(LongType),
        (col("pt") / windowSec).cast(LongType) + 1)))
    clicks
      .join(purchases, Seq("user_id", "bucket"), "left")
      .withColumn("hit",
        when(col("pt").isNotNull && abs(col("pt") - col("t")) <= windowSec, 1L)
          .otherwise(0L))
      .groupBy(col("event_id"), col("user_id"), col("t"))
      .agg(sum(col("hit")).as("n_nearby_purchases"))
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("t")).as("ts"), col("n_nearby_purchases"))
      .orderBy("event_id")
  }

  /** Sessionization (gaps-and-islands): per-user sessions split on
    * `gapMinutes` of inactivity; one row per session with bounds and size.
    * One shuffle on the user key, two window passes (lag -> boundary flags,
    * running sum -> session ids) — the standard distributed shape; a user's
    * events stay in one partition.
    */
  def sessionize(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) >
            gapMinutes * 60L).cast(IntegerType))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_s"))
      .orderBy("user_id", "session_seq")
  }

  /** SFT dialogue packing over event sessions — the conversation-prep
    * accountant an instruction-tuning pipeline runs: each [[sessionize]]
    * session becomes a dialogue, each event a turn (odd turn = user, even
    * turn = assistant), turn length estimated with the ~4-chars-per-token
    * rule over (event_type + props). Sessions longer than `contextTokens`
    * are truncated FROM THE LEFT (keep the most recent suffix that fits —
    * the standard chat-SFT window policy), and the loss-mask accounting
    * reports how many supervised (assistant) tokens survive: a session
    * whose kept suffix is all user turns contributes nothing to the loss
    * and should be dropped upstream.
    *
    * Scale: one shuffle on the user key (session assignment), then
    * session-keyed windows — a user's events stay in one partition; state
    * per session is a handful of counters. No text moves beyond lengths.
    *
    * The default context is 8 tokens: the synthetic events' turns are a
    * few tokens each, and the driver surface must exercise the truncation
    * path (at 64 no session truncates and the accountant is dead code);
    * production passes its real context size.
    */
  def sftPack(spark: SparkSession, sfDir: String, gapMinutes: Int = 30,
      contextTokens: Int = 8): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("props"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) >
            gapMinutes * 60L).cast(IntegerType))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(LongType))
    val bySess = Window.partitionBy("user_id", "session_seq")
      .orderBy("ts", "event_id")
    val turns = flagged
      .withColumn("turn_idx", row_number().over(bySess).cast(LongType))
      .withColumn("turn_tokens",
        floor((length(col("event_type")) + length(col("props")) + lit(3))
          / 4.0d).cast(LongType))
    val rcum = turns.withColumn("rcum",
      sum(col("turn_tokens")).over(
        Window.partitionBy("user_id", "session_seq")
          .orderBy(col("turn_idx").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val kept = col("rcum") <= contextTokens
    rcum.groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_turns"),
        sum(col("turn_tokens")).as("total_tokens"),
        sum(when(kept, 1L).otherwise(0L)).as("kept_turns"),
        coalesce(sum(when(kept, col("turn_tokens"))), lit(0L))
          .as("kept_tokens"),
        coalesce(sum(when(kept && col("turn_idx") % 2 === 0,
          col("turn_tokens"))), lit(0L)).as("assistant_tokens"))
      .select(col("user_id"), col("session_seq"), col("n_turns"),
        col("total_tokens"), col("kept_turns"), col("kept_tokens"),
        col("assistant_tokens"),
        (col("total_tokens") > contextTokens).as("truncated"))
      .orderBy("user_id", "session_seq")
  }
}
