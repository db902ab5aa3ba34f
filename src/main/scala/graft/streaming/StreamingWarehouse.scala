package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open SCD2 interval for one dimension key: current status, when it
  * started, and how many change rows this key has produced so far.
  */
case class Scd2State(status: String, validFromMs: Long, version: Long)

/** One user's funnel progress: epoch-ms of the first view, the first
  * click after it, and the first purchase after that (Long.MinValue =
  * stage not reached).
  */
case class FunnelState(vt: Long, ct: Long, pt: Long)

/** One user's cohort bookkeeping: first-activity week (epoch ms of the
  * Monday) and the week offsets already credited.
  */
case class CohortState(cohortMs: Long, seen: List[Long])

/** Streaming twin of [[graft.operators.Relational.scd2History]] — SCD
  * Type-2 change capture evaluated ONLINE: per key, a status observation
  * that differs from the current open interval CLOSES it (emitting the
  * finalized row with its valid_to and version) and opens the next. The
  * open interval is never emitted — Append-mode rows are final, exactly
  * the [[StreamingAnomaly]] minute-close discipline.
  *
  * On an ordered replay of the batch operator's observation stream
  * (one min-status row per (key, date)), the emitted rows EQUAL the
  * batch history's CLOSED intervals (valid_to IS NOT NULL) — spec-
  * proven. State per key is one (status, from, version) triple.
  */
object StreamingWarehouse {

  /** Input columns: (o_custkey, o_orderdate, status). Emits
    * (o_custkey, status, valid_from, valid_to, version) for every
    * interval closed by a later change on the same key.
    */
  def scd2Stream(obs: DataFrame): DataFrame = {
    import obs.sparkSession.implicits._
    obs
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp"),
        col("status"))
      .as[(Long, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Scd2State,
        (Long, String, Timestamp, Timestamp, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Timestamp, String)],
            state: GroupState[Scd2State]) =>
          val sorted = rows.toSeq.sortBy(_._2.getTime)
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Timestamp, Timestamp, Long)]
          var st = state.getOption.orNull
          sorted.foreach { case (_, ts, status) =>
            if (st == null) st = Scd2State(status, ts.getTime, 1L)
            else if (ts.getTime > st.validFromMs && status != st.status) {
              out += ((key, st.status, new Timestamp(st.validFromMs),
                ts, st.version))
              st = Scd2State(status, ts.getTime, st.version + 1)
            } // same status: the open interval absorbs it; late rows drop
          }
          if (st != null) state.update(st)
          out.iterator
      }
      .toDF("o_custkey", "status", "valid_from", "valid_to", "version")
  }

  private val WeekMs = 7L * 86400000L

  /** UTC Monday-00:00 of the timestamp's week — `date_trunc('week')`'s
    * exact rule, mirrored in the JVM for the streaming twin.
    */
  private def weekStartMs(ts: Timestamp): Long = {
    val d = java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val monday = d.minusDays((d.getDayOfWeek.getValue - 1).toLong)
    monday.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
  }

  /** Streaming twin of [[graft.operators.Relational.cohortRetention]]:
    * per user, credit each (cohort, week_offset) cell ONCE, online — the
    * first arrival fixes the user's cohort week (the ordered-replay
    * first-touch contract), later arrivals emit a cell increment the
    * first time their week offset appears. Counting emitted rows per
    * cell gives the batch triangle's n_active exactly (spec-proven).
    * State per user: the cohort week + the offsets already credited
    * (bounded by the calendar span, not by volume).
    */
  def cohortStream(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("ts").cast("timestamp"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CohortState, (Long, Timestamp, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp)],
            state: GroupState[CohortState]) =>
          val sorted = rows.toSeq.sortBy(_._2.getTime)
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Timestamp, Long)]
          sorted.foreach { case (_, ts) =>
            val w = weekStartMs(ts)
            if (st == null) st = CohortState(w, Nil)
            val off = (w - st.cohortMs) / WeekMs
            if (off >= 0 && !st.seen.contains(off)) {
              st = st.copy(seen = off :: st.seen)
              out += ((user, new Timestamp(st.cohortMs), off))
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
      .toDF("user_id", "cohort", "week_offset")
  }

  /** Streaming twin of [[graft.operators.Relational.eventFunnel]]'s
    * first-touch sequence match: per user, emit a stage-advance row the
    * moment the user first reaches view → click-after-view →
    * purchase-after-click. Counting the emitted rows per stage gives the
    * batch funnel's n_users exactly on an ordered replay (spec-proven).
    * State per user is three epoch longs; advances emit once, Append-
    * final.
    */
  def funnelStream(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("event_type"),
        col("ts").cast("timestamp"))
      .as[(Long, String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, (Long, String, Timestamp)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Timestamp)],
            state: GroupState[FunnelState]) =>
          val unset = Long.MinValue
          var st = state.getOption.getOrElse(FunnelState(unset, unset, unset))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Timestamp)]
          rows.toSeq.sortBy(_._3.getTime).foreach { case (_, tpe, ts) =>
            tpe match {
              case "view" if st.vt == unset =>
                st = st.copy(vt = ts.getTime)
                out += ((user, "view", ts))
              case "click" if st.vt != unset && st.ct == unset &&
                  ts.getTime > st.vt =>
                st = st.copy(ct = ts.getTime)
                out += ((user, "click_after_view", ts))
              case "purchase" if st.ct != unset && st.pt == unset &&
                  ts.getTime > st.ct =>
                st = st.copy(pt = ts.getTime)
                out += ((user, "purchase_after_click", ts))
              case _ =>
            }
          }
          state.update(st)
          out.iterator
      }
      .toDF("user_id", "stage", "at")
  }
}
