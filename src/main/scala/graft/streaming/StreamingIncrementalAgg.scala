package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event arrival for [[StreamingIncrementalAgg.aggStream]] —
  * timestamps pre-resolved to epoch micros so the state carries only
  * integers (and the (ts_us, event_id) pair totally orders events, the
  * batch twin's struct-extremum contract).
  */
case class AggEvent(user_id: Long, ts_us: Long, event_id: Long,
    event_type: String, v_c: Long)

/** The per-user mergeable partial: exactly the metrics of
  * [[graft.operators.Relational.aggIncremental]], in merge form, plus a
  * monotone version for latest-emission selection.
  */
case class AggPartial(n: Long, sumC: Long, minTs: Long, maxTs: Long,
    firstTs: Long, firstId: Long, firstType: String,
    lastTs: Long, lastId: Long, lastType: String, ver: Long)

/** Streaming twin of [[graft.operators.Relational.aggIncremental]] —
  * the merge algebra IS the streaming shape: each micro-batch reduces
  * its arrivals to a per-user partial and merges it into the state
  * partial with the SAME merge functions the batch operator uses on its
  * history/delta frames (counts and micro-sums add, min/max combine,
  * first/last resolve by the total (ts_us, event_id) order). Because
  * merge is associative and commutative ACROSS batches for every
  * emitted metric, the stream lands every user exactly where the batch
  * full-log recompute does, regardless of how arrivals split into
  * micro-batches — spec-proven, including across a checkpoint
  * stop/restart.
  *
  * Scale: state per user is one constant-width partial (no event
  * retention); a micro-batch shuffles each user's arrivals once into
  * its state partition. This is the always-current serving shape of
  * the daily batch merge.
  */
object StreamingIncrementalAgg {

  def aggStream(events: Dataset[AggEvent]): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AggPartial,
        (Long, Long, Long, Long, Long, String, String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[AggPartial]) =>
          // reduce this batch's arrivals to one partial (fold order is
          // irrelevant: every metric's reducer is commutative)
          var p = state.getOption.getOrElse(
            AggPartial(0L, 0L, Long.MaxValue, Long.MinValue,
              Long.MaxValue, Long.MaxValue, null,
              Long.MinValue, Long.MinValue, null, 0L))
          rows.foreach { e =>
            val firstWins = e.ts_us < p.firstTs ||
              (e.ts_us == p.firstTs && e.event_id < p.firstId)
            val lastWins = e.ts_us > p.lastTs ||
              (e.ts_us == p.lastTs && e.event_id > p.lastId)
            p = AggPartial(
              n = p.n + 1,
              sumC = p.sumC + e.v_c,
              minTs = math.min(p.minTs, e.ts_us),
              maxTs = math.max(p.maxTs, e.ts_us),
              firstTs = if (firstWins) e.ts_us else p.firstTs,
              firstId = if (firstWins) e.event_id else p.firstId,
              firstType = if (firstWins) e.event_type else p.firstType,
              lastTs = if (lastWins) e.ts_us else p.lastTs,
              lastId = if (lastWins) e.event_id else p.lastId,
              lastType = if (lastWins) e.event_type else p.lastType,
              ver = p.ver)
          }
          val merged = p.copy(ver = p.ver + 1)
          state.update(merged)
          Iterator.single((uid, merged.n, merged.sumC, merged.minTs,
            merged.maxTs, merged.firstType, merged.lastType, merged.ver))
      }
      .toDF("user_id", "n_events", "sum_value_c", "min_ts_us",
        "max_ts_us", "first_type", "last_type", "ver")
  }
}
