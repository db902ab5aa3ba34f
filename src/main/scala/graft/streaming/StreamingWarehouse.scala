package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open SCD2 interval for one dimension key: current status, when it
  * started, and how many change rows this key has produced so far.
  */
case class Scd2State(status: String, validFromMs: Long, version: Long)

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
}
