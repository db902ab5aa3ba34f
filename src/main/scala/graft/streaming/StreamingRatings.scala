package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Preference

/** Per-pool Elo rating state: source → (rating_micro, n_games, n_wins),
  * plus a monotone version so a consumer can pick each pool's latest
  * emission.
  */
case class EloPool(ratings: Map[String, (Long, Long, Long)], ver: Long)

/** One match arrival for [[StreamingRatings.eloStream]]: a NULL loser
  * registers `winner` in the pool's roster without playing a match (the
  * batch replay's roster-marker convention).
  */
case class EloMatch(lang: String, doc_id: Long, winner: String,
    loser: String)

/** Streaming twin of [[graft.operators.Preference.eloRatings]] — Elo IS
  * an online algorithm, so the stream is its native shape: matches
  * arrive keyed by rating pool (language here; arena/league in
  * production), each pool's state is its bounded roster of micro-BIGINT
  * ratings, and every micro-batch applies its matches in doc_id order
  * via the SAME [[Preference.eloStep]] the batch replay uses —
  * spec-proven equal on an ordered replay.
  *
  * Ordering contract: within a micro-batch, matches sort by doc_id;
  * across batches, arrival order IS match order (the online semantics —
  * an out-of-order late match is applied when it arrives, exactly like a
  * real leaderboard).
  */
object StreamingRatings {

  def eloStream(matches: Dataset[EloMatch]): DataFrame = {
    import matches.sparkSession.implicits._
    matches
      .groupByKey(_.lang)
      .flatMapGroupsWithState[EloPool,
        (String, String, Long, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (lang, rows, state: GroupState[EloPool]) =>
          val prev = state.getOption.getOrElse(EloPool(Map.empty, 0L))
          val pool = scala.collection.mutable.Map[String, (Long, Long, Long)](
            prev.ratings.toSeq: _*)
          rows.toSeq.sortBy(_.doc_id).foreach { m =>
            if (m.loser == null) {
              if (!pool.contains(m.winner))
                pool(m.winner) = (Preference.EloStart, 0L, 0L)
            } else {
              val (rw, gw, ww) =
                pool.getOrElse(m.winner, (Preference.EloStart, 0L, 0L))
              val (rl, gl, wl) =
                pool.getOrElse(m.loser, (Preference.EloStart, 0L, 0L))
              val (nw, nl) = Preference.eloStep(rw, rl)
              pool(m.winner) = (nw, gw + 1, ww + 1)
              pool(m.loser) = (nl, gl + 1, wl)
            }
          }
          val ver = prev.ver + 1
          state.update(EloPool(pool.toMap, ver))
          pool.toSeq.sortBy(_._1).iterator.map { case (s, (r, g, w)) =>
            (lang, s, g, w, r, ver)
          }
      }
      .toDF("lang", "source", "n_games", "n_wins", "rating_micro", "ver")
  }
}
