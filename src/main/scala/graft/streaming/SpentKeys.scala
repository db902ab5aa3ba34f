package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.util.{CollectionAccumulator, LongAccumulator}

/** Driver-coordinated spent-key set for the streaming cap/budget twins.
  *
  * Problem it solves: `groupByKey(source)` ships EVERY row of a dominant
  * key to a single task per micro-batch forever, even after that key's
  * cap/budget is exhausted and the state side will only drain it. The
  * state-per-key defense (one counter, drain on arrival) bounds memory but
  * not the shuffle — at ingest scale the shuffle itself is the cost.
  *
  * Mechanism — all standard Spark machinery, nothing local-mode-only:
  *  - executors report exhausted keys through a [[CollectionAccumulator]]
  *    (executor→driver, merged on task completion);
  *  - the driver folds the accumulator into the `known` set between
  *    micro-batches ([[refresh]] — called by the [[attach]]ed
  *    StreamingQueryListener after every batch, or explicitly in tests);
  *  - the NEXT batch's task closures are serialized on the driver at task
  *    submission, so the map-side prefilter [[admit]] carries the current
  *    `known` set to executors with zero extra plumbing — rows of spent
  *    keys are dropped in place and never enter the shuffle.
  *
  * The set only ever grows (a spent cap stays spent), so staleness is
  * purely a missed optimization, never a correctness issue: a row that
  * slips through shuffles once and is drained by the state side exactly
  * as before. Retry safety comes from WHERE the operators report:
  * only the drain branch, whose exhausted-ness was read from the
  * previous COMMITTED state version — the batch that first reaches a cap
  * does NOT report, because its admissions are uncommitted and a
  * failed+retried batch must not find its own rows prefiltered (the set
  * therefore lags exhaustion by one drained arrival). After a
  * checkpoint restart the accumulator is empty; the first drained
  * arrival per spent key re-reports it, so the set repopulates without
  * any state-store coupling.
  *
  * One instance per logical stream — cap keys (sources) and budget keys
  * (languages) must not share an instance.
  *
  * [[shuffledRows]] counts rows that SURVIVED the prefilter (i.e. entered
  * the shuffle) — the observability hook the drop-happened-map-side spec
  * asserts on.
  */
final class SpentKeys(@transient spark: SparkSession) extends Serializable {
  private val reported: CollectionAccumulator[String] =
    spark.sparkContext.collectionAccumulator[String]("graft.spent_keys")
  private val survived: LongAccumulator =
    spark.sparkContext.longAccumulator("graft.spent_keys.shuffled_rows")
  @volatile private var known: Set[String] = Set.empty

  /** Executor-side: mark a key as exhausted (idempotent, re-reported on
    * every drained arrival so a restart heals the set).
    */
  def report(key: String): Unit = reported.add(key)

  /** Map-side prefilter: true iff the key was not known spent when this
    * batch's tasks were serialized. Counts surviving rows.
    */
  def admit(key: String): Boolean = {
    val pass = !known.contains(key)
    if (pass) survived.add(1L)
    pass
  }

  /** Driver-side: fold reported keys into the set the next batch sees,
    * then RESET the accumulator — spent keys re-report on every drained
    * arrival (that is what heals the set after a restart), so without the
    * reset the driver-side list would grow by one entry per spent key per
    * micro-batch forever. `known` itself only ever grows.
    */
  def refresh(): Unit = synchronized {
    known = known ++ reported.value.asScala
    reported.reset()
  }

  /** Rows that entered the shuffle so far (driver-side read). */
  def shuffledRows: Long = survived.value

  /** Keys currently known spent (driver-side read). */
  def spentSet: Set[String] = known

  @transient private var listener: StreamingQueryListener = _
  @transient private var attachedTo: SparkSession = _

  /** Production wiring: refresh after every micro-batch completes.
    * The listener fires on every query's progress in the session — safe
    * because reports are drain-only (committed-state-derived, see class
    * doc) and the fold is monotone; pair with [[detach]] when the stream
    * is torn down so a long-lived session does not accumulate listeners.
    */
  def attach(session: SparkSession): SpentKeys = synchronized {
    if (listener == null) {
      listener = new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = refresh()
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      attachedTo = session
      session.streams.addListener(listener)
    }
    this
  }

  /** Remove the [[attach]]ed listener (idempotent). Removal targets the
    * session the listener was actually registered on — passing a
    * DIFFERENT session (e.g. a newSession() clone with its own
    * StreamingQueryManager) is a no-op that leaves the attachment
    * intact, rather than nulling the handle while the listener leaks.
    */
  def detach(session: SparkSession): Unit = synchronized {
    if (listener != null && (session eq attachedTo)) {
      attachedTo.streams.removeListener(listener)
      listener = null
      attachedTo = null
    }
  }
}
