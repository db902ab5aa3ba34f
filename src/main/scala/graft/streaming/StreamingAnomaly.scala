package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Rolling state of one metric key: the minute currently being filled and
  * the trailing CLOSED minute maxes (newest last, capped at the baseline
  * length). Sums are re-derived from the history on each close, so the
  * state carries no float accumulators that could drift from the batch
  * twin's DECIMAL arithmetic.
  */
case class AnomalyState(openMinute: Long, openMax: Double,
    history: List[Double])

/** Streaming twin of
  * [[graft.operators.DataQuality.metricAnomalyFrom]] — the adaptive-
  * baseline alarm evaluated ONLINE: per event_type, close each minute's
  * max as the stream advances and score it against the trailing 30
  * closed minutes' mean/std (same 3-sigma flag, same >= 10 warmup).
  *
  * Exactness contract (the domainCapStream discipline): on an ordered
  * replay the emitted rows EQUAL the batch operator's output for every
  * minute the stream has moved past (spec-proven) — the z arithmetic
  * mirrors the batch DECIMAL(18,6) sums via BigDecimal, so there is no
  * float-accumulation drift between the twins. Out-of-order rows within
  * a micro-batch are time-sorted before folding; a row older than the
  * open minute is counted into its minute only if that minute is still
  * open (late data past a closed minute is dropped — the watermark
  * trade, stated rather than hidden).
  *
  * Scale shape: state per event_type is one open accumulator + <= 30
  * doubles — constant regardless of stream length or volume; emission is
  * Append (closed minutes are final, never revised).
  */
object StreamingAnomaly {

  private[streaming] val BaselineLen = 30
  private[streaming] val Warmup = 10

  /** The one z-score arithmetic shared by [[anomalyStream]] and the
    * adaptive alarm mode ([[AlarmStateProcessor]]): per-value
    * DECIMAL(18,6) quantization, exact sums, then the identical
    * double-precision mean/variance/z tree as the batch twin. None until
    * warmup; otherwise (mean, z) — the anomaly flag is |z| > 3 on the RAW
    * z, before any output rounding.
    */
  private[streaming] def zOf(history: List[Double],
      x: Double): Option[(Double, Double)] = {
    val n = history.length
    if (n < Warmup) None
    else {
      val decs = history.map(v =>
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      val s1 = decs.sum.toDouble
      val s2 = decs.map(d => d * d).sum.toDouble
      val mean = s1 / n
      val variance = math.max((s2 - s1 * s1 / n) / (n - 1), 0.0)
      val z = if (math.sqrt(variance) > 0.0) (x - mean) / math.sqrt(variance)
        else 0.0
      Some((mean, z))
    }
  }

  /** (event_type, minute, mx, baseline_mean, z, is_anomaly) rows for
    * every minute closed by a later arrival on the same key.
    */
  def anomalyStream(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type"), col("ts").cast("timestamp").as("ts"),
        col("value"))
      .as[(String, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyState,
        (String, Timestamp, Double, Double, Double, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Timestamp, Double)],
            state: GroupState[AnomalyState]) =>
          val sorted = rows.toSeq.sortBy(_._2.getTime)
          var st = state.getOption.getOrElse(AnomalyState(Long.MinValue,
            Double.NaN, Nil))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, Timestamp, Double, Double, Double, Boolean)]
          def close(): Unit = if (st.openMinute != Long.MinValue) {
            score(key, st).foreach(out += _)
            st = st.copy(
              history = (st.history :+ st.openMax).takeRight(BaselineLen))
          }
          sorted.foreach { case (_, ts, v) =>
            val m = ts.getTime - Math.floorMod(ts.getTime, 60000L)
            if (m > st.openMinute) {
              close()
              st = st.copy(openMinute = m, openMax = v)
            } else if (m == st.openMinute) {
              st = st.copy(openMax = math.max(st.openMax, v))
            } // m < openMinute: late past a closed minute — dropped
          }
          state.update(st)
          out.iterator
      }
      .toDF("event_type", "minute", "mx", "baseline_mean", "z", "is_anomaly")
  }

  /** Score the open minute against the trailing history — the exact
    * arithmetic of the batch twin: per-value DECIMAL(18,6) quantization,
    * exact sums, then the identical double-precision mean/variance/z
    * expression tree.
    */
  private def score(key: String,
      st: AnomalyState): Option[(String, Timestamp, Double, Double, Double, Boolean)] =
    zOf(st.history, st.openMax).map { case (mean, z) =>
      (key, new Timestamp(st.openMinute), st.openMax,
        BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        math.abs(z) > 3.0)
    }
}
