package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.operators.Sketches

/** Streaming twin of the [[graft.operators.Sketches]] HLL family: emit
  * per-window register frames, not estimates. The estimate needs a second
  * aggregation over the registers, which a single streaming query cannot
  * stack — and emitting registers is the PRODUCTION shape anyway: each
  * window's frame is <= #langs x 256 rows, and the mergeable-sketch
  * property means a batch reader unions any set of emitted windows
  * through `Sketches.hllMerge` + `hllEstimate` to get the distinct count
  * over exactly that span (hour, day, whole stream) without re-reading
  * text. This is the same emit-frames-merge-later discipline as
  * `Sketches.appendHllShard`/`estimateHllStore`, with the window as the
  * shard.
  *
  * State per in-flight window: the register maxes — constant (#langs x
  * 256 longs) regardless of arrival rate, the defining reason to sketch
  * a stream instead of counting it. Append mode: a window's frame is
  * emitted once, when the watermark passes its end.
  */
object StreamingSketches {

  def hllRegisterStream(docs: DataFrame, eventTimeCol: String,
      windowLen: String = "1 minute", delay: String = "10 minutes")
      : DataFrame = {
    val tok = docs.withWatermark(eventTimeCol, delay)
      .select(col(eventTimeCol), col("lang"),
        explode(tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
    Sketches.registerRows(tok, keep = Seq(col(eventTimeCol)))
      .groupBy(window(col(eventTimeCol), windowLen),
        col("lang"), col("register"))
      .agg(max(col("r")).as("rho"))
      .select(col("window.start").as("window_start"),
        col("lang"), col("register"), col("rho"))
  }

  /** Streaming count-min: per-window (row, cell) counter frames over the
    * SAME d x w coordinates as the batch sketch (`Sketches.cmsCellArray`),
    * so a reader sums any set of emitted windows cell-wise to get the
    * sketch over exactly that span — CMS merges by ADDITION where HLL
    * merges by max, and both twins emit frames rather than estimates for
    * the same merge-later reason. State per in-flight window: d x w
    * counters, constant whatever the arrival rate.
    */
  def cmsCellStream(docs: DataFrame, eventTimeCol: String,
      windowLen: String = "1 minute", delay: String = "10 minutes")
      : DataFrame =
    docs.withWatermark(eventTimeCol, delay)
      .select(col(eventTimeCol),
        explode(tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .select(col(eventTimeCol), explode(Sketches.cmsCellArray).as("rc"))
      .groupBy(window(col(eventTimeCol), windowLen),
        col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("row"), col("cell"), col("cnt"))

  /** Streaming histogram: per-window (bin, cnt) frames with the SAME bin
    * geometry as `Sketches.histRegistersFrom`, so a reader sums any set of
    * emitted windows per bin (histograms merge by addition, like CMS) and
    * estimates quantiles over exactly that span through
    * `Sketches.histQuantilesFrom` — the latency-percentile-over-time shape
    * every ingest monitor needs. State per in-flight window: #bins
    * counters, constant whatever the arrival rate.
    */
  def histBinStream(docs: DataFrame, valueCol: String, eventTimeCol: String,
      windowLen: String = "1 minute", delay: String = "10 minutes")
      : DataFrame =
    docs.withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowLen),
        floor(col(valueCol) / Sketches.HistWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("bin"), col("cnt"))

  /** Streaming Poisson-bootstrap CI partials — the windowed error-bar
    * monitor ([[graft.operators.DataQuality.bootstrapCi]]'s twin,
    * round 13): per window, the B = 32 resample partials
    * (b, sx = Σ w·n_chars, sw = Σ w) under the SAME deterministic
    * hash-Poisson weights as the batch operator, plus the window's own
    * totals (n_docs, tx) on every row. Every column merges by per-b
    * ADDITION (the CMS/hist merge-later discipline): a reader sums any
    * set of emitted windows and finishes with
    * [[graft.operators.DataQuality.ciFromPartials]] to get the mean ±
    * CI over exactly that span — spec-proven equal to the batch
    * bootstrap over the same documents. State per in-flight window: 32
    * counter rows, constant whatever the arrival rate — the defining
    * bootstrap-at-scale property (Chamandy'12): no resample ever holds
    * data, only sums.
    */
  def ciPartialStream(docs: DataFrame, eventTimeCol: String,
      windowLen: String = "1 minute", delay: String = "10 minutes")
      : DataFrame =
    docs.withWatermark(eventTimeCol, delay)
      .select(col(eventTimeCol), col("doc_id"), col("n_chars"),
        explode(sequence(lit(0),
          lit(graft.operators.DataQuality.BootstrapB - 1))).as("b"))
      .select(col(eventTimeCol), col("b"),
        graft.operators.DataQuality.poissonWeight.as("w"), col("n_chars"))
      .groupBy(window(col(eventTimeCol), windowLen), col("b"))
      .agg(sum(col("w") * col("n_chars")).as("sx"),
        sum(col("w")).as("sw"),
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_chars")).cast("long").as("tx"))
      .select(col("window.start").as("window_start"), col("b"),
        col("sx"), col("sw"), col("n_docs"), col("tx"))
}
