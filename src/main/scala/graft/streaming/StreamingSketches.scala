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
}
