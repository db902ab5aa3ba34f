package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the batch text-analysis operators (TextPipeline) for
  * the ingest side of a training-data pipeline.
  */
object StreamingText extends Logging {

  /** Streaming vocabulary build — windowed token counts over a document
    * stream, the ingest-side twin of TextPipeline.textVocab. Append-mode
    * windowed aggregation: token counts finalize (and state drops) once the
    * watermark passes each window, so state is bounded by
    * (windows-in-flight x vocab) regardless of stream length. At 100 TB/day
    * the explode fans out on executors and the count is map-side partial.
    */
  def vocabStream(docs: DataFrame, eventTimeCol: String,
      windowLen: String = "1 minute", delay: String = "10 minutes"): DataFrame = {
    logInfo(s"streaming vocab, window $windowLen, watermark $delay")
    docs
      .withWatermark(eventTimeCol, delay)
      .select(col(eventTimeCol),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(window(col(eventTimeCol), windowLen), col("token"))
      .count()
      .select(col("window.start").as("window_start"), col("token"),
        col("count").as("n"))
  }

  /** Streaming quality gate — per-document quality scoring and filtering on
    * ingest (stateless projection; the streaming twin of
    * TextPipeline.textQuality). Passes every input column through plus the
    * score; drop rows below `minQuality` before they ever hit storage.
    */
  def qualityFilterStream(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions._
    val toks = tokens(col("text"))
    val nTokens = size(toks).cast("double")
    val lengthScore = least(lit(1.0), nTokens / 50.0)
    val stopScore = least(lit(1.0),
      stopwordHits(toks, LangProfiles.toMap.apply("en")).cast("double")
        / nTokens * 5.0)
    val diversity = size(array_distinct(toks)).cast("double") / nTokens
    val quality = lengthScore * 0.4 + stopScore * 0.3 + diversity * 0.3
    docs.withColumn("quality", round(quality, 4))
      .filter(col("quality") >= minQuality)
  }
}
