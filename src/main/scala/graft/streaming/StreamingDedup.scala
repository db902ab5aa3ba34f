package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Streaming deduplication for document ingest — the watermarked variant of
  * the batch dedup family (TextPipeline), built on
  * `dropDuplicatesWithinWatermark`: state for a key is dropped once the
  * watermark passes its expiry, so the dedup store stays bounded no matter
  * how long the stream runs (the only viable shape at 100 TB/day ingest —
  * an unbounded `dropDuplicates` would accrete state forever).
  */
object StreamingDedup extends Logging {

  /** Exact dedup on normalized-text digest within the watermark horizon.
    * Emits one representative per digest (arbitrary within a micro-batch,
    * earliest batch across batches); re-emits only if the same text
    * reappears after its state has expired.
    */
  def dedupExactStream(docs: DataFrame, eventTimeCol: String,
      delay: String = "10 minutes"): DataFrame = {
    logInfo(s"streaming exact dedup on md5(text), watermark $delay")
    docs
      .withColumn("text_hash", md5(lower(trim(col("text")))))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")
  }

  /** Near-dup suppression within the watermark horizon: key = the FIRST
    * MinHash LSH band digest. Cheap single-signature variant of the batch
    * MinHash dedup — two documents that agree on band 0 are treated as
    * duplicates (tunable recall/precision by banding config upstream).
    */
  def dedupNearStream(docs: DataFrame, eventTimeCol: String,
      delay: String = "10 minutes"): DataFrame = {
    logInfo(s"streaming near-dedup on LSH band digest, watermark $delay")
    docs
      .withColumn("band0",
        element_at(lshBandDigests(shingleSet(col("text"))), 1))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("band0")
  }
}
