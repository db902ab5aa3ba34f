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

  /** Near-dup suppression within the watermark horizon, using ALL 4 MinHash
    * LSH bands — the same candidate rule as the batch twin
    * (TextPipeline.dedupMinHash): a document agreeing with an earlier one on
    * >= 1 band is a duplicate and is suppressed.
    *
    * Plan: explode the 4 band digests, `dropDuplicatesWithinWatermark` on
    * (band, digest) — keep-first, bounded state — then re-assemble per doc:
    * a document survives iff ALL of its band digests were first
    * occurrences. Every digest is registered regardless of whether its doc
    * survives, so transitive near-dup chains collapse to the first arrival,
    * like the batch pair set does.
    *
    * Two documented divergences from the batch twin:
    *  - no exact-Jaccard verification (that would need full shingle sets in
    *    state), so recall is a superset of the batch pairs: everything the
    *    batch suppresses is suppressed here, plus band-collision false
    *    positives the batch verify would reject;
    *  - the re-assembly is a windowed streaming aggregation, so survivors
    *    emit only once the watermark passes their second — exact multi-band
    *    semantics in append mode costs the watermark delay in latency
    *    (dedupExactStream, single-key, still emits immediately).
    *
    * Same-micro-batch tie: two identical documents in ONE batch may each win
    * a subset of the band keys (row order within a batch is arbitrary), in
    * which case BOTH are suppressed. Run [[dedupExactStream]] upstream —
    * the streaming analogue of the batch pipeline's exact pre-collapse —
    * when exact ties must keep a representative.
    *
    * Output contract (narrower than [[dedupExactStream]], which passes all
    * input columns through): (doc_id, text, eventTimeCol), with the event
    * time truncated to its 1-second re-assembly window start.
    *
    * Shuffle note: the band explode carries the text 4x into the dedup
    * shuffle (dedup state itself stores only (band, digest) + expiry).
    * Running behind [[dedupExactStream]] (the pipeline shape) bounds that to
    * distinct documents; if text were huge, explode (doc_id, band, digest)
    * only and re-join survivors — at the cost of a stream-stream join.
    */
  /** The streaming twin of the batch composite pipeline
    * (TextPipeline.dedupPipeline): exact digest dedup FIRST, then multi-band
    * near-dedup among the exact representatives. Besides matching the
    * production shape (exact collapse is the skew/state defense — a page
    * duplicated a million times contributes ONE row to every band key), the
    * pre-collapse resolves [[dedupNearStream]]'s same-micro-batch tie:
    * identical documents in one batch reduce to a single representative
    * before any band key is contested.
    */
  def dedupPipelineStream(docs: DataFrame, eventTimeCol: String,
      delay: String = "10 minutes"): DataFrame =
    dedupNearStream(
      dedupExactStream(docs, eventTimeCol, delay).drop("text_hash"),
      eventTimeCol, delay)

  def dedupNearStream(docs: DataFrame, eventTimeCol: String,
      delay: String = "10 minutes"): DataFrame = {
    val numBands = 4
    graft.expressions.VectorExpressions.register(docs.sparkSession)
    logInfo(s"streaming near-dedup on all $numBands LSH bands, watermark $delay")
    val exploded = docs
      .select(col("doc_id"), col("text"), col(eventTimeCol),
        posexplode(graft.expressions.VectorExpressions.minHashBandsNative(
          graft.expressions.VectorExpressions.shingleSetNative(col("text"))))
          .as(Seq("band", "digest")))
    // redefining a watermark is disallowed, so when the input is already
    // marked ON THIS COLUMN (e.g. chained after dedupExactStream in the
    // pipeline) reuse it; a watermark on some other column doesn't count —
    // the windowed re-assembly needs one on eventTimeCol
    val alreadyMarked = docs.queryExecution.logical.exists {
      case w: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
        w.eventTime.name == eventTimeCol
      case _ => false
    }
    val survivors =
      (if (alreadyMarked) exploded else exploded.withWatermark(eventTimeCol, delay))
        .dropDuplicatesWithinWatermark("band", "digest")
    survivors
      .groupBy(window(col(eventTimeCol), "1 second"), col("doc_id"))
      .agg(first(col("text")).as("text"),
        count(lit(1)).as("fresh_bands"))
      .filter(col("fresh_bands") === numBands)
      .select(col("doc_id"), col("text"),
        col("window.start").as(eventTimeCol))
  }
}
