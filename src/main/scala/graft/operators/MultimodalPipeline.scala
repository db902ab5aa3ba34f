package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payload
  * columns with typed metadata, processed batch-at-a-time.
  *
  * The container has no media codecs, so the DECODE step is a deterministic
  * STUB (clearly marked below); everything around it — the binary schema,
  * header layout, expression-level metadata parsing, frame slicing, the
  * partition-iterator batch shape — is real and oracle/test-covered. The
  * payloads themselves are synthesized deterministically from `documents`
  * (magic + kind + dimensions header, body = the UTF-8 text), which makes
  * header parsing a genuine round-trip check.
  *
  * Scale notes: payload bytes never leave their partition — metadata parse,
  * frame slice, and feature extraction are all per-row expressions or
  * mapPartitions (iterator-to-iterator, the JVM analogue of a vectorized
  * batch UDF: per-partition setup amortized, no driver round-trips, spill-
  * safe). Only the small extracted features (ids, dims, hashes) ever shuffle.
  */
object MultimodalPipeline {

  /** Header layout (bytes): 0-1 magic "GR", 2 kind, 3 width, 4 height. */
  private val HeaderLen = 5
  private val Magic = "GR"

  /** Synthesize the media table: deterministic payload per document.
    * kind cycles image/audio/video; width/height derive from doc fields.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType))
    val width = (pmod(col("n_chars"), lit(64)) + 1).cast(IntegerType)
    val height = (pmod(col("doc_id"), lit(48)) + 1).cast(IntegerType)
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        encode(lit(Magic), "UTF-8"),
        encode(chr(pmod(col("doc_id"), lit(3)) + 65), "UTF-8"), // kind byte
        encode(chr(width + 32), "UTF-8"),
        encode(chr(height + 32), "UTF-8"),
        encode(col("text"), "UTF-8")).as("payload"),
      kind.as("kind"), width.as("true_width"), height.as("true_height"))
  }

  /** Metadata extraction by PARSING the binary header back out —
    * expression-only (substring/ascii on binary), no UDF. The oracle
    * recomputes the same fields from the source columns, so equality proves
    * the encode->parse round trip.
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val m = mediaTable(spark, sfDir)
    val header = (i: Int) => ascii(decodeHeaderChar(col("payload"), i))
    m.select(
      col("media_id"),
      decodeUtf8Sub(col("payload"), 1, 2).as("magic"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        header(3) - 64).as("kind"),
      (header(4) - 32).cast(LongType).as("width"),
      (header(5) - 32).cast(LongType).as("height"),
      (length(col("payload")) - HeaderLen).cast(LongType).as("body_bytes"),
      md5(substring(col("payload"), HeaderLen + 1, Int.MaxValue))
        .as("body_md5"))
      .orderBy("media_id")
  }

  private def decodeHeaderChar(payload: org.apache.spark.sql.Column, pos: Int) =
    decode(substring(payload, pos, 1), "UTF-8")

  private def decodeUtf8Sub(payload: org.apache.spark.sql.Column,
      pos: Int, len: Int) = decode(substring(payload, pos, len), "UTF-8")

  /** Frame sampling: the body sliced into fixed 16-byte frames, keeping
    * every 4th (video keyframe thinning) — pure expressions (sequence ->
    * transform -> explode), each frame identified by an md5. At scale this
    * is the fan-out step before per-frame decode; slicing stays inside the
    * scan's codegen stage.
    */
  def mediaFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val frameLen = 16
    val stride = 4
    val body = decodeUtf8Sub(col("payload"), HeaderLen + 1, Int.MaxValue)
    val nFrames = floor((length(body) + frameLen - 1) / frameLen)
      .cast(IntegerType)
    mediaTable(spark, sfDir)
      .select(col("media_id"), body.as("body"), nFrames.as("n"))
      .select(col("media_id"), col("n").cast(LongType).as("n_frames"),
        posexplode(transform(
          sequence(lit(0), greatest(
            floor((col("n") - 1) / stride).cast(IntegerType), lit(0))),
          i => md5(substring_index_frame(col("body"), i * stride, frameLen))))
          .as(Seq("sample_idx", "frame_md5")))
      .select(col("media_id"), col("n_frames"),
        col("sample_idx").cast(LongType).as("sample_idx"), col("frame_md5"))
      .orderBy("media_id", "sample_idx")
  }

  private def substring_index_frame(body: org.apache.spark.sql.Column,
      frameIdx: org.apache.spark.sql.Column, frameLen: Int) =
    body.substr(frameIdx * frameLen + 1, lit(frameLen))

  /** Resize planning + deterministic re-encode digest: fit each medium into
    * a `target` x `target` box preserving aspect ratio (exact integer
    * arithmetic — `div`, no float rounding ambiguity cross-engine), and
    * stamp the output with the digest of (body, out dims) — the shape of a
    * real resize stage minus the codec (decode itself stays the declared
    * stub). Dimensions are PARSED back from the binary header, so this also
    * round-trips the envelope; everything is per-row expressions, payload
    * bytes never shuffle.
    */
  def mediaResize(spark: SparkSession, sfDir: String, target: Int = 32): DataFrame = {
    val m = mediaTable(spark, sfDir)
    val header = (i: Int) => ascii(decodeHeaderChar(col("payload"), i))
    val parsed = m.select(
      col("media_id"),
      (header(4) - 32).cast(LongType).as("width"),
      (header(5) - 32).cast(LongType).as("height"),
      decodeUtf8Sub(col("payload"), HeaderLen + 1, Int.MaxValue).as("body"))
    parsed
      .withColumn("out_w", greatest(lit(1L),
        expr(s"width * $target div greatest(width, height)")))
      .withColumn("out_h", greatest(lit(1L),
        expr(s"height * $target div greatest(width, height)")))
      .select(col("media_id"), col("width"), col("height"),
        col("out_w"), col("out_h"),
        md5(concat(col("body"), lit("x"), col("out_w").cast(StringType),
          lit("x"), col("out_h").cast(StringType))).as("resized_md5"))
      .orderBy("media_id")
  }

  /** Exact media dedup — digest the payload BODY, not the container: the
    * same content re-wrapped with different header metadata (dims, kind
    * byte) is still a duplicate, which is how a real media-dedup stage
    * treats re-encodes of identical frames. One shuffle on the 16-byte
    * digest (map-side partial agg); payload bytes never leave their
    * partition — only the digest shuffles, exactly like [[dedupExact]] on
    * text.
    */
  def mediaDedup(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("media_id"), col("kind"),
        md5(decodeUtf8Sub(col("payload"), HeaderLen + 1, Int.MaxValue))
          .as("content_md5"))
      .groupBy(col("content_md5"))
      .agg(min(col("media_id")).as("keep_media_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("kind")).as("n_kinds"))
      .orderBy("keep_media_id")

  /** WebDataset-style shard planner: pack each modality's media records,
    * in media_id order, into shards of ~`shardBytes` payload bytes — the
    * manifest a tar-shard writer consumes. A record lands in the shard its
    * cumulative START offset falls in (the [[TextPipeline.packChunks]]
    * admission rule, byte-denominated), so shards may straddle by one
    * record, never split one.
    *
    * Plan shape: only (media_id, kind, n_bytes) rows enter the
    * [[TextPipeline.packChunksCore]] two-level prefix sum — payload bytes
    * never shuffle, and no per-kind window spans a modality (the shard key
    * subdivides it). At 100 TB this plans a million-shard layout with the
    * corpus-sized exchange carrying 24-byte rows.
    */
  def mediaShardPlan(spark: SparkSession, sfDir: String,
      shardBytes: Int = 4096, shardWidth: Long = 64): DataFrame =
    TextPipeline.packChunksCore(
      mediaTable(spark, sfDir).select(
        col("media_id").as("doc_id"),
        col("kind").as("lang"),
        length(col("payload")).cast(LongType).as("n_tokens")),
      shardBytes, shardWidth)
      .select(col("lang").as("kind"), col("chunk_id").as("shard_id"),
        col("n_docs").as("n_items"), col("chunk_tokens").as("shard_bytes"),
        col("first_doc").as("first_id"), col("last_doc").as("last_id"))
      .orderBy("kind", "shard_id")

  /** One decoded media record (STUBBED decode — see [[decodeFeatures]]). */
  final case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int,
      luma_mean: Double, n_frames: Int)

  /** Input row shape for the typed decode stage (encoder needs public access). */
  final case class MediaRow(
      media_id: Long, payload: Array[Byte], kind: String,
      true_width: Int, true_height: Int)

  /** Batch-shaped decode + feature extraction: `mapPartitions` over the
    * typed Dataset — per-partition decoder setup, iterator in / iterator
    * out (the JVM analogue of a vectorized batch UDF over media batches).
    *
    * ========================= STUB =========================
    * Real media codecs are unavailable in this environment. The decode below
    * is a DETERMINISTIC FAKE: "luma" is a byte-mean over the payload body,
    * "frames" a fixed slicing — stable, testable stand-ins with the same
    * shapes/types a real decoder (e.g. javacv/ffmpeg) would produce. Swap
    * `fakeDecode` for a real decoder binding; everything else stays.
    * ========================================================
    */
  def decodeFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    implicit val rowEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[MediaFeatures]
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init would go here (amortized across batch)
      rows.map { r =>
        val (lumaMean, nFrames) = fakeDecode(r.payload)
        MediaFeatures(r.media_id, r.kind, r.true_width, r.true_height,
          lumaMean, nFrames)
      }
    }
  }

  /** STUB decoder: deterministic byte statistics in place of codec output. */
  private def fakeDecode(payload: Array[Byte]): (Double, Int) = {
    val body = payload.drop(HeaderLen)
    val mean = if (body.isEmpty) 0.0
      else body.map(b => (b & 0xff).toDouble).sum / body.length
    (math.rint(mean * 10000) / 10000, (body.length + 15) / 16)
  }
}
