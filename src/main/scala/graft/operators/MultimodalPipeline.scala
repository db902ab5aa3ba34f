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

  // ---------------------------------------- real-container metadata --

  /** Unsigned big-endian integer read from `len` payload bytes at 1-based
    * position `pos` — byte slicing via hex/conv so values >= 0x80 survive
    * (a UTF-8 decode would mangle them).
    */
  private def beUint(payload: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column, len: Int) =
    conv(hex(payload.substr(pos, lit(len))), 16, 10).cast(LongType)

  /** Big-endian u16 encode of a column value as 2 raw bytes. */
  private def u16(v: org.apache.spark.sql.Column) =
    unhex(lpad(hex(v.cast(LongType)), 4, "0"))

  /** Synthesize REAL baseline-JPEG byte streams, one per document: SOI +
    * APP0/JFIF + a COM segment whose length varies per row (so the SOF
    * marker position is NOT fixed — a parser must actually walk) + SOF0
    * carrying big-endian (height, width) + EOI. These are structurally
    * valid JPEG containers (any exif tool would read the dimensions);
    * only the entropy-coded scan data is absent, which metadata-level
    * decode never touches.
    */
  private def jpegTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val width = (pmod(col("n_chars"), lit(64)) + 1).cast(LongType)
    val height = (pmod(col("doc_id"), lit(48)) + 1).cast(LongType)
    val pad = pmod(col("doc_id"), lit(7)).cast(LongType) // COM body 0..6 B
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        unhex(lit("FFD8")), // SOI
        unhex(lit("FFE000104A46494600010100000100010000")), // APP0 JFIF
        unhex(lit("FFFE")), u16(pad + 2L), // COM marker + length
        encode(lit("graftpd").substr(lit(1), pad), "UTF-8"), // COM body
        unhex(lit("FFC0")), u16(lit(17L)), unhex(lit("08")), // SOF0, prec 8
        u16(height), u16(width),
        unhex(lit("03011100021101031101")), // 3 components
        unhex(lit("FFD9"))).as("payload"), // EOI
      width.as("true_width"), height.as("true_height"),
      (lit(25L) + pad).as("true_sof_at"))
  }

  /** REAL JPEG metadata decode as pure codegen'd expressions — the
    * marker-segment walk every JPEG tool performs, unrolled to a bounded
    * fold: starting at the first marker after SOI, read the marker byte;
    * an SOF0/1/2 (baseline/extended/progressive frame header) yields
    * height/width as the big-endian u16s at +5/+7; anything else is a
    * variable-length segment whose big-endian u16 at +2 says how far to
    * jump. `aggregate(sequence(...))` carries (pos, sof_at, h, w) across
    * up to `MaxSegments` steps — bounded, branch-free per row, inside
    * whole-stage codegen, payload bytes never leave the scan.
    *
    * This retires the "decode is a stub" caveat at the METADATA level:
    * the parser reads genuine JPEG structure (MultimodalSpec feeds it
    * hand-built multi-APPn/EXIF-shaped streams); only pixel-level decode
    * (the entropy-coded scan) still needs a codec the container lacks.
    */
  def mediaJpegMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val meta = jpegWalk(col("payload"))
    jpegTable(spark, sfDir)
      .select(col("media_id"), col("true_width"), col("true_height"),
        col("true_sof_at"), meta.as("meta"),
        (beUint(col("payload"), lit(1L), 2) === 65496L).as("soi_ok")) // FFD8
      .select(col("media_id"),
        col("soi_ok"),
        col("meta").getField("sof_at").as("sof_at"),
        col("meta").getField("w").as("width"),
        col("meta").getField("h").as("height"),
        // the round-trip audit: parsed values vs the construction inputs
        (col("meta").getField("w") === col("true_width") &&
          col("meta").getField("h") === col("true_height") &&
          col("meta").getField("sof_at") === col("true_sof_at"))
          .as("roundtrip_ok"))
      .orderBy("media_id")
  }

  /** The parse over ANY (media_id, payload) frame of JPEG bytes —
    * MultimodalSpec drives hand-built EXIF/multi-APPn/progressive
    * streams through it; output (media_id, sof_at, width, height),
    * -1s when no frame header is found within [[JpegMaxSegments]].
    */
  private[graft] def jpegMetaFrom(media: DataFrame): DataFrame = {
    val meta = jpegWalk(col("payload"))
    media.select(col("media_id"), meta.as("meta"))
      .select(col("media_id"),
        col("meta").getField("sof_at").as("sof_at"),
        col("meta").getField("w").as("width"),
        col("meta").getField("h").as("height"))
      .orderBy("media_id")
  }

  private val JpegMaxSegments = 8

  /** The marker-segment walk as ONE bounded expression fold: state =
    * (pos = next marker's 1-based FF position or -1 done; sof_at/h/w =
    * -1 until the frame header is found). Each step reads the marker
    * byte after the FF; SOF0/1/2 (baseline/extended/progressive) yields
    * the big-endian u16 dims at +5/+7, any other segment advances by
    * 2 + its big-endian u16 length.
    */
  private def jpegWalk(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val init = struct(lit(3L).as("pos"), lit(-1L).as("sof_at"),
      lit(-1L).as("h"), lit(-1L).as("w"))
    aggregate(
      sequence(lit(1), lit(JpegMaxSegments)), init, (acc, _) => {
        val pos = acc.getField("pos")
        val marker = beUint(payload, pos + 1L, 1)
        val isSof = marker === 192L || marker === 193L || marker === 194L
        val segLen = beUint(payload, pos + 2L, 2)
        when(acc.getField("sof_at") >= 0L, acc)
          .when(isSof, struct(lit(-1L).as("pos"), pos.as("sof_at"),
            beUint(payload, pos + 5L, 2).as("h"),
            beUint(payload, pos + 7L, 2).as("w")))
          .otherwise(struct((pos + 2L + segLen).as("pos"),
            lit(-1L).as("sof_at"), lit(-1L).as("h"), lit(-1L).as("w")))
      })
  }

  // ------------------------------------------- real PNG pixel decode --

  /** One REAL-decoded PNG record: dimensions and the exact luminance
    * statistics read from DECODED PIXELS (not header fields). */
  final case class PngFeatures(
      media_id: Long, width: Long, height: Long, n_pixels: Long,
      luma_sum: Long, luma_q4: Long)

  private final case class PngRow(media_id: Long, payload: Array[Byte])

  /** Deterministic pixel law shared by the encoder, the decoder spec,
    * and the DuckDB oracle: gray(x, y) of document d. */
  private[graft] def pngGray(d: Long, x: Int, y: Int): Int =
    ((d * 31 + x * 7 + y * 13) % 256).toInt

  /** Synthesize REAL PNG files, one per document — TYPE_BYTE_GRAY
    * images under the deterministic pixel law, encoded through the
    * JDK's pure-Java PNG writer (javax.imageio — DEFLATE/zlib and the
    * PNG container live in the JDK; no native codec involved). Small
    * dims (4-19 × 4-15) keep the synthesis data-proportional.
    *
    * mapPartitions (iterator-to-iterator): encoder setup amortized per
    * partition, payload bytes never leave their partition.
    */
  def pngTable(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val enc = Encoders.product[PngRow]
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .as(Encoders.product[(Long, Long)])
      .mapPartitions { rows =>
        rows.map { case (docId, nChars) =>
          val w = (nChars % 16 + 4).toInt
          val h = (docId % 12 + 4).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, pngGray(docId, x, y))
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          PngRow(docId, out.toByteArray)
        }
      }.toDF()
  }

  /** REAL pixel-level PNG decode — [[decodeFeatures]]' stub retired for
    * this format: every payload runs through the JDK's actual PNG
    * reader (zlib inflate, scanline un-filtering, 8-bit gray samples),
    * and the emitted statistics come from the DECODED RASTER. PNG is
    * lossless and 8-bit grayscale maps 1:1, so the luminance sum is an
    * exact integer the DuckDB oracle recomputes from the pixel law —
    * the hash-equality proves the encode→container→decode round trip
    * bit-for-bit. `luma_q4` is integer `div` of exact integers
    * (`luma_sum·10⁴ div n_pixels`) — no float anywhere.
    *
    * Scale: decode is mapPartitions (per-partition reader, no driver
    * round-trips); only (media_id, dims, two BIGINTs) ever shuffle.
    */
  def mediaPngFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val rowEnc = Encoders.product[PngRow]
    implicit val outEnc = Encoders.product[PngFeatures]
    pngTable(spark, sfDir).as[PngRow].mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += raster.getSample(x, y, 0)
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        PngFeatures(r.media_id, w.toLong, h.toLong, n, sum,
          sum * 10000L / n)
      }
    }.toDF().orderBy("media_id")
  }

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
    * AUDIO/VIDEO codecs are unavailable in this environment, so the
    * decode below is a DETERMINISTIC FAKE for those kinds: "luma" is a
    * byte-mean over the payload body, "frames" a fixed slicing — stable,
    * testable stand-ins with the same shapes/types a real decoder
    * (e.g. javacv/ffmpeg) would produce. Swap `fakeDecode` for a real
    * decoder binding; everything else stays. IMAGES are no longer
    * stubbed: [[mediaPngFeatures]] decodes REAL PNG pixels through the
    * JDK codec, and [[mediaJpegMeta]] parses REAL JPEG structure — only
    * formats needing native codecs keep the fake.
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
