package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payload
  * columns with typed metadata, processed batch-at-a-time.
  *
  * Real decode coverage (each a byte-level walk or JDK codec over
  * structurally-valid synthesized containers, oracle-replayed): JPEG
  * marker segments, PNG pixels, RIFF/WAVE PCM samples, ISO-BMFF boxes,
  * MPEG-1 Layer III frame chains (ID3v2-tagged), AAC ADTS frame chains,
  * and H.264 AVCC NAL units (SPS profile/level). Only full sample/pixel
  * SYNTHESIS of compressed codecs (MDCT/DCT decode) remains a
  * deterministic STUB (clearly marked below) — the environment ships no
  * such codec. The payloads themselves are synthesized deterministically
  * from `documents`, which makes every parse a genuine round-trip check.
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
    * Full AUDIO/VIDEO sample synthesis (MDCT/DCT decode) needs codecs
    * the environment lacks, so the decode below is a DETERMINISTIC FAKE
    * at that level only: "luma" is a byte-mean over the payload body,
    * "frames" a fixed slicing — stable, testable stand-ins with the
    * same shapes/types a real decoder (e.g. javacv/ffmpeg) would
    * produce. Swap `fakeDecode` for a real decoder binding; everything
    * else stays. Everything ABOVE the sample level is REAL:
    * [[mediaPngFeatures]] decodes actual PNG pixels (JDK codec),
    * [[mediaWavFeatures]] actual PCM samples (javax.sound),
    * [[mediaJpegMeta]] walks real JPEG markers, [[mediaMp4Meta]] real
    * BMFF boxes, [[mediaMp3Meta]] real MPEG-1 L3 frame headers,
    * [[mediaAacMeta]] real ADTS frames, and [[mediaH264Meta]] real AVCC
    * NAL units with SPS profile/level.
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

  // ------------------------------------- real MP4 container metadata --

  /** Big-endian u32 encode of a column value as 4 raw bytes. */
  private def u32be(v: org.apache.spark.sql.Column) =
    unhex(lpad(hex(v.cast(LongType)), 8, "0"))

  private def fourCc(s: String) = encode(lit(s), "UTF-8")

  /** Numeric value of a four-character code, for comparisons against
    * [[beUint]] reads inside codegen'd expressions. */
  private def fourCcVal(s: String): Long =
    s.getBytes("US-ASCII").foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))

  /** Synthesize REAL ISO-BMFF (MP4) containers, one per document, as
    * codegen'd expressions: `ftyp` (brand isom) + a variable-length
    * `free` box (so `moov`'s offset is NOT fixed — a parser must walk
    * top-level boxes by their size fields) + `moov` holding a canonical
    * 108-byte version-0 `mvhd` (timescale/duration per row, identity
    * matrix, next_track_id) and 1-3 minimal `trak` boxes. Box sizes are
    * all self-describing, so any BMFF tool would parse these.
    */
  private[graft] def mp4Table(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val d = col("doc_id").cast(LongType)
    val pad = pmod(d, lit(7L)) // free-box body 0..6 B
    val timescale = lit(600L) + pmod(d, lit(5L)) * 120L
    val duration = col("n_chars").cast(LongType) * 25L + pmod(d, lit(97L))
    val nTracks = lit(1L) + pmod(d, lit(3L))
    val mvhd = concat(
      u32be(lit(108L)), fourCc("mvhd"),
      u32be(lit(0L)), // version 0 + flags
      u32be(lit(0L)), u32be(lit(0L)), // creation/modification time
      u32be(timescale), u32be(duration),
      u32be(lit(65536L)), // rate 1.0 (16.16)
      unhex(lit("01000000")), // volume 1.0 (8.8) + reserved u16
      u32be(lit(0L)), u32be(lit(0L)), // reserved u32 x2
      unhex(lit("000100000000000000000000" + // identity matrix (9 x 32-bit)
        "000000000001000000000000" +
        "000000000000000040000000")),
      unhex(lit("00" * 24)), // pre_defined u32 x6
      u32be(nTracks + 1L)) // next_track_id
    // trak repetition happens in the HEX domain: repeat() on a BINARY
    // column coerces the whole concat to StringType, and substr over a
    // string counts UTF-8 CHARACTERS — any mvhd byte >= 0xC0 (a large
    // duration) then swallows up to 4 raw bytes as one "char" and every
    // downstream box-walk read misaligns. unhex once keeps payload binary.
    val trakHex = "000000107472616B0000000866726565" // u32be(16)'trak'u32be(8)'free'
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        u32be(lit(16L)), fourCc("ftyp"), fourCc("isom"), u32be(lit(0L)),
        u32be(lit(8L) + pad), fourCc("free"),
        unhex(repeat(lit("00"), pad.cast("int"))),
        u32be(lit(8L + 108L) + nTracks * 16L), fourCc("moov"),
        mvhd, unhex(repeat(lit(trakHex), nTracks.cast("int")))).as("payload"),
      (lit(25L) + pad).as("true_moov_at"),
      timescale.as("true_timescale"), duration.as("true_duration"),
      nTracks.as("true_tracks"))
  }

  private val Mp4MaxBoxes = 6

  /** Generic bounded box walk: starting at 1-based `start`, step over
    * `size`-prefixed boxes until one's type equals `target`; yields that
    * box's position or -1. The ISO-BMFF analogue of [[jpegWalk]] — one
    * codegen'd fold, payload bytes never leave the scan.
    */
  private def bmffFind(payload: org.apache.spark.sql.Column,
      start: org.apache.spark.sql.Column, target: String,
      limit: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val t = lit(fourCcVal(target))
    aggregate(
      sequence(lit(1), lit(Mp4MaxBoxes)),
      struct(start.as("pos"), lit(-1L).as("at")), (acc, _) => {
        val pos = acc.getField("pos")
        val size = beUint(payload, pos, 4)
        val typ = beUint(payload, pos + 4L, 4)
        when(acc.getField("at") >= 0L || pos >= limit, acc)
          .when(typ === t,
            struct(pos.as("pos"), pos.as("at")))
          .otherwise(struct((pos + size).as("pos"), lit(-1L).as("at")))
      }).getField("at")
  }

  /** Count of `target`-typed boxes in [start, limit). */
  private def bmffCount(payload: org.apache.spark.sql.Column,
      start: org.apache.spark.sql.Column, target: String,
      limit: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val t = lit(fourCcVal(target))
    aggregate(
      sequence(lit(1), lit(Mp4MaxBoxes)),
      struct(start.as("pos"), lit(0L).as("n")), (acc, _) => {
        val pos = acc.getField("pos")
        val size = beUint(payload, pos, 4)
        val typ = beUint(payload, pos + 4L, 4)
        when(pos >= limit, acc)
          // a malformed size < 8 can't advance — treat as terminal
          // instead of re-counting the stuck box every fold iteration
          .when(size < 8L, struct(limit.as("pos"), acc.getField("n").as("n")))
          .otherwise(struct((pos + size).as("pos"),
            (acc.getField("n") + when(typ === t, 1L).otherwise(0L)).as("n")))
      }).getField("n")
  }

  /** REAL MP4/ISO-BMFF metadata decode as pure codegen'd expressions —
    * the size-prefixed box walk every BMFF tool performs: find `moov`
    * among the top-level boxes (its offset varies per row), then walk
    * its children to read `mvhd`'s big-endian timescale/duration (the
    * movie-duration fields at byte offsets +20/+24 of the version-0
    * header) and count `trak` boxes. The oracle replays the construction
    * inputs, so equality proves the byte-level parse; `roundtrip_ok` is
    * computed Spark-side from parsed-vs-true values. This retires the
    * VIDEO half of the media stub at the metadata level — only
    * pixel/frame decode of compressed video still needs a native codec.
    */
  def mediaMp4Meta(spark: SparkSession, sfDir: String): DataFrame = {
    val p = col("payload")
    val end = length(p).cast(LongType) + 1L
    val moovAt = bmffFind(p, lit(1L), "moov", end)
    mp4Table(spark, sfDir)
      .withColumn("moov_at", moovAt)
      .withColumn("moov_end", col("moov_at") + beUint(p, col("moov_at"), 4))
      .withColumn("mvhd_at",
        bmffFind(p, col("moov_at") + 8L, "mvhd", col("moov_end")))
      .select(col("media_id"),
        decodeUtf8Sub(p, 9, 4).as("brand"),
        col("moov_at"),
        beUint(p, col("mvhd_at") + 20L, 4).as("timescale"),
        beUint(p, col("mvhd_at") + 24L, 4).as("duration"),
        bmffCount(p, col("moov_at") + 8L, "trak", col("moov_end"))
          .as("n_tracks"),
        floor((beUint(p, col("mvhd_at") + 24L, 4) * 1000L)
          / beUint(p, col("mvhd_at") + 20L, 4)).cast(LongType)
          .as("duration_ms"),
        (col("moov_at") === col("true_moov_at") &&
          beUint(p, col("mvhd_at") + 20L, 4) === col("true_timescale") &&
          beUint(p, col("mvhd_at") + 24L, 4) === col("true_duration"))
          .as("roundtrip_ok"))
      .orderBy("media_id")
  }

  /** The box-walk parse over ANY (media_id, payload) BMFF frame —
    * MultimodalSpec drives hand-built multi-box streams through it. */
  private[graft] def mp4MetaFrom(media: DataFrame): DataFrame = {
    val p = col("payload")
    val end = length(p).cast(LongType) + 1L
    media
      .withColumn("moov_at", bmffFind(p, lit(1L), "moov", end))
      .withColumn("moov_end", col("moov_at") + beUint(p, col("moov_at"), 4))
      .withColumn("mvhd_at",
        bmffFind(p, col("moov_at") + 8L, "mvhd", col("moov_end")))
      .select(col("media_id"), col("moov_at"),
        beUint(p, col("mvhd_at") + 20L, 4).as("timescale"),
        beUint(p, col("mvhd_at") + 24L, 4).as("duration"),
        bmffCount(p, col("moov_at") + 8L, "trak", col("moov_end"))
          .as("n_tracks"))
      .orderBy("media_id")
  }

  // ------------------------------------------- real WAV sample decode --

  /** One REAL-decoded WAV record: header fields and exact statistics over
    * the DECODED PCM frames (not raw container bytes). */
  final case class WavFeatures(
      media_id: Long, sample_rate: Long, n_samples: Long,
      pcm_sum: Long, zero_cross: Long, amp_q4: Long)

  private[graft] final case class WavRow(media_id: Long, payload: Array[Byte])

  /** Deterministic 8-bit-unsigned sample law shared by the container
    * builder, the decoder spec, and the DuckDB oracle. */
  private[graft] def wavSample(d: Long, i: Int): Int =
    ((d * 17 + i * 29) % 256).toInt

  /** Little-endian byte of `v` at position `i` as one raw payload byte. */
  private def leByte(v: org.apache.spark.sql.Column, i: Int) =
    unhex(lpad(hex(shiftright(v.cast(LongType), 8 * i)
      .bitwiseAND(lit(255L))), 2, "0"))

  private def u16leCol(v: org.apache.spark.sql.Column) =
    concat(leByte(v, 0), leByte(v, 1))
  private def u32leCol(v: org.apache.spark.sql.Column) =
    concat(leByte(v, 0), leByte(v, 1), leByte(v, 2), leByte(v, 3))

  /** Synthesize REAL RIFF/WAVE containers, one per document, entirely as
    * codegen'd expressions (no driver loop, no UDF): the canonical
    * RIFF("WAVE") layout with a 16-byte PCM `fmt ` chunk (mono, 8-bit
    * unsigned, per-row sample rate), a variable-length `LIST`/INFO chunk
    * BEFORE the data chunk (so the data offset is NOT fixed — a reader
    * must actually walk chunks), and a `data` chunk whose samples follow
    * [[wavSample]]. All chunk sizes are even, so the streams are strictly
    * word-aligned RIFF any audio tool can open.
    */
  private[graft] def wavTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val d = col("doc_id").cast(LongType)
    val n = (pmod(col("n_chars"), lit(16)) * 2 + 8).cast(LongType) // 8..38 even
    val pad = (pmod(d, lit(4)) * 2).cast(LongType) // LIST pad 0..6 even
    val sr = (lit(8000L) + pmod(d, lit(4)) * 1000L) // 8k..11k Hz
    // sample bytes: hex pairs per index, concatenated, un-hexed once
    val samples = unhex(concat_ws("",
      transform(sequence(lit(0L), n - 1L),
        i => lpad(hex(pmod(d * 17L + i * 29L, lit(256L))), 2, "0"))))
    val riffSize = lit(4L) + (8L + 16L) + (lit(12L) + pad) + (lit(8L) + n)
    docs.select(
      col("doc_id").as("media_id"),
      concat(
        encode(lit("RIFF"), "UTF-8"), u32leCol(riffSize),
        encode(lit("WAVE"), "UTF-8"),
        encode(lit("fmt "), "UTF-8"), u32leCol(lit(16L)),
        u16leCol(lit(1L)), u16leCol(lit(1L)), // PCM, mono
        u32leCol(sr), u32leCol(sr), // byteRate = sr * 1 * 1
        u16leCol(lit(1L)), u16leCol(lit(8L)), // blockAlign, bits
        encode(lit("LIST"), "UTF-8"), u32leCol(lit(4L) + pad),
        encode(lit("INFO"), "UTF-8"),
        unhex(repeat(lit("00"), pad.cast("int"))),
        encode(lit("data"), "UTF-8"), u32leCol(n),
        samples).as("payload"),
      sr.as("true_rate"), n.as("true_n"))
  }

  /** REAL audio decode — the AUDIO half of [[decodeFeatures]]' stub
    * retired: every payload is a hand-assembled RIFF/WAVE container that
    * the JDK's actual WAV codec (`javax.sound.sampled`, pure Java — the
    * chunk walk, fmt parse, and PCM framing live in the JDK) accepts and
    * decodes; the emitted statistics come from the DECODED PCM FRAMES.
    * 8-bit unsigned PCM is lossless, so `pcm_sum` and the mid-scale
    * zero-crossing count are exact integers the DuckDB oracle recomputes
    * from [[wavSample]] — the hash equality proves the
    * build→container→chunk-walk→frame-decode round trip bit-for-bit.
    * `sample_rate` comes from the decoder's `AudioFormat` (proving the
    * fmt chunk really parsed), `n_samples` from its frame count.
    *
    * Scale: mapPartitions (per-partition reader, iterator-to-iterator);
    * payload bytes never leave their partition — only (id + 5 BIGINTs)
    * shuffle. Only compressed audio (MP3/AAC) still needs the fake.
    */
  def mediaWavFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val rowEnc = Encoders.product[WavRow]
    implicit val outEnc = Encoders.product[WavFeatures]
    wavTable(spark, sfDir).select(col("media_id"), col("payload"))
      .as[WavRow].mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          val n = bytes.length
          var sum = 0L
          var zc = 0L
          var i = 0
          while (i < n) {
            val s = bytes(i) & 0xff
            sum += s
            if (i > 0 && ((bytes(i - 1) & 0xff) < 128) != (s < 128)) zc += 1
            i += 1
          }
          WavFeatures(r.media_id, fmt.getSampleRate.toLong, n.toLong,
            sum, zc, sum * 10000L / n)
        }
      }.toDF().orderBy("media_id")
  }

  // --------------------------------- real MP3 frame-header metadata --

  /** MPEG-1 Layer III bitrate table (kbps) by header bitrate index
    * 1..14 (index 0 is "free", 15 is forbidden — both terminal for the
    * walk), and the MPEG-1 sample-rate table by the 2-bit header index
    * (index 3 reserved). ISO/IEC 11172-3 tables; the same constants any
    * MP3 tool ships.
    */
  private val Mp3Bitrates =
    Seq(32L, 40L, 48L, 56L, 64L, 80L, 96L, 112L, 128L, 160L, 192L, 224L,
      256L, 320L)
  private val Mp3SampleRates = Seq(44100L, 48000L, 32000L)
  private val Mp3MaxFrames = 8

  /** Synthesize structurally-real MP3 streams, one per document: an
    * ID3v2.4 tag with a VARIABLE-length body (so the first frame's
    * offset is not fixed — a parser must read the syncsafe size), then
    * 1-4 MPEG-1 Layer III frames with per-frame padding bits, each
    * frame's length the 144 * bitrate / sample_rate + padding the spec
    * defines. Assembled in the HEX domain and un-hexed ONCE (the
    * [[mp4Table]] binary-concat lesson: repeat() on a BINARY coerces to
    * StringType and misaligns every downstream offset read).
    */
  private[graft] def mp3Table(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val d = col("doc_id").cast(LongType)
    val brIdx = lit(1L) + pmod(d, lit(14L)) // 1..14
    val kbps = element_at(
      array(Mp3Bitrates.map(lit): _*), brIdx.cast(IntegerType))
    val srIdx = pmod(d, lit(3L)) // 0..2
    val sr = element_at(
      array(Mp3SampleRates.map(lit): _*), (srIdx + 1L).cast(IntegerType))
    val nFrames = lit(1L) + pmod(col("n_chars").cast(LongType), lit(4L))
    val id3Body = pmod(d, lit(7L)) // 0..6 B tag body
    // one frame's hex: 4-byte header (sync/version/layer, bitrate index,
    // sample-rate index, padding, mono) + zero body to the exact length
    def frameHex(f: org.apache.spark.sql.Column) = {
      val pad = pmod(d + f, lit(2L))
      // Column `/` is DOUBLE division — floor-cast back to the spec's
      // integer frame length (exact: 144000 * kbps is double-exact)
      val flen = (lit(144000L) * kbps / sr).cast(LongType) + pad
      concat(
        lit("FFFB"), // sync + MPEG-1 + Layer III + no CRC
        lpad(hex(shiftleft(brIdx, 4) + shiftleft(srIdx, 2) + pad * 2L),
          2, "0"),
        lit("C0"), // single-channel mode
        repeat(lit("00"), (flen - 4L).cast(IntegerType)))
    }
    val id3Hex = concat(
      lit("494433"), // "ID3"
      lit("040000"), // v2.4.0, no flags
      lit("000000"), lpad(hex(id3Body), 2, "0"), // syncsafe size (< 128)
      repeat(lit("00"), id3Body.cast(IntegerType)))
    docs.select(
      col("doc_id").as("media_id"),
      unhex(concat(id3Hex, concat_ws("",
        transform(sequence(lit(0L), nFrames - 1L), frameHex(_)))))
        .as("payload"),
      (lit(11L) + id3Body).as("true_first_frame_at"), // 1-based
      kbps.as("true_kbps"), sr.as("true_rate"), nFrames.as("true_frames"))
  }

  /** The frame walk as ONE bounded expression fold (the [[jpegWalk]] /
    * [[bmffFind]] class): state = (pos, n_frames, kbps, sr). Each step
    * validates the 11-bit sync + MPEG-1/Layer-III version bits, rejects
    * free/forbidden bitrate and reserved sample-rate indexes (terminal,
    * like a truncated stream), captures the FIRST frame's bitrate and
    * sample rate, and advances by the spec's frame length
    * 144 * bitrate / sample_rate + padding.
    */
  private def mp3Walk(payload: org.apache.spark.sql.Column,
      start: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val limit = length(payload).cast(LongType) + 1L
    val init = struct(start.as("pos"), lit(0L).as("n"),
      lit(-1L).as("kbps"), lit(-1L).as("sr"))
    aggregate(
      sequence(lit(1), lit(Mp3MaxFrames)), init, (acc, _) => {
        val pos = acc.getField("pos")
        val b0 = beUint(payload, pos, 1)
        val b1 = beUint(payload, pos + 1L, 1)
        val b2 = beUint(payload, pos + 2L, 1)
        // sync 0xFF + (111 version=MPEG1 layer=III x) — protection bit free
        val syncOk = b0 === 255L && b1.bitwiseAND(lit(254L)) === 250L
        val brIdx = shiftright(b2, 4)
        val srIdx = shiftright(b2, 2).bitwiseAND(lit(3L))
        val pad = shiftright(b2, 1).bitwiseAND(lit(1L))
        val valid = syncOk && brIdx > 0L && brIdx < 15L && srIdx < 3L
        val kbps = element_at(array(Mp3Bitrates.map(lit): _*),
          brIdx.cast(IntegerType))
        val sr = element_at(array(Mp3SampleRates.map(lit): _*),
          (srIdx + 1L).cast(IntegerType))
        // same floor-cast as the builder: `/` alone would type the fold
        // struct's pos as DOUBLE and fail analysis
        val flen = (lit(144000L) * kbps / sr).cast(LongType) + pad
        // null-safe terminal: a payload truncated MID-HEADER makes
        // beUint's substr read past the end, conv returns NULL, and a
        // bare `!valid` turns the whole guard NULL — CaseWhen then falls
        // to otherwise and poisons pos/n with NULL for every remaining
        // iteration. coalesce(valid, false) makes truncation terminal.
        when(pos >= limit || !coalesce(valid, lit(false)), acc)
          .otherwise(struct(
            (pos + flen).as("pos"), (acc.getField("n") + 1L).as("n"),
            when(acc.getField("n") === 0L, kbps)
              .otherwise(acc.getField("kbps")).as("kbps"),
            when(acc.getField("n") === 0L, sr)
              .otherwise(acc.getField("sr")).as("sr")))
      })
  }

  /** The parse over ANY (media_id, payload) frame of MP3 bytes —
    * SinksAndMultimodalSpec drives hand-built tagged/corrupted streams
    * through it. Skips a leading ID3v2 tag by its syncsafe size (the 4
    * 7-bit bytes at offsets 6-9), then walks frames.
    */
  private[graft] def mp3Parse(media: DataFrame): DataFrame = {
    val p = col("payload")
    val hasId3 = beUint(p, lit(1L), 3) === 0x494433L // "ID3"
    val tagSize =
      shiftleft(beUint(p, lit(7L), 1), 21) +
      shiftleft(beUint(p, lit(8L), 1), 14) +
      shiftleft(beUint(p, lit(9L), 1), 7) +
      beUint(p, lit(10L), 1)
    val start = when(hasId3, lit(11L) + tagSize).otherwise(lit(1L))
    val meta = mp3Walk(p, start)
    media
      .withColumn("first_frame_at", start)
      .withColumn("m", meta)
      .withColumn("bitrate_kbps", col("m").getField("kbps"))
      .withColumn("sample_rate", col("m").getField("sr"))
      .withColumn("n_frames", col("m").getField("n"))
      // MPEG-1 Layer III: 1152 samples per frame
      .withColumn("duration_ms",
        when(col("m").getField("sr") > 0L,
            (col("m").getField("n") * 1152000L / col("m").getField("sr"))
              .cast(LongType)) // floor — the oracle's integer `//`
          .otherwise(lit(-1L)))
      .drop("m", "payload")
  }

  /** The parse over ANY (media_id, payload) frame of MP3 bytes —
    * SinksAndMultimodalSpec drives hand-built tagged/corrupted streams
    * through it.
    */
  private[graft] def mp3MetaFrom(media: DataFrame): DataFrame =
    mp3Parse(media)
      .select(col("media_id"), col("first_frame_at"), col("bitrate_kbps"),
        col("sample_rate"), col("n_frames"), col("duration_ms"))
      .orderBy("media_id")

  /** REAL MP3 metadata decode — the compressed-AUDIO half of the media
    * stub retired at the metadata level (the [[mediaJpegMeta]] /
    * [[mediaMp4Meta]] discipline): payloads are structurally-real
    * ID3v2-tagged MPEG-1 Layer III streams whose first-frame offset and
    * per-frame lengths vary per row, and every emitted number comes from
    * the byte-level header walk (sync validation, bitrate/sample-rate
    * table lookups, padding-aware frame stepping). The oracle replays
    * the construction law, so equality proves the parse; only
    * pixel/sample-level decode of compressed audio (the DCT synthesis)
    * still needs a codec the JDK lacks.
    */
  // ------------------------------- real AAC ADTS frame-header metadata --

  /** MPEG-4 AAC sampling-frequency table by the 4-bit ADTS header index
    * (ISO/IEC 14496-3; indexes 13-15 reserved — terminal for the walk).
    */
  private val AacSampleRates = Seq(96000L, 88200L, 64000L, 48000L, 44100L,
    32000L, 24000L, 22050L, 16000L, 12000L, 11025L, 8000L, 7350L)
  private val AacMaxFrames = 8

  /** Synthesize structurally-real ADTS streams, one per document: 1-4
    * frames, each with the 7-byte MPEG-4/no-CRC header (sync 0xFFF,
    * audio-object profile, sampling-frequency index, channel config) and
    * an EXPLICIT 13-bit frame length that varies per frame — unlike MP3
    * the length is a header FIELD, so the walk must reassemble it from
    * the 2+8+3 split bits. Hex-domain assembly, un-hexed once.
    */
  private[graft] def aacTable(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val d = col("doc_id").cast(LongType)
    val profile = pmod(d, lit(3L)) // Main/LC/SSR, 2 header bits
    val sfIdx = lit(3L) + pmod(d, lit(5L)) // 48k..22k05
    val sr = element_at(array(AacSampleRates.map(lit): _*),
      (sfIdx + 1L).cast(IntegerType))
    val channels = lit(1L) + pmod(d, lit(2L)) // 1..2, fits 3 bits
    val nFrames = lit(1L) + pmod(col("n_chars").cast(LongType), lit(4L))
    def frameHex(f: org.apache.spark.sql.Column) = {
      val flen = lit(7L) + lit(10L) + pmod(d + f * 3L, lit(17L)) // 17..33 B
      val b2 = shiftleft(profile, 6) + shiftleft(sfIdx, 2) +
        shiftright(channels, 2)
      val b3 = shiftleft(channels.bitwiseAND(lit(3L)), 6) +
        shiftright(flen, 11).bitwiseAND(lit(3L))
      val b4 = shiftright(flen, 3).bitwiseAND(lit(255L))
      val b5 = shiftleft(flen.bitwiseAND(lit(7L)), 5) + lit(31L) // fullness hi
      concat(
        lit("FFF1"), // sync + MPEG-4 + layer 00 + protection_absent
        lpad(hex(b2), 2, "0"), lpad(hex(b3), 2, "0"),
        lpad(hex(b4), 2, "0"), lpad(hex(b5), 2, "0"),
        lit("FC"), // fullness lo + 0 raw blocks
        repeat(lit("00"), (flen - 7L).cast(IntegerType)))
    }
    docs.select(
      col("doc_id").as("media_id"),
      unhex(concat_ws("",
        transform(sequence(lit(0L), nFrames - 1L), frameHex(_))))
        .as("payload"),
      (profile + 1L).as("true_aot"), sr.as("true_rate"),
      channels.as("true_channels"), nFrames.as("true_frames"))
  }

  /** The ADTS walk as ONE bounded fold: validate the 12-bit sync +
    * MPEG-4/layer bits, reject reserved sampling indexes, reassemble the
    * split 13-bit frame length, capture the FIRST frame's
    * profile/rate/channels, step frame by frame.
    */
  private def aacWalk(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val limit = length(payload).cast(LongType) + 1L
    val init = struct(lit(1L).as("pos"), lit(0L).as("n"),
      lit(-1L).as("aot"), lit(-1L).as("sr"), lit(-1L).as("ch"))
    aggregate(
      sequence(lit(1), lit(AacMaxFrames)), init, (acc, _) => {
        val pos = acc.getField("pos")
        val b0 = beUint(payload, pos, 1)
        val b1 = beUint(payload, pos + 1L, 1)
        val b2 = beUint(payload, pos + 2L, 1)
        val b3 = beUint(payload, pos + 3L, 1)
        val b4 = beUint(payload, pos + 4L, 1)
        val b5 = beUint(payload, pos + 5L, 1)
        // sync FFF + MPEG-4 (ID=0) + layer 00; protection bit free
        val syncOk = b0 === 255L && b1.bitwiseAND(lit(246L)) === 240L
        val sfIdx = shiftright(b2, 2).bitwiseAND(lit(15L))
        val ch = shiftleft(b2.bitwiseAND(lit(1L)), 2) + shiftright(b3, 6)
        val flen = shiftleft(b3.bitwiseAND(lit(3L)), 11) +
          shiftleft(b4, 3) + shiftright(b5, 5)
        val valid = syncOk && sfIdx < 13L && flen >= 7L
        val sr = element_at(array(AacSampleRates.map(lit): _*),
          (sfIdx + 1L).cast(IntegerType))
        // null-safe terminal (the mp3Walk truncated-header discipline)
        when(pos >= limit || !coalesce(valid, lit(false)), acc)
          .otherwise(struct(
            (pos + flen).as("pos"), (acc.getField("n") + 1L).as("n"),
            when(acc.getField("n") === 0L, shiftright(b2, 6) + 1L)
              .otherwise(acc.getField("aot")).as("aot"),
            when(acc.getField("n") === 0L, sr)
              .otherwise(acc.getField("sr")).as("sr"),
            when(acc.getField("n") === 0L, ch)
              .otherwise(acc.getField("ch")).as("ch")))
      })
  }

  /** The parse over ANY (media_id, payload) frame of ADTS bytes. */
  private[graft] def aacMetaFrom(media: DataFrame): DataFrame = {
    val m = aacWalk(col("payload"))
    media.withColumn("m", m)
      .withColumn("aot", col("m").getField("aot"))
      .withColumn("sample_rate", col("m").getField("sr"))
      .withColumn("channels", col("m").getField("ch"))
      .withColumn("n_frames", col("m").getField("n"))
      // AAC: 1024 samples per frame
      .withColumn("duration_ms",
        when(col("m").getField("sr") > 0L,
            (col("m").getField("n") * 1024000L / col("m").getField("sr"))
              .cast(LongType))
          .otherwise(lit(-1L)))
      .drop("m", "payload")
  }

  /** REAL AAC metadata decode — ADTS frame-header walk (sync validation,
    * sampling-frequency table, split 13-bit explicit frame lengths) as
    * one codegen'd fold; the oracle replays the construction law. With
    * this, compressed audio is real at the metadata level for BOTH
    * container families (MP3 frame chain, AAC ADTS chain).
    */
  def mediaAacMeta(spark: SparkSession, sfDir: String): DataFrame =
    aacMetaFrom(aacTable(spark, sfDir))
      .select(col("media_id"), col("aot"), col("sample_rate"),
        col("channels"), col("n_frames"), col("duration_ms"),
        (col("aot") === col("true_aot") &&
          col("sample_rate") === col("true_rate") &&
          col("channels") === col("true_channels") &&
          col("n_frames") === col("true_frames")).as("roundtrip_ok"))
      .orderBy("media_id")

  // ------------------------------ real H.264 AVCC NAL-unit metadata --

  private val H264MaxNals = 12

  /** Synthesize AVCC-framed H.264 elementary streams (the in-MP4 shape:
    * each NAL prefixed by a 4-byte big-endian length): SPS (whose
    * profile_idc / level_idc are PLAIN BYTES before any Exp-Golomb
    * field), PPS, one IDR slice, then 0-3 non-IDR slices with varying
    * lengths — NAL counts and positions vary per row, so the walk must
    * follow the length prefixes.
    */
  private[graft] def h264Table(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val d = col("doc_id").cast(LongType)
    val profile = lit(66L) + pmod(d, lit(3L)) * 11L // 66/77/88 = B/M/E
    val level = lit(10L) + pmod(d, lit(5L)) * 10L // 10..50
    val nSlices = pmod(col("n_chars").cast(LongType), lit(4L)) // non-IDR
    def nal(headerHex: org.apache.spark.sql.Column,
        bodyLen: org.apache.spark.sql.Column) =
      concat(lpad(hex(bodyLen + 1L), 8, "0"), headerHex,
        repeat(lit("00"), bodyLen.cast(IntegerType)))
    // SPS body: profile_idc, constraint flags, level_idc, + 4 pad bytes
    val sps = concat(lpad(hex(lit(7L)), 8, "0"), lit("67"),
      lpad(hex(profile), 2, "0"), lit("00"), lpad(hex(level), 2, "0"),
      repeat(lit("00"), 3))
    val pps = nal(lit("68"), lit(2L) + pmod(d, lit(3L)))
    val idr = nal(lit("65"), lit(8L) + pmod(d, lit(9L)))
    val slices = concat_ws("",
      transform(sequence(lit(1L), nSlices),
        f => nal(lit("41"), lit(4L) + pmod(d + f, lit(7L)))))
    docs.select(
      col("doc_id").as("media_id"),
      unhex(concat(sps, pps, idr,
        when(nSlices > 0L, slices).otherwise(lit("")))).as("payload"),
      profile.as("true_profile"), level.as("true_level"),
      (nSlices + 1L).as("true_slices")) // IDR + non-IDR
  }

  /** The AVCC walk as ONE bounded fold: step 4-byte-length-prefixed NAL
    * units, classify by the 5-bit nal_unit_type, read profile_idc /
    * level_idc from the SPS's leading plain bytes. Zero-length units are
    * terminal (the [[bmffCount]] malformed-size discipline).
    */
  private def h264Walk(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val limit = length(payload).cast(LongType) + 1L
    val init = struct(lit(1L).as("pos"), lit(0L).as("n_sps"),
      lit(0L).as("n_pps"), lit(0L).as("n_idr"), lit(0L).as("n_slice"),
      lit(-1L).as("profile"), lit(-1L).as("level"))
    aggregate(
      sequence(lit(1), lit(H264MaxNals)), init, (acc, _) => {
        val pos = acc.getField("pos")
        val len = beUint(payload, pos, 4)
        val typ = beUint(payload, pos + 4L, 1).bitwiseAND(lit(31L))
        val isSps = typ === 7L
        // null-safe: a length prefix truncated mid-payload reads NULL —
        // coalesce to 0 so it is terminal, not a NULL-poisoning fall-through
        when(pos >= limit || coalesce(len, lit(0L)) < 1L, acc)
          .otherwise(struct(
            (pos + 4L + len).as("pos"),
            (acc.getField("n_sps") + when(isSps, 1L).otherwise(0L))
              .as("n_sps"),
            (acc.getField("n_pps") + when(typ === 8L, 1L).otherwise(0L))
              .as("n_pps"),
            (acc.getField("n_idr") + when(typ === 5L, 1L).otherwise(0L))
              .as("n_idr"),
            (acc.getField("n_slice") + when(typ === 1L, 1L).otherwise(0L))
              .as("n_slice"),
            when(isSps && acc.getField("profile") < 0L,
                beUint(payload, pos + 5L, 1))
              .otherwise(acc.getField("profile")).as("profile"),
            when(isSps && acc.getField("level") < 0L,
                beUint(payload, pos + 7L, 1))
              .otherwise(acc.getField("level")).as("level")))
      })
  }

  /** The parse over ANY (media_id, payload) frame of AVCC bytes. */
  private[graft] def h264MetaFrom(media: DataFrame): DataFrame = {
    val m = h264Walk(col("payload"))
    media.withColumn("m", m)
      .withColumn("profile_idc", col("m").getField("profile"))
      .withColumn("level_idc", col("m").getField("level"))
      .withColumn("n_sps", col("m").getField("n_sps"))
      .withColumn("n_pps", col("m").getField("n_pps"))
      .withColumn("n_frames",
        col("m").getField("n_idr") + col("m").getField("n_slice"))
      .drop("m", "payload")
  }

  /** REAL H.264 metadata decode — the AVCC length-prefixed NAL walk
    * every MP4-resident video stream needs (nal_unit_type
    * classification, SPS profile_idc/level_idc from the plain-byte
    * prefix), one codegen'd fold; the oracle replays the construction
    * law. Video is now real at container (BMFF) AND bitstream (NAL)
    * metadata levels — the decode stub covers only full sample/pixel
    * synthesis of compressed codecs.
    */
  def mediaH264Meta(spark: SparkSession, sfDir: String): DataFrame =
    h264MetaFrom(h264Table(spark, sfDir))
      .select(col("media_id"), col("profile_idc"), col("level_idc"),
        col("n_sps"), col("n_pps"), col("n_frames"),
        (col("profile_idc") === col("true_profile") &&
          col("level_idc") === col("true_level") &&
          col("n_sps") === 1L && col("n_pps") === 1L &&
          col("n_frames") === col("true_slices")).as("roundtrip_ok"))
      .orderBy("media_id")

  def mediaMp3Meta(spark: SparkSession, sfDir: String): DataFrame =
    mp3Parse(mp3Table(spark, sfDir)) // true_ cols ride along, no re-join
      .select(col("media_id"), col("first_frame_at"),
        col("bitrate_kbps"), col("sample_rate"), col("n_frames"),
        col("duration_ms"),
        (col("first_frame_at") === col("true_first_frame_at") &&
          col("bitrate_kbps") === col("true_kbps") &&
          col("sample_rate") === col("true_rate") &&
          col("n_frames") === col("true_frames")).as("roundtrip_ok"))
      .orderBy("media_id")
}
