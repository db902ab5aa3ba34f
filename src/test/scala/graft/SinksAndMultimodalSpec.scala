package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.{AlarmTransition, HealthCheckConfig}
import graft.operators.MultimodalPipeline
import graft.streaming.{AlarmPipeline, StreamSinks, TracerProducer, TransitionEvent}

/** Sinks (K1 partitioned append, O3 transition delivery) and the multimodal
  * binary-column plumbing.
  */
class SinksAndMultimodalSpec extends AnyFunSuite with Matchers with SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("K1: tracer stream appends partitioned by key bucket and round-trips") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Timestamp]
    val tracer = TracerProducer.fromTicks(
      input.toDF().toDF("timestamp"), HealthCheckConfig())
    val out = Files.createTempDirectory("tracer-sink").toString
    input.addData((0 until 10).map(m => new Timestamp(m * 60000L)))
    val q = StreamSinks.tracerAppend(tracer, s"$out/data",
      s"$out/chk").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val back = spark.read.parquet(s"$out/data")
    back.count() shouldBe 10
    back.select("partitionKey").distinct().count() shouldBe 10 // B6 spread
    back.columns should contain("bucket") // partitioned layout
  }

  test("O3: transitions deliver through foreachBatch exactly once per change") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val metrics = input.toDF().toDF("streamName", "ts", "value")
    val delivered = scala.collection.mutable.ArrayBuffer.empty[AlarmTransition]
    val q = StreamSinks.transitionsForeach(
      AlarmPipeline.transitionRows(AlarmPipeline.transitions(metrics)),
      Files.createTempDirectory("o3-chk").toString) { (batch, _) =>
      delivered.synchronized { delivered ++= batch }
    }.start()
    try {
      input.addData(Seq(("s", new Timestamp(0L), 0.5),
        ("s", new Timestamp(60000L), 9.0)))
      q.processAllAvailable()
      input.addData(Seq(("s", new Timestamp(600000L), 0.5)))
      q.processAllAvailable()
      input.addData(Seq.empty)
      q.processAllAvailable()
    } finally q.stop()
    val alarms = delivered.filter(_.to == "ALARM")
    alarms.map(_.reason) should contain("threshold")
    alarms.head.observedValue shouldBe Some(9.0)
  }

  test("O3 distributed: notifyPerPartition delivers every row from executors") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val metrics = input.toDF().toDF("streamName", "ts", "value")
    NotifyProbe.received.clear()
    val q = StreamSinks.notifyPerPartition(
      AlarmPipeline.transitionRows(AlarmPipeline.transitions(metrics)),
      Files.createTempDirectory("o3p-chk").toString) { it =>
      // runs on executors; the static probe is same-JVM in local mode
      it.foreach(t => NotifyProbe.received.add(s"${t.to}:${t.reason}"))
    }.start()
    try {
      input.addData(Seq(("s", new Timestamp(0L), 0.5),
        ("s", new Timestamp(60000L), 9.0)))
      q.processAllAvailable()
      input.addData(Seq(("s", new Timestamp(600000L), 0.5)))
      q.processAllAvailable()
      input.addData(Seq.empty)
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    NotifyProbe.received.asScala.toSeq should contain("ALARM:threshold")
  }

  test("multimodal: header parse round-trips the synthesized payload exactly") {
    val meta = MultimodalPipeline.mediaMeta(spark, sf).collect()
    meta.length shouldBe 500
    meta.foreach { r =>
      r.getAs[String]("magic") shouldBe "GR"
      Set("image", "audio", "video") should contain(r.getAs[String]("kind"))
      // width derives from n_chars == body length (round-trip through header)
      r.getAs[Long]("width") shouldBe (r.getAs[Long]("body_bytes") % 64) + 1
      r.getAs[Long]("height") shouldBe (r.getAs[Long]("media_id") % 48) + 1
    }
  }

  test("multimodal: resize fits into the 32-box preserving aspect, exact ints") {
    val out = graft.operators.MultimodalPipeline
      .mediaResize(spark, "/root/testdata/sf0.001").collect()
    out should not be empty
    out.foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      val mx = math.max(w, h)
      ow shouldBe math.max(1L, w * 32 / mx)
      oh shouldBe math.max(1L, h * 32 / mx)
      math.max(ow, oh) should be <= 32L
      r.getAs[String]("resized_md5") should have length 32
    }
  }

  test("multimodal: frame sampling keeps every 4th 16-byte frame") {
    val frames = MultimodalPipeline.mediaFrameSample(spark, sf)
    val one = frames.filter($"media_id" === 0).collect()
    val nChars = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" === 0).select("n_chars").as[Long].head()
    val nFrames = (nChars + 15) / 16
    one.head.getAs[Long]("n_frames") shouldBe nFrames
    one.length shouldBe ((nFrames - 1) / 4 + 1)
    one.map(_.getAs[Long]("sample_idx")).toSeq shouldBe (0L until one.length)
  }

  test("multimodal: stubbed decode emits deterministic features via mapPartitions") {
    val f1 = MultimodalPipeline.decodeFeatures(spark, sf).collect()
      .sortBy(_.media_id)
    val f2 = MultimodalPipeline.decodeFeatures(spark, sf).collect()
      .sortBy(_.media_id)
    f1.length shouldBe 500
    f1.map(_.luma_mean).toSeq shouldBe f2.map(_.luma_mean).toSeq // deterministic
    f1.foreach { f =>
      f.luma_mean should (be >= 32.0 and be <= 127.0) // printable-ASCII body
      f.n_frames should be > 0
    }
  }
  test("the JPEG walk parses hand-built real-world container shapes") {
    // genuine JPEG structure the synthetic driver table never produces:
    // an EXIF APP1 before JFIF-less SOF, stacked APPn segments, and a
    // PROGRESSIVE (SOF2) frame header — the parser must walk markers, not
    // assume offsets
    def u16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def seg(marker: Int, body: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte) ++ u16(body.length + 2) ++ body
    val soi = Array(0xff.toByte, 0xd8.toByte)
    val eoi = Array(0xff.toByte, 0xd9.toByte)
    def sof(marker: Int, h: Int, w: Int): Array[Byte] =
      seg(marker, Array(8.toByte) ++ u16(h) ++ u16(w) ++
        Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))

    // EXIF-shaped: APP1 with an Exif\0\0 + fake TIFF body, then SOF0
    val exifBody = "Exif\u0000\u0000MM*lotsoftiffdatahere".getBytes("ISO-8859-1")
    val exif = soi ++ seg(0xe1, exifBody) ++ sof(0xc0, 480, 640) ++ eoi
    // stacked APPn + COM, PROGRESSIVE SOF2, dims > 255 (both u16 bytes live)
    val progressive = soi ++
      seg(0xe0, "JFIF\u0000\u0001\u0001\u0000\u0000\u0001\u0000\u0001\u0000\u0000".getBytes("ISO-8859-1")) ++
      seg(0xe2, Array.fill(40)(0x42.toByte)) ++ // ICC-profile-shaped APP2
      seg(0xfe, "shot on graft".getBytes("ISO-8859-1")) ++
      sof(0xc2, 1080, 1920) ++ eoi
    // no frame header within budget: every field must report -1
    val headless = soi ++ seg(0xe0, Array.fill(6)(0.toByte)) ++ eoi

    val frames = Seq(
      (1L, exif), (2L, progressive), (3L, headless)).toDF("media_id", "payload")
    val parsed = MultimodalPipeline.jpegMetaFrom(frames)
      .as[(Long, Long, Long, Long)].collect().toSeq

    // SOF's FF sits right after APP1: 3 (first marker) + 2 (FF+marker)
    // + (body + 2) segment length
    parsed(0) shouldBe ((1L, 3L + 2L + exifBody.length + 2L, 640L, 480L))
    parsed(1)._3 shouldBe 1920L
    parsed(1)._4 shouldBe 1080L
    parsed(2) shouldBe ((3L, -1L, -1L, -1L))
  }

  test("PNG decode is REAL: raster stats equal the pixel law; corruption breaks decode") {
    // decode one known image by hand through the same JDK reader the
    // operator uses: a 3x2 gray gradient written with ImageIO must read
    // back bit-identical samples (PNG is lossless)
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val vals = Array(Array(0, 100, 255), Array(7, 128, 200))
    for (y <- 0 until 2; x <- 0 until 3)
      img.getRaster.setSample(x, y, 0, vals(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val bytes = out.toByteArray
    // genuine PNG container: magic + IHDR + zlib'd IDAT
    bytes.take(4).map(_ & 0xff).toSeq shouldBe Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 2; x <- 0 until 3)
      back.getRaster.getSample(x, y, 0) shouldBe vals(y)(x)
    // flip a byte inside the compressed IDAT stream: a real decoder
    // notices (CRC/inflate failure) — a stub reading header fields
    // would not
    val corrupt = bytes.clone()
    corrupt(bytes.length - 20) = (corrupt(bytes.length - 20) ^ 0x5a).toByte
    val res = try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(corrupt)))
    } catch { case _: Throwable => None }
    // either the reader throws/returns null, or the decoded pixels
    // differ — never a silent identical read
    val identical = res.exists { b =>
      (0 until 2).forall(y => (0 until 3).forall(x =>
        b.getRaster.getSample(x, y, 0) == vals(y)(x)))
    }
    identical shouldBe false

    // the operator end-to-end: decoded-raster stats equal the pixel law
    val feats = MultimodalPipeline.mediaPngFeatures(spark, sf).collect()
    feats.length shouldBe 500
    feats.take(20).foreach { r =>
      val d = r.getAs[Long]("media_id")
      val w = r.getAs[Long]("width").toInt
      val h = r.getAs[Long]("height").toInt
      val expect = (for (y <- 0 until h; x <- 0 until w)
        yield MultimodalPipeline.pngGray(d, x, y).toLong).sum
      r.getAs[Long]("luma_sum") shouldBe expect
      r.getAs[Long]("n_pixels") shouldBe w.toLong * h
    }
  }

  test("media_jpeg_meta round-trips every synthesized container") {
    val out = MultimodalPipeline.mediaJpegMeta(spark, sf)
      .select($"soi_ok", $"roundtrip_ok")
      .as[(Boolean, Boolean)].collect()
    out should not be empty
    all(out.map(_._1)) shouldBe true
    all(out.map(_._2)) shouldBe true
  }

  test("MP4 box walk parses hand-built BMFF streams with displaced moov") {
    // a container the synthesis never produces: moov pushed behind TWO
    // skip boxes (ftyp then mdat), mvhd behind a leading udta child —
    // the parser must follow size fields on both levels to find them
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val mvhdBody = u32(0) ++ u32(0) ++ u32(0) ++ u32(90000L) ++
      u32(1234567L) ++ Array.fill[Byte](108 - 8 - 20)(0)
    val mvhd = u32(108) ++ cc("mvhd") ++ mvhdBody
    val udta = u32(12) ++ cc("udta") ++ u32(0) // opaque child before mvhd
    val trak = u32(8) ++ cc("trak")
    val moov = u32((8 + 12 + 108 + 2 * 8).toLong) ++ cc("moov") ++
      udta ++ mvhd ++ trak ++ trak
    val bytes = (u32(16) ++ cc("ftyp") ++ cc("mp42") ++ u32(0)) ++
      (u32(13) ++ cc("mdat") ++ Array.fill[Byte](5)(0x7f)) ++ moov
    val df = Seq((1L, bytes)).toDF("media_id", "payload")
    val r = MultimodalPipeline.mp4MetaFrom(df).head()
    r.getAs[Long]("moov_at") shouldBe (16 + 13 + 1).toLong // 1-based
    r.getAs[Long]("timescale") shouldBe 90000L
    r.getAs[Long]("duration") shouldBe 1234567L
    r.getAs[Long]("n_tracks") shouldBe 2L

    // a malformed ZERO-SIZE box among moov's children must be terminal,
    // not re-counted once per remaining walk iteration: one real trak
    // followed by a size-0 'trak' stub reads as n_tracks == 1, never 1+N
    val stuck = u32(0) ++ cc("trak")
    val moovBad = u32((8 + 108 + 8 + 8).toLong) ++ cc("moov") ++
      mvhd ++ trak ++ stuck
    val badBytes = (u32(16) ++ cc("ftyp") ++ cc("mp42") ++ u32(0)) ++ moovBad
    val badRow = MultimodalPipeline.mp4MetaFrom(
      Seq((2L, badBytes)).toDF("media_id", "payload")).head()
    badRow.getAs[Long]("n_tracks") shouldBe 1L

    // end-to-end over the synthesized corpus: every parse round-trips
    val out = MultimodalPipeline.mediaMp4Meta(spark, sf)
      .select($"roundtrip_ok").as[Boolean].collect()
    out should not be empty
    all(out) shouldBe true
  }

  test("MP3 frame walk parses hand-built tagged streams; corrupted sync " +
    "is terminal") {
    // MPEG-1 Layer III, 48 kHz (sr index 1), 96 kbps (br index 7), two
    // frames (pad 0 then pad 1), behind an ID3v2.4 tag with a 5-byte
    // body — frame lengths 144000*96/48000 = 288 and 289
    def frame(pad: Int, len: Int): Array[Byte] =
      Array(0xff.toByte, 0xfb.toByte,
        ((7 << 4) | (1 << 2) | (pad << 1)).toByte, 0xc0.toByte) ++
        Array.fill[Byte](len - 4)(0)
    val id3 = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0) ++ Array[Byte](0, 0, 0, 5) ++
      Array.fill[Byte](5)(0x41)
    val good = id3 ++ frame(0, 288) ++ frame(1, 289)
    val r = MultimodalPipeline.mp3MetaFrom(
      Seq((1L, good)).toDF("media_id", "payload")).head()
    r.getAs[Long]("first_frame_at") shouldBe 16L // 1-based: 10B hdr + 5B body
    r.getAs[Long]("bitrate_kbps") shouldBe 96L
    r.getAs[Long]("sample_rate") shouldBe 48000L
    r.getAs[Long]("n_frames") shouldBe 2L
    r.getAs[Long]("duration_ms") shouldBe (2L * 1152000L / 48000L)

    // a corrupted second sync word stops the walk at frame 1 — the
    // remaining bytes are never misread as frames
    val broken = id3 ++ frame(0, 288) ++
      frame(1, 289).updated(0, 0x00.toByte)
    val rb = MultimodalPipeline.mp3MetaFrom(
      Seq((2L, broken)).toDF("media_id", "payload")).head()
    rb.getAs[Long]("n_frames") shouldBe 1L

    // an untagged stream (no ID3) starts the walk at byte 1
    val bare = MultimodalPipeline.mp3MetaFrom(
      Seq((3L, frame(0, 288))).toDF("media_id", "payload")).head()
    bare.getAs[Long]("first_frame_at") shouldBe 1L
    bare.getAs[Long]("n_frames") shouldBe 1L

    // a payload truncated MID-HEADER (frame 1 complete, then 2 bytes of
    // a second header): beUint reads past the end return NULL, which
    // must be TERMINAL — not poison the fold state into null n_frames
    val truncated = frame(0, 288) ++ Array(0xff.toByte, 0xfb.toByte)
    val rt = MultimodalPipeline.mp3MetaFrom(
      Seq((4L, truncated)).toDF("media_id", "payload")).head()
    rt.getAs[Long]("n_frames") shouldBe 1L
    rt.getAs[Long]("bitrate_kbps") shouldBe 96L

    // end-to-end over the synthesized corpus: every parse round-trips
    val out = MultimodalPipeline.mediaMp3Meta(spark, sf)
      .select($"roundtrip_ok").as[Boolean].collect()
    out should not be empty
    all(out) shouldBe true
  }

  test("AAC ADTS walk reassembles split frame lengths; reserved " +
    "sampling index is terminal") {
    // LC profile (1), 44.1 kHz (sf index 4), stereo, two frames with
    // EXPLICIT lengths 16 and 23 — the 13-bit length splits 2+8+3
    def adts(sfIdx: Int, flen: Int): Array[Byte] =
      Array(0xff.toByte, 0xf1.toByte,
        ((1 << 6) | (sfIdx << 2) | 0).toByte,
        ((2 & 3) << 6 | ((flen >> 11) & 3)).toByte,
        ((flen >> 3) & 0xff).toByte,
        (((flen & 7) << 5) | 0x1f).toByte, 0xfc.toByte) ++
        Array.fill[Byte](flen - 7)(0)
    val good = adts(4, 16) ++ adts(4, 23)
    val r = MultimodalPipeline.aacMetaFrom(
      Seq((1L, good)).toDF("media_id", "payload")).head()
    r.getAs[Long]("aot") shouldBe 2L // profile 1 -> object type 2 (LC)
    r.getAs[Long]("sample_rate") shouldBe 44100L
    r.getAs[Long]("channels") shouldBe 2L
    r.getAs[Long]("n_frames") shouldBe 2L
    r.getAs[Long]("duration_ms") shouldBe (2L * 1024000L / 44100L)

    // a reserved sampling index (13) in the second header is terminal
    val broken = adts(4, 16) ++ adts(13, 23)
    MultimodalPipeline.aacMetaFrom(
        Seq((2L, broken)).toDF("media_id", "payload"))
      .head().getAs[Long]("n_frames") shouldBe 1L

    // a payload truncated MID-HEADER (3 bytes of a second ADTS header):
    // the out-of-range reads return NULL, which must be terminal — not
    // null-poison n_frames (the mp3Walk discipline)
    val truncated = adts(4, 16) ++ Array(0xff.toByte, 0xf1.toByte,
      ((1 << 6) | (4 << 2) | 0).toByte)
    val rt = MultimodalPipeline.aacMetaFrom(
      Seq((3L, truncated)).toDF("media_id", "payload")).head()
    rt.getAs[Long]("n_frames") shouldBe 1L
    rt.getAs[Long]("sample_rate") shouldBe 44100L

    // end-to-end over the synthesized corpus
    val out = MultimodalPipeline.mediaAacMeta(spark, sf)
      .select($"roundtrip_ok").as[Boolean].collect()
    out should not be empty
    all(out) shouldBe true
  }

  test("H.264 AVCC walk classifies NAL types and reads SPS profile/level; " +
    "a zero-length NAL is terminal") {
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def nal(header: Int, body: Array[Byte]): Array[Byte] =
      u32(body.length + 1L) ++ Array(header.toByte) ++ body
    // High profile (100), level 4.1 (41) — plain bytes before Exp-Golomb
    val sps = nal(0x67, Array(100.toByte, 0x00, 41.toByte, 0, 0))
    val pps = nal(0x68, Array[Byte](0x3c, 0x40.toByte))
    val idr = nal(0x65, Array.fill[Byte](9)(0x11))
    val slice = nal(0x41, Array.fill[Byte](5)(0x22))
    val good = sps ++ pps ++ idr ++ slice ++ slice
    val r = MultimodalPipeline.h264MetaFrom(
      Seq((1L, good)).toDF("media_id", "payload")).head()
    r.getAs[Long]("profile_idc") shouldBe 100L
    r.getAs[Long]("level_idc") shouldBe 41L
    r.getAs[Long]("n_sps") shouldBe 1L
    r.getAs[Long]("n_pps") shouldBe 1L
    r.getAs[Long]("n_frames") shouldBe 3L // 1 IDR + 2 slices

    // a zero-length NAL mid-stream is terminal, never re-counted
    val broken = sps ++ pps ++ idr ++ u32(0L) ++ slice
    MultimodalPipeline.h264MetaFrom(
        Seq((2L, broken)).toDF("media_id", "payload"))
      .head().getAs[Long]("n_frames") shouldBe 1L

    // a payload truncated MID-LENGTH-PREFIX (2 of the 4 length bytes):
    // the out-of-range read returns NULL, which must be terminal — not
    // null-poison the NAL counters (the mp3Walk discipline)
    val truncated = sps ++ pps ++ idr ++ u32(5L).take(2)
    val rt = MultimodalPipeline.h264MetaFrom(
      Seq((3L, truncated)).toDF("media_id", "payload")).head()
    rt.getAs[Long]("n_frames") shouldBe 1L
    rt.getAs[Long]("n_sps") shouldBe 1L

    // end-to-end over the synthesized corpus
    val out = MultimodalPipeline.mediaH264Meta(spark, sf)
      .select($"roundtrip_ok").as[Boolean].collect()
    out should not be empty
    all(out) shouldBe true
  }

  test("WAV decode is REAL: JDK codec walks chunks, PCM stats equal the sample law") {
    // the operator end-to-end: decoder-reported header fields and
    // decoded-frame stats equal the construction law
    val feats = MultimodalPipeline.mediaWavFeatures(spark, sf).collect()
    feats.length shouldBe 500
    // sample_rate comes from the decoder's AudioFormat — it varies per
    // row, so a fixed-44-byte-header fake could not produce this column
    feats.map(_.getAs[Long]("sample_rate")).distinct.sorted.toSeq shouldBe
      Seq(8000L, 9000L, 10000L, 11000L)
    feats.take(20).foreach { r =>
      val d = r.getAs[Long]("media_id")
      val n = r.getAs[Long]("n_samples").toInt
      val s = (0 until n).map(i => MultimodalPipeline.wavSample(d, i))
      r.getAs[Long]("pcm_sum") shouldBe s.map(_.toLong).sum
      r.getAs[Long]("zero_cross") shouldBe
        s.sliding(2).count(p => (p(0) < 128) != (p(1) < 128)).toLong
    }

    // the container is genuinely parsed, not offset-sliced: corrupting
    // the data-chunk SIZE field makes the real reader mis-frame (throw
    // or change sample count) — a fixed-offset fake would not notice
    val row = MultimodalPipeline.wavTable(spark, sf)
      .filter($"media_id" === 7L).select($"payload")
      .as[Array[Byte]].head()
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(row))
    val n7 = ais.readAllBytes().length
    val idx = {
      // locate the ASCII "data" tag, then its u32le size field
      val pat = "data".getBytes("US-ASCII")
      row.indices.find(i => i + 4 <= row.length &&
        row.slice(i, i + 4).sameElements(pat)).get + 4
    }
    val corrupt = row.clone()
    corrupt(idx) = (corrupt(idx) - 4).toByte // claim 4 fewer sample bytes
    val res = try {
      val a2 = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(corrupt))
      Some(a2.readAllBytes().length)
    } catch { case _: Throwable => None }
    res should not be Some(n7)
  }
}

/** Static executor-side probe for the distributed-delivery test (closures
  * serialize per task, so a captured buffer would lose mutations; a
  * singleton object resolves to the same instance in local mode).
  */
object NotifyProbe {
  val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
