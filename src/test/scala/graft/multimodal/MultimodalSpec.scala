package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, Array[Byte](100, 50, 1, 2, 3)),
        (2L, Array[Byte](-1, 0)), // 0xff byte: unsigned decode
        (3L, Array.emptyByteArray))
      .toDF("id", "payload"), "id", "payload", kind = "img")

  test("decodeMeta reads header dims unsigned, survives empty payloads") {
    val metas = Multimodal.decodeMeta(media).collect()
      .map(m => m.id -> ((m.byteLen, m.width, m.height))).toMap
    assert(metas(1L) == ((5L, 100, 50)))
    assert(metas(2L) == ((2L, 255, 0)))
    assert(metas(3L) == ((0L, 0, 0)))
  }

  test("sampleFrames slices payloads, caps frame count, keeps order") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 2, maxFrames = 2)
      .collect().map(f => (f.id, f.idx, f.frame.toSeq))
    assert(frames.count(_._1 == 1L) == 2) // capped at 2 of 3 possible
    assert(frames.filter(_._1 == 1L).map(_._3).toSeq ==
      Seq(Seq[Byte](100, 50), Seq[Byte](1, 2)))
    assert(frames.count(_._1 == 3L) == 0) // empty payload -> no frames
  }

  test("decodeMeta routes by container MAGIC: ftyp payloads take the " +
    "real MP4 box walk, EBML payloads the real MKV walk (genuine " +
    "dimensions, detected kind), and only unknown formats fall to the " +
    "stub") {
    import spark.implicits._
    val mp4 = Multimodal.synthMp4(timescale = 1000, durationUnits = 5000,
      width = 640, height = 480, mdatBytes = 32)
    val mkv = Multimodal.synthMkv(timestampScale = 1000000L,
      durationTicks = 2500.0, width = 1280, height = 720,
      blockBytes = 32)
    val rows = Seq(
      Multimodal.MediaRow(1L, "bin", mp4),
      Multimodal.MediaRow(2L, "bin", mkv),
      Multimodal.MediaRow(3L, "bin", Array[Byte](9, 7, 1))).toDS()
    val metas = Multimodal.decodeMeta(rows).collect()
      .map(m => m.id -> ((m.kind, m.width, m.height))).toMap
    assert(metas(1L) == (("mp4", 640, 480)), "real box-walk dims")
    assert(metas(2L) == (("mkv", 1280, 720)), "real EBML-walk dims")
    assert(metas(3L) == (("bin", 9, 7)), "unknown magic keeps the stub")
    assert(Multimodal.sniffContainer(mp4) == "mp4" &&
      Multimodal.sniffContainer(mkv) == "mkv" &&
      Multimodal.sniffContainer(Array.emptyByteArray) == "unknown")
  }

  test("decodeMeta QUARANTINES corrupt containers instead of failing " +
    "the partition: a truncated mp4 / stray-ftyp payload and a " +
    "truncated EBML payload degrade to an explicitly-tagged stub row, " +
    "and healthy rows in the same partition still decode") {
    import spark.implicits._
    val mp4 = Multimodal.synthMp4(timescale = 1000, durationUnits = 5000,
      width = 640, height = 480, mdatBytes = 32)
    // 'ftyp' at offset 4 but nothing else — sniffs mp4, walk must throw
    val strayFtyp = Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p')
    val truncatedMp4 = mp4.take(mp4.length / 2)
    val truncatedMkv = Array[Byte](0x1a, 0x45.toByte, 0xdf.toByte,
      0xa3.toByte, 0x01)
    val rows = Seq(
      Multimodal.MediaRow(1L, "bin", strayFtyp),
      Multimodal.MediaRow(2L, "bin", truncatedMp4),
      Multimodal.MediaRow(3L, "bin", truncatedMkv),
      Multimodal.MediaRow(4L, "bin", mp4)).toDS().coalesce(1)
    val metas = Multimodal.decodeMeta(rows).collect()
      .map(m => m.id -> ((m.kind, m.width, m.height))).toMap
    assert(metas(1L)._1 == "quarantined", metas(1L).toString)
    assert(metas(2L)._1 == "quarantined", metas(2L).toString)
    assert(metas(3L)._1 == "quarantined", metas(3L).toString)
    assert(metas(4L) == (("mp4", 640, 480)),
      "a healthy row sharing the partition must still really decode")
  }

  test("media rows keep explicit schema through the typed pipeline") {
    val df = Multimodal.decodeMeta(media).toDF()
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      Seq("id" -> "bigint", "kind" -> "string", "byteLen" -> "bigint",
        "width" -> "int", "height" -> "int"))
  }

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages: real PNG decode, dimensions and mean luma") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(3, 2, 0xffffff)), // white
      Multimodal.MediaRow(2L, "image", pngBytes(2, 2, 0x000000)), // black
      Multimodal.MediaRow(3L, "image", pngBytes(1, 1, 0xff0000))  // red
    ).toDS()
    val metas = Multimodal.decodeImages(media).collect()
      .map(m => m.id -> m).toMap
    assert(metas(1L).width == 3 && metas(1L).height == 2)
    assert(metas(1L).avgLuma == 255.0) // .299+.587+.114 == 1 exactly
    assert(metas(2L).avgLuma == 0.0)
    assert(metas(3L).avgLuma == BigDecimal(0.299 * 255)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("decodeImages fails loudly on an undecodable payload") {
    import spark.implicits._
    val bad = Seq(Multimodal.MediaRow(9L, "image",
      Array[Byte](1, 2, 3, 4))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(bad).collect()
    }
    assert(e.getMessage.contains("undecodable") ||
      Option(e.getCause).exists(_.getMessage.contains("undecodable")))
  }

  test("resizeImages: real bilinear resize, round-trips through ImageIO") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", pngBytes(4, 4, 0x808080))).toDS()
    val out = Multimodal.resizeImages(media, 2, 3).collect().head
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(img.getWidth == 2 && img.getHeight == 3)
    assert((img.getRGB(0, 0) & 0xffffff) == 0x808080) // uniform stays uniform
  }

  test("decodeAudioMeta: real WAV header parse") {
    import spark.implicits._
    // 8 kHz mono 16-bit WAV, 100 frames, built with the JDK encoder
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](200)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 100L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val media = Seq(Multimodal.MediaRow(7L, "audio", bos.toByteArray)).toDS()
    val meta = Multimodal.decodeAudioMeta(media).collect().head
    assert(meta.sampleRate == 8000.0 && meta.channels == 1 &&
      meta.frames == 100L)
  }

  test("synthWavPcm→decodeAudioFrames round-trip: exact per-frame peaks, " +
    "ragged tail frame, negative peaks rectified") {
    import spark.implicits._
    // 10 samples, frameLen 4 -> frames of 4, 4, 2 (ragged tail)
    val samples = Array[Short](100, -300, 5, 0, /**/ -7, 7, 2, -2, /**/ 9, -1)
    val media = Seq(Multimodal.MediaRow(1L, "audio",
      Multimodal.synthWavPcm(8000f, samples))).toDS()
    val amps = Multimodal.decodeAudioFrames(media, frameLen = 4)
      .collect().head.getSeq[Int](1)
    assert(amps.toList == List(300, 7, 9))
  }

  test("vadReport: segment runs merge across adjacent speech frames; " +
    "leading silence, all-silent and all-speech edges") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(0, 0, 900, 900, 0, 600, 0, 0)), // 2 runs, 3 speech frames
      (2L, Seq(0, 0, 0)),                      // silent
      (3L, Seq(700, 700, 700)),                // one run, all speech
      (4L, Seq(499, 500))                      // threshold boundary: >= 500
    ).toDF("doc_id", "amps")
    val r = Multimodal.vadReport(rows, threshold = 500).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("total_frames"), x.getAs[Long]("speech_frames"),
          x.getAs[Long]("segments"), x.getAs[Long]("peak")))).toMap
    assert(r(1L) == ((8L, 3L, 2L, 900L)))
    assert(r(2L) == ((3L, 0L, 0L, 0L)))
    assert(r(3L) == ((3L, 3L, 1L, 700L)))
    assert(r(4L) == ((2L, 1L, 1L, 500L)))
  }

  test("synthMp4 → parseMp4Sidecar round-trip: the box walk inverts " +
    "every parameter, including 16.16 fixed-point dimensions") {
    val cases = Seq(
      (600, 600 * 7, 320, 240, 1000),
      (90000, 90000 * 19, 1920, 1080, 512),
      (1, 1, 16, 16, 0)) // zero-byte mdat still counts as a box
    cases.foreach { case (ts, du, w, h, md) =>
      val sc = Multimodal.parseMp4Sidecar(9L,
        Multimodal.synthMp4(ts, du, w, h, md))
      assert(sc == Multimodal.VideoSidecar(9L, "isom", ts, du, w, h, md),
        s"params ($ts,$du,$w,$h,$md) did not round-trip: $sc")
    }
  }

  test("parseMp4Sidecar fails loudly on corrupt or non-MP4 payloads, " +
    "naming the id") {
    // truncated mid-box: size field points past the payload end
    val good = Multimodal.synthMp4(600, 6000, 320, 240, 100)
    val err1 = intercept[IllegalArgumentException](
      Multimodal.parseMp4Sidecar(7L, good.dropRight(50)))
    assert(err1.getMessage.contains("media 7"))
    // structurally valid boxes but no moov/mvhd: not a video container
    val err2 = intercept[IllegalArgumentException](
      Multimodal.parseMp4Sidecar(8L,
        Array[Byte](0, 0, 0, 8) ++ "free".getBytes("ISO-8859-1")))
    assert(err2.getMessage.contains("no mvhd"))
    // a box whose fourcc promises a payload its size can't hold must
    // fail the parse contract, not throw an array read
    val err3 = intercept[IllegalArgumentException](
      Multimodal.parseMp4Sidecar(9L,
        Array[Byte](0, 0, 0, 8) ++ "mvhd".getBytes("ISO-8859-1")))
    assert(err3.getMessage.contains("too small"))
  }

  test("synthMkv → parseMkvSidecar round-trip: the EBML walk inverts " +
    "every parameter (VINT ids/sizes, float Duration, SimpleBlock " +
    "frame mass); an absent TimestampScale falls back to Matroska's " +
    "1,000,000 ns default") {
    val cases = Seq(
      (1000000L, 7000.0, 640, 360, 1000),
      (50000L, 123456.0, 1920, 1080, 0), // zero-frame block still parses
      // a >2^14 size VINT (big block) and a multi-byte uint scale
      (1000000000L, 1.5, 16, 16, 20000))
    cases.foreach { case (ts, du, w, h, blk) =>
      val sc = Multimodal.parseMkvSidecar(9L,
        Multimodal.synthMkv(ts, du, w, h, blk))
      assert(sc == Multimodal.MkvSidecar(9L, "matroska", ts, du, w, h,
        blk.toLong), s"params ($ts,$du,$w,$h,$blk) did not round-trip: $sc")
    }
    val defaulted = Multimodal.parseMkvSidecar(3L,
      Multimodal.synthMkv(999L, 5000.0, 320, 240, 10, omitScale = true))
    assert(defaulted.timestampScale == 1000000L,
      s"absent TimestampScale must default: $defaulted")
  }

  test("parseMkvSidecar fails loudly on corrupt or non-Matroska " +
    "payloads, naming the id") {
    val good = Multimodal.synthMkv(1000000L, 7000.0, 640, 360, 500)
    // truncated mid-element: a size overruns its parent
    val err1 = intercept[IllegalArgumentException](
      Multimodal.parseMkvSidecar(7L, good.dropRight(40)))
    assert(err1.getMessage.contains("media 7"))
    // structurally-valid EBML but no DocType: not a Matroska container
    val err2 = intercept[IllegalArgumentException](
      Multimodal.parseMkvSidecar(8L,
        Array[Byte](0xEC.toByte, 0x82.toByte, 1, 2))) // Void element
    assert(err2.getMessage.contains("no EBML DocType"))
    // an unknown-size (streamed) element is rejected, not misparsed
    val err3 = intercept[IllegalArgumentException](
      Multimodal.parseMkvSidecar(9L,
        Array[Byte](0xEC.toByte, 0xFF.toByte, 0)))
    assert(err3.getMessage.contains("unknown-size"))
    // a zero first byte can never start a VINT
    val err4 = intercept[IllegalArgumentException](
      Multimodal.parseMkvSidecar(10L, Array[Byte](0, 1, 2)))
    assert(err4.getMessage.contains("VINT"))
  }

  test("probeVideoSidecar is the one pass that touches bytes: the " +
    "persisted sidecar answers curation queries payload-free") {
    val media = (0L until 20L).toDF("id")
      .select(col("id"), lit("video").as("kind")).as[(Long, String)]
      .map { case (id, kind) => Multimodal.MediaRow(id, kind,
        Multimodal.synthMp4(600, (600L * (5 + id % 20)).toInt,
          (320 + 16 * (id % 8)).toInt, (240 + 16 * (id % 5)).toInt,
          (1000 + id).toInt)) }
    val dir = java.nio.file.Files.createTempDirectory("m7spec").toString
    Multimodal.probeVideoSidecar(media).write.mode("overwrite").parquet(dir)
    val sc = spark.read.parquet(dir)
    // analytic truth: duration, dims and mdat all come back from parquet
    val rows = sc.select("id", "brand", "timescale", "durationUnits",
        "width", "height", "mdatBytes")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getInt(5), r.getLong(6)))).toMap
    (0L until 20L).foreach { id =>
      assert(rows(id) == (("isom", 600L, 600L * (5 + id % 20),
        (320 + 16 * (id % 8)).toInt, (240 + 16 * (id % 5)).toInt,
        1000L + id)))
    }
    // and the curation read's plan touches only the sidecar parquet
    val plan = sc.filter(col("width") >= 384).queryExecution
      .executedPlan.toString
    assert(plan.contains("m7spec") && !plan.contains("payload"), plan)
  }
}
