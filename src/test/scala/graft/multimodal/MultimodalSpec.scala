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
}
