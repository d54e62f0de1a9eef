package graft.multimodal

import java.io.ByteArrayOutputStream

import graft.SparkSpec
import Multimodal.MediaRow

/** REAL MJPEG-in-AVI keyframe extraction against a container built here
  * chunk-by-chunk (RIFF writer independent of the reader): nested LISTs,
  * word alignment, non-video chunks skipped, stride/maxFrames sampling.
  */
class VideoKeyframeSpec extends SparkSpec {

  private def jpeg(rgb: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(cc.getBytes("ISO-8859-1"))
    val n = data.length
    bos.write(Array[Byte](n.toByte, (n >> 8).toByte, (n >> 16).toByte,
      (n >> 24).toByte))
    bos.write(data)
    if (n % 2 == 1) bos.write(0) // word alignment
    bos.toByteArray
  }

  private def list(listType: String, subs: Array[Byte]*): Array[Byte] =
    chunk("LIST", listType.getBytes("ISO-8859-1") ++ subs.flatten)

  private def avi(frames: Array[Byte]*): Array[Byte] = {
    val body = list("hdrl", chunk("avih", new Array[Byte](56))) ++
      chunk("JUNK", Array[Byte](1, 2, 3)) ++ // odd size: alignment path
      list("movi",
        chunk("00dc", frames.head) +:
          chunk("01wb", Array.fill[Byte](64)(7)) +: // audio chunk: skipped
          frames.tail.map(chunk("00dc", _)): _*)
    chunk("RIFF", "AVI ".getBytes("ISO-8859-1") ++ body).toSeq.toArray
  }

  private val (black, gray, white) = (0x000000, 0x808080, 0xffffff)
  private def fixture: Array[Byte] =
    avi(jpeg(black, 32, 24), jpeg(gray, 32, 24), jpeg(white, 32, 24))

  test("aviVideoFrames yields exactly the ##dc payloads in order") {
    val frames = Multimodal.aviVideoFrames(fixture).toSeq
    assert(frames.length == 3)
    frames.foreach { f =>
      // every MJPEG frame is a complete JPEG: SOI marker FF D8
      assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8)
    }
  }

  test("videoKeyframes decodes frames with correct dims and luma ordering") {
    import spark.implicits._
    val media = Seq(MediaRow(7L, "video", fixture)).toDS()
    val kf = Multimodal.videoKeyframes(media).collect().sortBy(_.frameIdx)
    assert(kf.length == 3)
    assert(kf.forall(k => k.id == 7L && k.width == 32 && k.height == 24))
    assert(kf(0).avgLuma < 5 && kf(2).avgLuma > 250,
      s"black/white luma off: ${kf.toSeq}")
    assert(math.abs(kf(1).avgLuma - 128) < 5, s"gray luma off: ${kf(1)}")
  }

  test("stride and maxFrames subsample deterministically") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, "video", fixture)).toDS()
    assert(Multimodal.videoKeyframes(media, stride = 2)
      .collect().map(_.frameIdx).sorted.toSeq == Seq(0, 2))
    assert(Multimodal.videoKeyframes(media, maxFrames = 1)
      .collect().map(_.frameIdx).toSeq == Seq(0))
  }

  test("non-AVI payloads fail loudly") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.aviVideoFrames("nope".getBytes ++ new Array[Byte](64)).toSeq
    }
    assert(e.getMessage.contains("RIFF"))
  }

  test("synthAvi round-trips through aviVideoFrames, PNG frames decode " +
    "to exact luma") {
    import spark.implicits._
    val pngs = Seq(60, 60, 200).map(g =>
      Multimodal.synthGrayPng(9, 8, (_, _) => g))
    val avi = Multimodal.synthAvi(pngs)
    val back = Multimodal.aviVideoFrames(avi).toSeq
    assert(back.map(_.toSeq) == pngs.map(_.toSeq))
    val kf = Multimodal
      .videoKeyframes(Seq(MediaRow(1L, "video", avi)).toDS())
      .collect().sortBy(_.frameIdx).map(_.avgLuma).toSeq
    assert(kf == Seq(60.0, 60.0, 200.0), s"PNG luma must be exact: $kf")
  }

  test("sceneCuts: jump at threshold counts, below-threshold does not; " +
    "static video has one shot") {
    import spark.implicits._
    def video(id: Long, grays: Int*) = MediaRow(id, "video",
      Multimodal.synthAvi(grays.map(g =>
        Multimodal.synthGrayPng(9, 8, (_, _) => g))))
    val media = Seq(
      video(1L, 10, 10, 50, 50, 49),  // one 40-jump cut; 1-jump is not
      video(2L, 128, 128, 128),       // static: zero cuts
      video(3L, 0, 39, 78)            // two 39-jumps: below threshold
    ).toDS()
    val r = Multimodal
      .sceneCuts(Multimodal.videoKeyframes(media).toDF(), threshold = 40.0)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("frames"), x.getAs[Long]("cuts"),
          x.getAs[Long]("shots"), x.getAs[Double]("max_jump")))).toMap
    assert(r(1L) == ((5L, 1L, 2L, 40.0)))
    assert(r(2L) == ((3L, 0L, 1L, 0.0)))
    assert(r(3L) == ((3L, 0L, 1L, 39.0)))
  }
}
