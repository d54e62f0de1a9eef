package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Perceptual-hash (dHash) contracts through the REAL codec + resize
  * path: re-encoded and re-sized variants of the same picture stay within
  * a few Hamming bits, unrelated pictures land far apart, and the
  * 4-segment blocking join finds exactly the all-pairs result at its
  * lossless threshold. */
class DHashSpec extends SparkSpec {

  import spark.implicits._

  // a recognizable "picture": horizontal gradient with a bright block
  // whose position depends on `variant`
  private def picture(w: Int, h: Int, variant: Int): Array[Byte] =
    Multimodal.synthGrayPng(w, h, (x, y) => {
      val base = (x * 255) / (w - 1)
      val inBlock = x >= w / 4 + variant && x < w / 2 + variant &&
        y >= h / 4 && y < h / 2
      if (inBlock) 255 - base else base
    })

  private def hashOf(rows: Seq[(Long, Array[Byte])]): Map[Long, Long] = {
    val media = rows.toDF("id", "payload").as[(Long, Array[Byte])]
      .map { case (id, p) => Multimodal.MediaRow(id, "image", p) }
    Multimodal.dHash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("the same picture at different sizes hashes within a few bits; " +
      "an unrelated picture lands far away (real resize path)") {
    val reversed = Multimodal.synthGrayPng(90, 80,
      (x, y) => 255 - (x * 255) / 89) // opposite gradient: unrelated
    val hs = hashOf(Seq(
      1L -> picture(90, 80, 0), // original
      2L -> picture(45, 40, 0), // same picture, half size
      3L -> reversed))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(hs(a) ^ hs(b))
    assert(dist(1L, 2L) <= 3,
      s"resized duplicate too far: ${dist(1L, 2L)} bits")
    assert(dist(1L, 3L) > 16,
      s"unrelated picture too close: ${dist(1L, 3L)} bits")
  }

  test("PNG round-trip is lossless: a 9x8 synth decodes to the exact " +
      "analytic dHash") {
    def analytic(gid: Int): Long = {
      def v(x: Int, y: Int) = (gid * 31 + x * 13 + y * 17) % 256
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (v(x, y) < v(x + 1, y)) h |= (1L << (y * 8 + x))
      h
    }
    val hs = hashOf((0 until 5).map(g => g.toLong ->
      Multimodal.synthGrayPng(9, 8,
        (x, y) => (g * 31 + x * 13 + y * 17) % 256)))
    (0 until 5).foreach(g => assert(hs(g.toLong) == analytic(g), s"gid $g"))
  }

  test("segment blocking finds exactly the all-pairs result at dist <= 3") {
    val rows = (0L until 40L).map(id => id ->
      picture(90, 80, (id % 5).toInt * 10))
    val hs = hashOf(rows)
    val hashes = hs.toSeq.toDF("id", "dhash")
    val blocked = Multimodal.dHashPairs(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val allPairs = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(blocked == allPairs)
    assert(allPairs.nonEmpty, "planted variants produced no near pairs")
  }
}
