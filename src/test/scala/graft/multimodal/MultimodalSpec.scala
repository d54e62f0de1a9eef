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
}
