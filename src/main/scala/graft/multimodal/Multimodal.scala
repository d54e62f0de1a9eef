package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column processing (north-star extension): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata structs, and
  * per-row media work happens in partition-wise batches.
  *
  * The actual codecs are STUBBED — this container has no image/audio
  * libraries — with deterministic fakes (clearly marked below). What is real
  * and tested is the Spark-side plumbing that a production decode needs:
  *  - an explicit, stable schema for payload + metadata (no inference);
  *  - `mapPartitions` batching with ONE decoder context per partition
  *    (codec/model init is the expensive part; per-row init is the classic
  *    anti-pattern this structure prevents);
  *  - bounded per-batch memory: frames stream through the iterator, never
  *    a whole partition materialized;
  *  - results exploding back to long form for downstream relational ops.
  */
object Multimodal {

  /** Typed payload row: id + media kind + raw bytes. */
  final case class MediaRow(id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata (what a real header parse would yield). */
  final case class MediaMeta(id: Long, kind: String, byteLen: Long,
      width: Int, height: Int)

  /** A sampled frame: payload slice `idx` of the media item. */
  final case class Frame(id: Long, idx: Int, frame: Array[Byte])

  /** STUB decoder context — stands in for a codec/model handle that is
    * expensive to construct and must be built once per partition, not per
    * row. The fake "decode" reads dimensions from the first two bytes. */
  private final class DecoderContext {
    def decodeMeta(r: MediaRow): MediaMeta = MediaMeta(
      r.id, r.kind, r.payload.length.toLong,
      if (r.payload.length > 0) r.payload(0) & 0xff else 0,
      if (r.payload.length > 1) r.payload(1) & 0xff else 0)

    /** STUB frame sampler: the first `maxFrames` fixed-size slices of the
      * payload (a real one would seek keyframes). */
    def sampleFrames(r: MediaRow, frameBytes: Int, maxFrames: Int): Iterator[Frame] =
      r.payload.grouped(frameBytes).take(maxFrames).zipWithIndex
        .map { case (chunk, i) => Frame(r.id, i, chunk) }
  }

  /** Header metadata for every media row; one decoder per partition. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val ctx = new DecoderContext // per-partition init (the real cost)
      it.map(ctx.decodeMeta)
    }
  }

  /** Sampled frames in long form (id, idx, frame bytes); frames stream
    * through the partition iterator — constant memory per task. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
      maxFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val ctx = new DecoderContext
      it.flatMap(ctx.sampleFrames(_, frameBytes, maxFrames))
    }
  }

  /** Lift any (id, binary payload) frame into the typed media Dataset. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), lit(kind), col(payloadCol))
      .as[(Long, String, Array[Byte])]
      .map { case (i, k, p) => MediaRow(i, k, p) }
  }
}
