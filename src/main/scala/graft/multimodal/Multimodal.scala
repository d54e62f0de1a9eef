package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column processing (north-star extension): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata structs, and
  * per-row media work happens in partition-wise batches.
  *
  * Codec status: IMAGE decode/resize, WAV-audio metadata, and MJPEG-in-AVI
  * VIDEO keyframes are REAL — the JDK ships the image/audio codecs
  * (`javax.imageio`: PNG/JPEG/BMP/GIF; `javax.sound.sampled`: WAV) and the
  * AVI container is a plain RIFF chunk tree walked by [[aviVideoFrames]]
  * (MJPEG frames are whole JPEGs, decodable by ImageIO). Non-RIFF
  * containers (MP4/MKV) stay out of scope — no JDK parser — and the
  * byte-slice `sampleFrames` below remains the generic STUB path for
  * payloads with no parsed container. The Spark-side plumbing is shared
  * and real:
  *  - an explicit, stable schema for payload + metadata (no inference);
  *  - `mapPartitions` batching with ONE decoder context per partition
  *    (codec/model init is the expensive part; per-row init is the classic
  *    anti-pattern this structure prevents);
  *  - bounded per-batch memory: frames stream through the iterator, never
  *    a whole partition materialized;
  *  - results exploding back to long form for downstream relational ops.
  */
object Multimodal {

  /** Decoded image metadata + a cheap content feature (mean ITU-R BT.601
    * luma in [0, 255], rounded to 4 decimals — deterministic). */
  final case class ImageMeta(id: Long, width: Int, height: Int,
      avgLuma: Double)

  /** Decoded audio metadata (WAV/AIFF — the JDK's built-in parsers). */
  final case class AudioMeta(id: Long, sampleRate: Double, channels: Int,
      frames: Long)

  /** REAL image decode via `javax.imageio` — dimensions plus mean luma.
    * One pass over the pixels; undecodable payloads fail loudly (a silent
    * null would poison downstream quality gates). */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for id ${r.id}")
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        ImageMeta(r.id, w, h,
          BigDecimal(sum / (w.toLong * h)).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  /** REAL image resize (bilinear `Graphics2D`, re-encoded PNG) — the
    * normalize-before-embedding step of a vision data pipeline. */
  def resizeImages(media: Dataset[MediaRow], width: Int,
      height: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for id ${r.id}")
        val out = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, width, height, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        MediaRow(r.id, r.kind, bos.toByteArray)
      }
    }
  }

  /** REAL audio metadata via `javax.sound.sampled` (WAV/AIFF headers). */
  def decodeAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(r.payload))
        AudioMeta(r.id, aff.getFormat.getSampleRate.toDouble,
          aff.getFormat.getChannels, aff.getFrameLength.toLong)
      }
    }
  }

  /** Synthesize a PCM16 WAV payload (silence) with the given format — the
    * deterministic media generator for codec round-trip checks: a REAL
    * header decode must invert the synth parameters exactly. Runs inside
    * executors (pure params → bytes). */
  def synthWav(sampleRate: Float, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](frames * 2 * channels)),
      fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthesize a PCM16 mono WAV with an ACTUAL sample payload — the
    * content-bearing sibling of [[synthWav]] (which carries silence and
    * only exercises the header path). Little-endian samples through the
    * real `javax.sound` WAVE writer; WAV PCM is lossless, so a later
    * decode must reproduce every sample bit-for-bit. */
  def synthWavPcm(sampleRate: Float, samples: Array[Short]): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL PCM decode → per-frame peak amplitude: the actual
    * `javax.sound` stream decoder reads every sample (PCM16 LE mono by
    * contract) and folds `frameLen`-sample frames to their peak |sample|.
    * One array row per payload — the frame walk is row-local executor
    * work, so the audio-feature pass is a map, never a shuffle. */
  def decodeAudioFrames(media: Dataset[MediaRow],
      frameLen: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian, s"PCM16 LE mono expected, got $fmt")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val amps = Array.ofDim[Int]((n + frameLen - 1) / frameLen)
        var s = 0
        while (s < n) {
          val v = (bytes(2 * s + 1).toInt << 8) | (bytes(2 * s) & 0xff)
          val a = math.abs(v)
          val f = s / frameLen
          if (a > amps(f)) amps(f) = a
          s += 1
        }
        (r.id, amps.toSeq)
      }
    }.toDF("doc_id", "amps")
  }

  /** Energy-threshold VAD over [[decodeAudioFrames]] output: per payload,
    * total/speech frame counts, speech ratio, the number of speech RUNS
    * (voice-activity segments: a frame at ≥ `threshold` whose predecessor
    * was below), and the peak amplitude. All row-local higher-order-
    * function arithmetic on the frame array — no explode, no window. */
  def vadReport(frames: DataFrame, threshold: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val amps = col("amps")
    frames.select(col("doc_id"),
      size(amps).cast("long").as("total_frames"),
      size(filter(amps, a => a >= threshold)).cast("long")
        .as("speech_frames"),
      // prev frame's peak, 0 (silence) before the first frame; the CASE
      // keeps element_at off index 0 (ANSI arrays are 1-based)
      size(filter(amps, (a, i) => a >= threshold &&
        when(i === 0, lit(0)).otherwise(element_at(amps, i))
          < threshold)).cast("long")
        .as("segments"),
      array_max(amps).cast("long").as("peak"))
  }

  /** Synthesize a grayscale PNG from a pure (x, y) → gray function — the
    * image twin of [[synthWav]]: a REAL PNG encode whose later decode must
    * reproduce the parameters exactly (PNG is lossless, so it does). Runs
    * inside executors. */
  def synthGrayPng(width: Int, height: Int,
      gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = gray(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit perceptual difference hash (dHash) — the image near-dup
    * fingerprint (Krawetz's dHash; the standard cheap perceptual hash
    * image dedup pipelines run before any embedding model): decode, gray
    * via EXACT integer luma ((299r + 587g + 114b) div 1000 — no floating
    * point, so a grayscale synth round-trips bit-exactly), bilinear-resize
    * to 9×8 unless the payload already is, then one bit per adjacent
    * horizontal pixel pair (set iff left < right). Near-identical images
    * land within a few bits of Hamming distance; the hash is 8 bytes per
    * image at any corpus size. Row-local mapPartitions (the multimodal
    * decode pattern); returns (id, dhash). */
  def dHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val decoded = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(decoded != null, s"undecodable image payload for id ${r.id}")
        val img =
          if (decoded.getWidth == 9 && decoded.getHeight == 8) decoded
          else {
            val out = new java.awt.image.BufferedImage(9, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(decoded, 0, 0, 9, 8, null)
            g.dispose()
            out
          }
        def luma(x: Int, y: Int): Int = {
          val rgb = img.getRGB(x, y)
          (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
        }
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (luma(x, y) < luma(x + 1, y)) h |= (1L << (y * 8 + x))
            x += 1
          }
          y += 1
        }
        (r.id, h)
      }
    }.toDF("id", "dhash")
  }

  /** Hamming-near pairs over [[dHash]] fingerprints via 4×16-bit segment
    * blocking — the simhash trick: a pair within distance ≤ 3 differs in
    * at most 3 of the 4 segments, so it MUST agree on one (pigeonhole) —
    * lossless recall at `maxDist ≤ 3`, and the join is a hash equi-join
    * on (segment index, segment value), never an all-pairs scan. */
  def dHashPairs(hashes: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "4-segment blocking is lossless only for maxDist <= 3")
    val segs = (0 until 4).map(i => struct(lit(i).as("seg"),
      shiftright(col("dhash"), i * 16).bitwiseAND(lit(0xffffL)).as("sv")))
    val ex = hashes.select(col("id"), col("dhash"),
      explode(array(segs: _*)).as("s"))
    ex.alias("x").join(ex.alias("y"),
        col("x.s.seg") === col("y.s.seg") &&
          col("x.s.sv") === col("y.s.sv") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.dhash").bitwiseXOR(col("y.dhash")))
          .cast("long").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Decoded video keyframe metadata. */
  final case class VideoKeyframe(id: Long, frameIdx: Int, width: Int,
      height: Int, avgLuma: Double)

  /** Walk a RIFF/AVI chunk tree and yield the compressed-video chunk
    * payloads (`##dc` entries inside the `movi` LIST) in stream order.
    * Pure bytes→bytes, so it runs inside executors. Malformed containers
    * fail loudly rather than yielding silent empties. */
  def aviVideoFrames(bytes: Array[Byte]): Iterator[Array[Byte]] = {
    def fourcc(off: Int): String = new String(bytes, off, 4, "ISO-8859-1")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    require(bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      "not a RIFF/AVI container")
    def walk(start: Int, end: Int): Iterator[Array[Byte]] =
      new Iterator[Array[Byte]] {
        private var off = start
        private var nested: Iterator[Array[Byte]] = Iterator.empty
        private var pending: Array[Byte] = advance()
        private def advance(): Array[Byte] = {
          while (true) {
            if (nested.hasNext) return nested.next()
            if (off + 8 > end) return null
            val cc = fourcc(off)
            val size = u32(off + 4).toInt
            val dataOff = off + 8
            off = dataOff + size + (size & 1) // chunks are word-aligned
            if (cc == "LIST" && size >= 4) {
              nested = walk(dataOff + 4, dataOff + size)
            } else if (cc.endsWith("dc") && size > 0) {
              return java.util.Arrays.copyOfRange(bytes, dataOff,
                math.min(dataOff + size, bytes.length))
            }
          }
          null // unreachable
        }
        override def hasNext: Boolean = pending != null
        override def next(): Array[Byte] = {
          val r = pending; pending = advance(); r
        }
      }
    walk(12, bytes.length)
  }

  /** REAL video keyframe extraction for MJPEG-in-AVI payloads: every
    * `##dc` chunk is a complete JPEG (in MJPEG each frame is a keyframe),
    * decoded by ImageIO; `stride` subsamples (every stride-th frame) and
    * `maxFrames` bounds output per video. Frames stream through the
    * partition iterator — constant memory per task. */
  def videoKeyframes(media: Dataset[MediaRow], stride: Int = 1,
      maxFrames: Int = Int.MaxValue): Dataset[VideoKeyframe] = {
    import media.sparkSession.implicits._
    require(stride >= 1 && maxFrames >= 1, "stride/maxFrames must be >= 1")
    media.mapPartitions { it =>
      it.flatMap { r =>
        aviVideoFrames(r.payload).zipWithIndex
          .collect { case (f, i) if i % stride == 0 => (f, i) }
          .take(maxFrames)
          .map { case (f, i) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(f))
            require(img != null, s"undecodable frame $i in video ${r.id}")
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            VideoKeyframe(r.id, i, w, h,
              BigDecimal(sum / (w.toLong * h)).setScale(4,
                BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
      }
    }
  }

  /** Build a minimal RIFF/AVI container holding the given video frame
    * payloads as `00dc` chunks — the video sibling of [[synthWavPcm]] /
    * [[synthGrayPng]]: a deterministic container generator whose later
    * [[aviVideoFrames]] walk must yield exactly these payloads. Frames
    * are whatever ImageIO can decode; PNG payloads keep the pixel data
    * lossless, which is what makes a downstream luma analysis
    * oracle-computable. */
  def synthAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(cc.getBytes("ISO-8859-1"))
      val n = data.length
      bos.write(Array[Byte](n.toByte, (n >> 8).toByte, (n >> 16).toByte,
        (n >> 24).toByte))
      bos.write(data)
      if (n % 2 == 1) bos.write(0) // word alignment
      bos.toByteArray
    }
    def list(listType: String, subs: Seq[Array[Byte]]): Array[Byte] =
      chunk("LIST",
        listType.getBytes("ISO-8859-1") ++ subs.flatten.toArray)
    val body = list("hdrl", Seq(chunk("avih", new Array[Byte](56)))) ++
      list("movi", frames.map(chunk("00dc", _)))
    chunk("RIFF", "AVI ".getBytes("ISO-8859-1") ++ body)
  }

  /** One row of the VIDEO SIDECAR table — the per-id container metadata
    * an external probe emits (production: ffprobe/mp4dump writing a
    * parquet sidecar next to the media lake; here: [[probeVideoSidecar]]'s
    * ISO-BMFF box walk). Curation decisions (duration/resolution gates,
    * bitrate budgeting, frame-sample planning) join THIS table by id and
    * never touch the payload bytes — the same external-convert pattern as
    * the SPSS/Stata ingest path (`ingest/SavReader.scala`). */
  final case class VideoSidecar(id: Long, brand: String, timescale: Long,
      durationUnits: Long, width: Int, height: Int, mdatBytes: Long)

  /** Build a minimal structurally-valid ISO-BMFF (MP4) container:
    * `ftyp` (major brand isom) + `moov`(`mvhd` carrying
    * timescale/duration + `trak`(`tkhd` carrying 16.16 fixed-point
    * width/height)) + one `mdat` of deterministic filler. The codec
    * payload is junk by design — the MP4/MKV DECODE stub (m1) stays
    * honest — but the box structure is real ISO/IEC 14496-12, so
    * [[probeVideoSidecar]]'s walk must invert every parameter (the
    * synth→parse round-trip contract of [[synthWav]]/[[synthAvi]]). */
  def synthMp4(timescale: Int, durationUnits: Int, width: Int, height: Int,
      mdatBytes: Int): Array[Byte] = {
    def be32(v: Int): Array[Byte] = Array[Byte]((v >>> 24).toByte,
      (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def box(cc: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ cc.getBytes("ISO-8859-1") ++ payload
    val matrix = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .flatMap(be32)
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1") ++ be32(0) ++
        "isom".getBytes("ISO-8859-1"))
    // mvhd v0: fullbox(4) creation(4) modification(4) TIMESCALE(4)
    // DURATION(4) rate(4) volume(2) reserved(10) matrix(36) predefined(24)
    // next_track(4)
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(durationUnits) ++ be32(0x00010000) ++
      Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++ matrix ++
      new Array[Byte](24) ++ be32(2))
    // tkhd v0: fullbox(4) creation(4) modification(4) track(4) reserved(4)
    // duration(4) reserved(8) layer/alt/volume/reserved(8) matrix(36)
    // WIDTH(4, 16.16) HEIGHT(4, 16.16)
    val tkhd = box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++
      be32(0) ++ be32(durationUnits) ++ new Array[Byte](16) ++ matrix ++
      be32(width << 16) ++ be32(height << 16))
    val mdat = box("mdat",
      Array.tabulate(mdatBytes)(i => (i * 31 + 7).toByte))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd)) ++ mdat
  }

  /** REAL ISO-BMFF box walk of one payload: top-level boxes, recursing
    * into moov/trak, reading mvhd (timescale, duration), tkhd (16.16
    * width/height) and summing mdat payload bytes. Corrupt structure
    * fails loudly with the offending id — a curation pipeline must
    * quarantine bad containers, not silently zero their metadata. */
  def parseMp4Sidecar(id: Long, b: Array[Byte]): VideoSidecar = {
    def u32(off: Int): Long = ((b(off) & 0xffL) << 24) |
      ((b(off + 1) & 0xffL) << 16) | ((b(off + 2) & 0xffL) << 8) |
      (b(off + 3) & 0xffL)
    def cc(off: Int): String = new String(b, off + 4, 4, "ISO-8859-1")
    var brand = ""; var ts = 0L; var du = 0L
    var w = 0; var h = 0; var md = 0L
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = u32(off)
        require(size >= 8 && off + size <= end,
          s"corrupt box '${cc(off)}' (size $size) at $off in media $id")
        def need(n: Int): Unit = require(size >= 8 + n,
          s"box '${cc(off)}' at $off too small ($size) in media $id")
        cc(off) match {
          case "ftyp" => need(4)
            brand = new String(b, off + 8, 4, "ISO-8859-1")
          case "moov" | "trak" => walk(off + 8, off + size.toInt)
          case "mvhd" => need(20)
            ts = u32(off + 8 + 12); du = u32(off + 8 + 16)
          case "tkhd" => need(84)
            w = (u32(off + 8 + 76) >>> 16).toInt
            h = (u32(off + 8 + 80) >>> 16).toInt
          case "mdat" => md += size - 8
          case _ => ()
        }
        off += size.toInt
      }
    }
    walk(0, b.length)
    require(ts > 0, s"no mvhd box in media $id — not an MP4 container")
    VideoSidecar(id, brand, ts, du, w, h, md)
  }

  /** The external-probe step as a typed partition map: media bytes in,
    * sidecar metadata rows out. Production runs this ONCE per ingested
    * batch and persists the result (the m7 query writes it to a parquet
    * sidecar table); every later curation query joins the sidecar by id
    * and leaves the payload column unread. */
  def probeVideoSidecar(media: Dataset[MediaRow]): Dataset[VideoSidecar] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => parseMp4Sidecar(r.id, r.payload)))
  }

  /** One MKV payload's probed sidecar row — the Matroska twin of
    * [[VideoSidecar]]: EBML DocType, timestamp scale (ns per tick;
    * Matroska's default 1,000,000 applies when the element is absent),
    * duration in ticks (a float in the container), pixel dimensions
    * from the video TrackEntry, and the summed SimpleBlock frame
    * bytes (the `mdat` analog). Curation joins THIS table by id and
    * never touches payload bytes again. */
  final case class MkvSidecar(id: Long, docType: String,
      timestampScale: Long, durationTicks: Double, width: Int,
      height: Int, blockBytes: Long)

  /** Build a minimal structurally-valid Matroska container (EBML, RFC
    * 8794 / matroska.org): EBML header carrying DocType, then one
    * Segment with Info (TimestampScale + float Duration),
    * Tracks/TrackEntry (type video) with PixelWidth/PixelHeight, and
    * one Cluster holding a SimpleBlock of deterministic filler frames.
    * The codec payload is junk by design — the DECODE stub (m1) stays
    * honest — but the element structure is real EBML, so
    * [[parseMkvSidecar]]'s walk must invert every parameter (the
    * synth→parse round-trip contract of [[synthMp4]]/[[synthWav]]).
    * `omitScale = true` drops the TimestampScale element so the parse
    * side's spec can prove the Matroska DEFAULT (1,000,000 ns). */
  def synthMkv(timestampScale: Long, durationTicks: Double, width: Int,
      height: Int, blockBytes: Int,
      omitScale: Boolean = false): Array[Byte] = {
    def vintSize(n: Long): Array[Byte] = {
      var len = 1
      while (len <= 8 && n >= (1L << (7 * len)) - 1) len += 1
      require(len <= 8, s"size $n does not fit an EBML VINT")
      val out = new Array[Byte](len)
      var v = n | (1L << (7 * len)) // the marker bit
      for (i <- (len - 1) to 0 by -1) { out(i) = (v & 0xff).toByte; v >>>= 8 }
      out
    }
    def uintBytes(v: Long): Array[Byte] = {
      var len = 1
      while (len < 8 && (v >>> (8 * len)) != 0) len += 1
      Array.tabulate(len)(i => ((v >>> (8 * (len - 1 - i))) & 0xff).toByte)
    }
    def el(id: Array[Int], data: Array[Byte]): Array[Byte] =
      id.map(_.toByte) ++ vintSize(data.length.toLong) ++ data
    def f64(d: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(d)
      Array.tabulate(8)(i => ((bits >>> (8 * (7 - i))) & 0xff).toByte)
    }
    val header = el(Array(0x1A, 0x45, 0xDF, 0xA3),
      el(Array(0x42, 0x82), "matroska".getBytes("ISO-8859-1")))
    val info = el(Array(0x15, 0x49, 0xA9, 0x66),
      (if (omitScale) Array.emptyByteArray
       else el(Array(0x2A, 0xD7, 0xB1), uintBytes(timestampScale))) ++
        el(Array(0x44, 0x89), f64(durationTicks)))
    val video = el(Array(0xE0),
      el(Array(0xB0), uintBytes(width.toLong)) ++
        el(Array(0xBA), uintBytes(height.toLong)))
    val trackEntry = el(Array(0xAE),
      el(Array(0xD7), uintBytes(1L)) ++ // TrackNumber
        el(Array(0x83), uintBytes(1L)) ++ video) // TrackType = video
    val tracks = el(Array(0x16, 0x54, 0xAE, 0x6B), trackEntry)
    // SimpleBlock data: track VINT (0x81) + 2-byte rel timestamp +
    // flags (keyframe) + the junk frame bytes the sidecar counts
    val blockData = Array[Byte](0x81.toByte, 0, 0, 0x80.toByte) ++
      Array.tabulate(blockBytes)(i => (i * 37 + 11).toByte)
    val cluster = el(Array(0x1F, 0x43, 0xB6, 0x75),
      el(Array(0xE7), uintBytes(0L)) ++ el(Array(0xA3), blockData))
    header ++ el(Array(0x18, 0x53, 0x80, 0x67), info ++ tracks ++ cluster)
  }

  /** REAL EBML walk of one Matroska payload: element IDs and sizes are
    * variable-length integers (length from the leading byte's marker
    * bit), master elements (EBML / Segment / Info / Tracks / TrackEntry
    * / Video / Cluster) recurse, leaves decode as uint / float /
    * string, SimpleBlock frame bytes sum net of the block header
    * (track VINT + timestamp + flags). TimestampScale falls back to
    * Matroska's spec default 1,000,000 ns when absent. Corrupt
    * structure — size overruns, unknown-size (streamed) elements, a
    * missing DocType or video dimensions — fails loudly with the
    * offending id: a curation pipeline must quarantine bad containers,
    * not silently zero their metadata. */
  def parseMkvSidecar(id: Long, b: Array[Byte]): MkvSidecar = {
    def vintLen(first: Byte, what: String, off: Int): Int = {
      val u = first & 0xff
      require(u != 0, s"corrupt $what VINT at $off in media $id")
      8 - (31 - Integer.numberOfLeadingZeros(u)) // leading-zero count + 1
    }
    def readId(off: Int): (Long, Int) = {
      val len = vintLen(b(off), "id", off)
      require(len <= 4 && off + len <= b.length,
        s"corrupt element id at $off in media $id")
      var v = 0L
      for (i <- 0 until len) v = (v << 8) | (b(off + i) & 0xffL)
      (v, len)
    }
    def readSize(off: Int): (Long, Int) = {
      val len = vintLen(b(off), "size", off)
      require(off + len <= b.length,
        s"corrupt element size at $off in media $id")
      var v = (b(off) & 0xffL) & ((1L << (8 - len)) - 1)
      for (i <- 1 until len) v = (v << 8) | (b(off + i) & 0xffL)
      require(v != (1L << (7 * len)) - 1,
        s"unknown-size (streamed) element at $off in media $id — " +
          "unsupported")
      (v, len)
    }
    def uint(off: Int, n: Int): Long = {
      var v = 0L
      for (i <- 0 until n) v = (v << 8) | (b(off + i) & 0xffL)
      v
    }
    var docType = ""; var ts = -1L; var dur = 0.0
    var w = 0; var h = 0; var blk = 0L
    val masters = Set(0x1A45DFA3L, 0x18538067L, 0x1549A966L, 0x1654AE6BL,
      0xAEL, 0xE0L, 0x1F43B675L)
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off < end) {
        val (eid, idLen) = readId(off)
        val (sz, szLen) = readSize(off + idLen)
        val data = off + idLen + szLen
        require(data + sz <= end,
          s"corrupt element 0x${eid.toHexString} (size $sz) at $off " +
            s"overruns its parent in media $id")
        val n = sz.toInt
        eid match {
          case m if masters.contains(m) => walk(data, data + n)
          case 0x4282L => docType = new String(b, data, n, "ISO-8859-1")
          case 0x2AD7B1L => ts = uint(data, n)
          case 0x4489L =>
            require(n == 4 || n == 8,
              s"Duration float must be 4 or 8 bytes, got $n in media $id")
            dur = if (n == 4)
              java.lang.Float.intBitsToFloat(uint(data, 4).toInt).toDouble
            else java.lang.Double.longBitsToDouble(uint(data, 8))
          case 0xB0L => w = uint(data, n).toInt
          case 0xBAL => h = uint(data, n).toInt
          case 0xA3L =>
            val tLen = vintLen(b(data), "block track", data)
            require(n >= tLen + 3,
              s"SimpleBlock too small ($n) in media $id")
            blk += n - (tLen + 3) // net of track VINT + timestamp + flags
          case _ => () // unknown leaf: skip (EBML forward-compat rule)
        }
        off = data + n
      }
    }
    walk(0, b.length)
    require(docType.nonEmpty,
      s"no EBML DocType in media $id — not a Matroska container")
    require(w > 0 && h > 0,
      s"no video dimensions in media $id — not a video Matroska file")
    MkvSidecar(id, docType, if (ts > 0) ts else 1000000L, dur, w, h, blk)
  }

  /** The MKV external-probe step as a typed partition map — the
    * Matroska twin of [[probeVideoSidecar]]: run ONCE per ingested
    * batch, persisted as a sidecar table, payload bytes never travel
    * again. */
  def probeMkvSidecar(media: Dataset[MediaRow]): Dataset[MkvSidecar] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => parseMkvSidecar(r.id, r.payload)))
  }

  /** Scene-cut detection over [[videoKeyframes]] output: a cut is a
    * frame whose mean-luma jump from its predecessor reaches `threshold`
    * (the classic histogram/intensity-difference shot detector). Per
    * video: frame count, cut count, shot count, mean shot length, and
    * the largest jump. The lag window partitions by video id — bounded
    * by the frames-per-video contract, never corpus-global — so the
    * whole pass is decode (map) + one bounded window + one aggregate. */
  def sceneCuts(keyframes: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("id")).orderBy(col("frameIdx"))
    keyframes
      .withColumn("__prev", lag(col("avgLuma"), 1).over(w))
      .withColumn("__jump", when(col("__prev").isNull, lit(0.0))
        .otherwise(abs(col("avgLuma") - col("__prev"))))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("frames"),
        sum(when(col("__jump") >= threshold, 1L).otherwise(0L)).as("cuts"),
        round(max(col("__jump")), 4).as("max_jump"))
      .select(col("id").as("doc_id"), col("frames"), col("cuts"),
        (col("cuts") + 1L).as("shots"),
        round(col("frames") / (col("cuts") + lit(1.0)), 4)
          .as("mean_shot_len"),
        col("max_jump"))
  }

  /** Typed payload row: id + media kind + raw bytes. */
  final case class MediaRow(id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata (what a real header parse would yield). */
  final case class MediaMeta(id: Long, kind: String, byteLen: Long,
      width: Int, height: Int)

  /** A sampled frame: payload slice `idx` of the media item. */
  final case class Frame(id: Long, idx: Int, frame: Array[Byte])

  /** Container sniff by MAGIC BYTES — the dispatch every ingest probe
    * starts with: ISO-BMFF carries `ftyp` at offset 4, Matroska/WebM
    * opens with the EBML id 0x1A45DFA3. Anything else is "unknown" and
    * falls to the stub path (a real pipeline would quarantine or
    * fingerprint it). */
  def sniffContainer(b: Array[Byte]): String =
    if (b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
        b(7) == 'p') "mp4"
    else if (b.length >= 4 && (b(0) & 0xff) == 0x1a &&
        (b(1) & 0xff) == 0x45 && (b(2) & 0xff) == 0xdf &&
        (b(3) & 0xff) == 0xa3) "mkv"
    else "unknown"

  /** Decoder context — the codec/model handle that is expensive to
    * construct and must be built once per partition, not per row.
    * Payloads whose magic identifies a container this library REALLY
    * parses (MP4 box walk, MKV EBML walk — the m7/m8 probes) route to
    * those walkers and report genuine dimensions; only genuinely
    * unknown formats take the STUB path (dimensions faked from the
    * first two bytes — the documented m1 placeholder for codecs this
    * container image lacks). */
  private final class DecoderContext {
    /** Byte-slice stub dims — the m1 placeholder for formats this
      * container image cannot really decode, and the QUARANTINE
      * fallback for corrupt containers. */
    private def stub(r: MediaRow, kind: String): MediaMeta = MediaMeta(
      r.id, kind, r.payload.length.toLong,
      if (r.payload.length > 0) r.payload(0) & 0xff else 0,
      if (r.payload.length > 1) r.payload(1) & 0xff else 0)

    def decodeMeta(r: MediaRow): MediaMeta =
      sniffContainer(r.payload) match {
        case "mp4" =>
          // quarantine, don't crash: ONE truncated/corrupt container
          // (or a stray payload with 'ftyp' at offset 4) must not fail
          // the whole partition — the box walk's structural checks
          // throw, and the row degrades to an explicitly-tagged stub
          // a downstream filter can route to a dead-letter table
          try {
            val s = parseMp4Sidecar(r.id, r.payload)
            MediaMeta(r.id, "mp4", r.payload.length.toLong,
              s.width, s.height)
          } catch { case scala.util.control.NonFatal(_) =>
            stub(r, "quarantined")
          }
        case "mkv" =>
          try {
            val s = parseMkvSidecar(r.id, r.payload)
            MediaMeta(r.id, "mkv", r.payload.length.toLong,
              s.width, s.height)
          } catch { case scala.util.control.NonFatal(_) =>
            stub(r, "quarantined")
          }
        case _ => stub(r, r.kind)
      }

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
