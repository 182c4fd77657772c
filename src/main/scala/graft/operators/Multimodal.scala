package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): `fakeDecode` derives deterministic pseudo-metadata from the
  * bytes. Everything around it is the real Spark shape a 100 TB media
  * pipeline needs:
  *  - binary payload + metadata struct schema ([[mediaSchema]]);
  *  - batch-at-a-time `mapPartitions` (amortizes per-batch decoder init —
  *    the expensive part of real decoders — across a whole partition);
  *  - output schema declared up front (no inference over binary);
  *  - narrow transformation: no shuffle, scales linearly with partitions.
  */
object Multimodal {

  /** Media-fixture row multiplier (probe knob, r14): the decode/phash
    * fixtures are self-verifying bounded corpora (64/96 media rows) so
    * verify hashes stay pinned; the scale probe multiplies the image
    * COUNT through this env var without touching the pinned default —
    * the only honest way to measure the decode family's growth, since
    * the fixture bound otherwise hides it. */
  def mediaScale: Int =
    sys.env.get("SPARK_GRAFT_MEDIA_SCALE").map(_.toInt).getOrElse(1)

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_bytes", LongType, nullable = true))), nullable = true)))

  /** Decoded-feature schema produced by [[decodeFeatures]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Unsigned byte-sum checksum shared by every decoder (payload
    * integrity signal, independent of what the codec extracts). */
  def byteChecksum(bytes: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    sum
  }

  /** STUB decoder — deterministic fake: derives pseudo-(w, h) from the
    * checksum. Kept as the DEFAULT for the `multimodal_extract` query
    * path only because the harness's synthetic payloads are not real
    * image bytes and the DuckDB oracle replays this exact formula; real
    * media columns use [[imageIoDecoder]]. Returns (checksum, w, h). */
  def fakeDecode(bytes: Array[Byte]): (Long, Int, Int) = {
    val sum = byteChecksum(bytes)
    (sum, (64 + sum % 1857).toInt, (48 + sum % 1393).toInt)
  }

  /** REAL image decoder: JDK `javax.imageio.ImageIO` (PNG/JPEG/GIF/BMP
    * readers ship with the JVM — zero external dependencies, works
    * headless). The factory shape matches the seam contract: reader
    * plumbing is set up once per partition, the returned closure decodes
    * one payload to its actual (checksum, width, height). Undecodable
    * bytes fail loudly — silently fabricated dimensions are worse than a
    * dead-letter row at 100 TB (callers that want skip-semantics wrap
    * this in their own Try). */
  def imageIoDecoder(): Array[Byte] => (Long, Int, Int) = {
    // per-partition init: pin ImageIO's static reader registry scan here
    // (first use scans the classpath for ImageReader SPIs) so the per-row
    // closure only pays stream decode
    javax.imageio.ImageIO.getReaderFormatNames()
    bytes => {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"undecodable image payload (${bytes.length} bytes)")
      (byteChecksum(bytes), img.getWidth, img.getHeight)
    }
  }

  /** 64-bit difference hash (dHash — the standard perceptual image
    * fingerprint, e.g. Krawetz 2013) of a decoded image: downsample to a
    * 9×8 luminance grid, emit one bit per horizontal neighbor
    * comparison. Downsampling is EXACT integer block averaging over
    * block-aligned dims (w = 9·bw, h = 8·bh required), NOT Graphics2D
    * interpolation — the hash must be bit-reproducible across
    * JVMs/executors or the banded near-dup join is meaningless.
    * Luminance = (299R + 587G + 114B) / 1000 in integers. */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val gw = 9
    val gh = 8
    val bw = img.getWidth / gw
    val bh = img.getHeight / gh
    require(bw > 0 && bh > 0 && bw * gw == img.getWidth && bh * gh == img.getHeight,
      s"dHash64 needs block-aligned dims, got ${img.getWidth}x${img.getHeight}")
    val gray = Array.ofDim[Long](gh, gw)
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        var s = 0L
        var y = gy * bh
        while (y < (gy + 1) * bh) {
          var x = gx * bw
          while (x < (gx + 1) * bw) {
            val rgb = img.getRGB(x, y)
            s += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            x += 1
          }
          y += 1
        }
        gray(gy)(gx) = s / (bw.toLong * bh)
        gx += 1
      }
      gy += 1
    }
    var h = 0L
    var yy = 0
    while (yy < gh) {
      var xx = 0
      while (xx < gw - 1) {
        h = (h << 1) | (if (gray(yy)(xx + 1) > gray(yy)(xx)) 1L else 0L)
        xx += 1
      }
      yy += 1
    }
    h
  }

  /** Perceptual-hash decoder through the same per-partition factory seam
    * as [[imageIoDecoder]]: real ImageIO decode → [[dHash64]]. Returns
    * (checksum, width, height, dhash). */
  def phashDecoder(): Array[Byte] => (Long, Int, Int, Long) = {
    javax.imageio.ImageIO.getReaderFormatNames()
    bytes => {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"undecodable image payload (${bytes.length} bytes)")
      (byteChecksum(bytes), img.getWidth, img.getHeight, dHash64(img))
    }
  }

  /** Typed row for perceptual-hash features. */
  final case class PhashRow(media_id: Long, kind: String, n_bytes: Long,
                            checksum: Long, width: Int, height: Int,
                            dhash: Long)

  /** Perceptual-hash twin of [[decodeFeatures]]: identical per-partition
    * factory seam, narrow and shuffle-free, one 64-bit dHash per row. */
  def decodePhashFeatures(media: DataFrame,
                          decoderFactory: () => Array[Byte] => (Long, Int, Int, Long) =
                            () => phashDecoder()): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { it =>
        val decode = decoderFactory()
        it.map { m =>
          val (sum, w, h, dh) = decode(m.payload)
          PhashRow(m.media_id, m.kind, m.payload.length.toLong, sum, w, h, dh)
        }
      }
      .toDF()
  }

  /** REAL audio decoder: JDK `javax.sound.sampled.AudioSystem` (the WAV/
    * AIFF/AU file readers ship with the JVM — zero external dependencies,
    * headless-safe). Same factory shape as [[imageIoDecoder]]: the SPI
    * registry scan is pinned at per-partition init, the closure parses
    * ONE payload's header to (checksum, sampleRateHz, channels, nFrames).
    * Header-only — `getAudioFileFormat` reads the RIFF/fmt chunks without
    * decoding samples, which is exactly what a 100 TB audio-metadata pass
    * wants. Undecodable bytes fail loudly (the [[imageIoDecoder]]
    * dead-letter posture). */
  def wavDecoder(): Array[Byte] => (Long, Int, Int, Long) = {
    // per-partition init: force the AudioFileReader SPI scan once
    javax.sound.sampled.AudioSystem.getAudioFileTypes()
    bytes => {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      (byteChecksum(bytes), fmt.getSampleRate.toInt, fmt.getChannels,
        aff.getFrameLength.toLong)
    }
  }

  /** Typed row for the decode input (payload + identity columns). */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Typed row for the decoded features — mirrors [[decodedSchema]]. */
  final case class DecodedRow(media_id: Long, kind: String, n_bytes: Long,
                              checksum: Long, width: Int, height: Int)

  /** Decode/feature-extract over a media frame: a typed
    * `Dataset.mapPartitions` (narrow, shuffle-free) with the codec
    * behind an injectable per-partition factory — the seam a real
    * pipeline fills with `() => { val codec = NativeCodec.open(); bytes
    * => codec.decode(bytes) }`. The factory runs ONCE per partition (the
    * expensive decoder init amortized across the whole partition) and
    * the returned function once per row; `MultimodalSpec` counts both
    * through the seam with accumulators. Default factory hands out the
    * documented [[fakeDecode]] stub (this container has no codecs). */
  def decodeFeatures(media: DataFrame,
                     decoderFactory: () => Array[Byte] => (Long, Int, Int) =
                       () => fakeDecode): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { it =>
        val decode = decoderFactory() // one codec session per partition
        it.map { m =>
          val (sum, w, h) = decode(m.payload)
          DecodedRow(m.media_id, m.kind, m.payload.length.toLong, sum, w, h)
        }
      }
      .toDF()
  }

  /** Typed row for decoded audio features: header facts + the derived
    * duration (µs, integer arithmetic so every engine agrees). */
  final case class AudioDecodedRow(media_id: Long, kind: String, n_bytes: Long,
                                   checksum: Long, sample_rate_hz: Int,
                                   channels: Int, n_frames: Long,
                                   duration_us: Long)

  /** Audio twin of [[decodeFeatures]]: the identical per-partition
    * factory seam, producing header-level features (rate, channels,
    * frames, duration). Narrow, shuffle-free, schema up front. */
  def decodeAudioFeatures(media: DataFrame,
                          decoderFactory: () => Array[Byte] => (Long, Int, Int, Long) =
                            () => wavDecoder()): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { it =>
        val decode = decoderFactory()
        it.map { m =>
          val (sum, rate, ch, frames) = decode(m.payload)
          AudioDecodedRow(m.media_id, m.kind, m.payload.length.toLong, sum,
            rate, ch, frames, frames * 1000000L / rate)
        }
      }
      .toDF()
  }

  /** Typed row for decoded video features (animated-GIF frame census):
    * container facts a 100 TB video-metadata pass extracts without
    * touching pixel data beyond the first frame's dimensions. */
  final case class VideoDecodedRow(media_id: Long, kind: String, n_bytes: Long,
                                   checksum: Long, width: Int, height: Int,
                                   n_frames: Int)

  /** REAL video-kind decoder — animated-GIF frame census via the JDK
    * `ImageIO` GIF reader (ships with the JVM, headless-safe; GIF is the
    * one multi-frame container the JDK can open without external
    * codecs). The factory shape matches the seam contract, and here the
    * amortization is REAL state reuse, not just an SPI scan: ONE
    * `ImageReader` instance is created per partition and re-`setInput`
    * per payload (readers are documented reusable across inputs). The
    * closure parses one payload to (checksum, width, height, nFrames)
    * with `getNumImages(allowSearch = true)` — the authoritative frame
    * count. Undecodable bytes fail loudly (the [[imageIoDecoder]]
    * dead-letter posture). */
  def gifDecoder(): Array[Byte] => (Long, Int, Int, Int) = {
    val readers = javax.imageio.ImageIO.getImageReadersBySuffix("gif")
    require(readers.hasNext, "JDK GIF ImageReader missing")
    val reader = readers.next() // one reader per partition, reused per row
    bytes => {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        require(n >= 1, s"undecodable GIF payload (${bytes.length} bytes)")
        (byteChecksum(bytes), reader.getWidth(0), reader.getHeight(0), n)
      } finally { reader.setInput(null); iis.close() }
    }
  }

  /** Video twin of [[decodeFeatures]]: the identical per-partition
    * factory seam, producing container-level features (dims + frame
    * count). Narrow, shuffle-free, schema up front. */
  def decodeVideoFeatures(media: DataFrame,
                          decoderFactory: () => Array[Byte] => (Long, Int, Int, Int) =
                            () => gifDecoder()): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { it =>
        val decode = decoderFactory()
        it.map { m =>
          val (sum, w, h, frames) = decode(m.payload)
          VideoDecodedRow(m.media_id, m.kind, m.payload.length.toLong, sum,
            w, h, frames)
        }
      }
      .toDF()
  }

  /** Typed row for per-frame video features: one row per decoded frame
    * — the explode shape of real video feature extraction. */
  final case class FrameStatRow(media_id: Long, frame_idx: Int, width: Int,
                                height: Int, n_pixels: Long, mean_luma: Double)

  /** REAL per-frame feature extraction for the video kind: decode EVERY
    * frame of an animated GIF and emit its mean luminance — the
    * frame-level feature pass (sampling, shot detection, quality
    * filtering) a video training-data pipeline runs after the container
    * census. `flatMap` shape: one input row explodes to `n_frames`
    * output rows, still narrow and shuffle-free; the `ImageReader` is
    * created once per partition and re-`setInput` per payload (the
    * [[gifDecoder]] amortization). Luminance is an exact integer
    * (R+G+B) pixel sum divided once — deterministic per payload. */
  def gifFrameStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { it =>
        val readers = javax.imageio.ImageIO.getImageReadersBySuffix("gif")
        require(readers.hasNext, "JDK GIF ImageReader missing")
        val reader = readers.next()
        it.flatMap { m =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            (0 until n).map { f =>
              val img = reader.read(f)
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              FrameStatRow(m.media_id, f, w, h, w.toLong * h,
                math.rint(sum.toDouble / (3.0 * w * h) * 1e6) / 1e6)
            }
          } finally { reader.setInput(null); iis.close() }
        }
      }
      .toDF()
  }

  /** Deterministic frame-sampling stub: take every `stride`-th byte as a
    * "frame" digest — the Spark-side shape of video frame extraction
    * (explode to one row per sampled frame, narrow, shuffle-free). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("frame_idx",
        explode(expr(s"sequence(0, greatest(octet_length(payload) div $stride - 1, 0))")))
      .withColumn("frame_byte",
        // binary has no element accessor: slice one byte, hex-decode it
        expr(s"cast(conv(hex(substring(payload, frame_idx * $stride + 1, 1)), 16, 10) AS INT)"))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("frame_byte"))
}
