package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = {
    val rows = Seq(
      Row(1L, "image", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), Row("s", 8L)),
      Row(2L, "audio", Array[Byte](-1, -2), Row(null, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("decodeFeatures: schema, byte counts, deterministic checksum") {
    val out = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_bytes") == 8L)
    assert(out(0).getAs[Long]("checksum") == (1 to 8).sum.toLong)
    // unsigned byte handling: -1 -> 255, -2 -> 254
    assert(out(1).getAs[Long]("checksum") == 255L + 254L)
    assert(out(0).getAs[Int]("width") == 64 + 36 % 1857)
  }

  test("decoder seam: factory runs once per partition, decode once per row") {
    // The contract a native codec depends on: its (expensive) init is
    // amortized per partition, never per row — counted through the seam
    // with accumulators so the counts come from the executor side.
    val inits = spark.sparkContext.longAccumulator("decoder-inits")
    val decodes = spark.sparkContext.longAccumulator("decoder-calls")
    val m = media.repartition(3)
    val nPartitions = m.rdd.getNumPartitions
    val out = Multimodal.decodeFeatures(m, () => {
      inits.add(1)
      bytes => { decodes.add(1); Multimodal.fakeDecode(bytes) }
    })
    assert(out.count() == 2)
    assert(inits.value == nPartitions,
      s"expected one decoder init per partition ($nPartitions), got ${inits.value}")
    assert(decodes.value == 2, s"expected one decode per row, got ${decodes.value}")
    // and an injected decoder's output flows through (not the default stub)
    val injected = Multimodal.decodeFeatures(m, () => _ => (7L, 2, 3))
      .select("checksum", "width", "height").distinct().collect()
    assert(injected.toSeq.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))) ==
      Seq((7L, 2, 3)))
  }

  test("imageIoDecoder decodes REAL PNG bytes to true dimensions through the seam") {
    // tiny PNGs generated in-test via the JDK: the real bytes→(w,h) path
    // the fakeDecode stub stands in for on synthetic payloads
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val (p1, p2) = (png(5, 3), png(7, 2))
    val rows = Seq(
      Row(1L, "image", p1, Row("gen", p1.length.toLong)),
      Row(2L, "image", p2, Row("gen", p2.length.toLong)))
    val mediaDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val out = Multimodal.decodeFeatures(mediaDf, Multimodal.imageIoDecoder)
      .orderBy("media_id").collect()
    assert(out.map(r => (r.getAs[Int]("width"), r.getAs[Int]("height"))).toSeq ==
      Seq((5, 3), (7, 2)))
    // checksum and byte count describe the ENCODED payload, not pixels
    assert(out(0).getAs[Long]("n_bytes") == p1.length.toLong)
    assert(out(0).getAs[Long]("checksum") == Multimodal.byteChecksum(p1))
  }

  test("imageIoDecoder fails loudly on undecodable bytes") {
    val ex = intercept[Exception] {
      val rows = Seq(Row(1L, "image", Array[Byte](1, 2, 3), Row(null, null)))
      Multimodal.decodeFeatures(
        spark.createDataFrame(spark.sparkContext.parallelize(rows), Multimodal.mediaSchema),
        Multimodal.imageIoDecoder).collect()
    }
    assert(ex.getMessage != null)
  }

  test("fakeDecode matches the SQL-side formula shape") {
    val (sum, w, h) = Multimodal.fakeDecode(Array[Byte](10, 20))
    assert(sum == 30L && w == (64 + 30 % 1857) && h == (48 + 30 % 1393))
  }

  test("multimodal_decode_png: every generated PNG decodes to its true dimensions") {
    val rows = SparkEntry.queries("multimodal_decode_png")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("dims_match"),
        s"codec round-trip broke for media ${r.getAs[Long]("media_id")}: " +
          s"decoded ${r.getAs[Int]("width")}x${r.getAs[Int]("height")} vs " +
          s"expected ${r.getAs[Int]("exp_w")}x${r.getAs[Int]("exp_h")}")
      assert(r.getAs[Long]("n_bytes") > 0)
    }
  }

  test("dHash64 is deterministic exact block averaging, sensitive to block flips") {
    def img(f: (Int, Int) => Int) = {
      val im = new java.awt.image.BufferedImage(
        36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 36) {
        val g = f(x, y); im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      im
    }
    val base = img((x, y) => (x * 37 + y * 91) % 256)
    assert(Multimodal.dHash64(base) == Multimodal.dHash64(
      img((x, y) => (x * 37 + y * 91) % 256)))
    // raising one 4x4 block over a FLAT field flips exactly the
    // comparison entering it (left neighbor) and no other: d == 1; a
    // raised block can never move more than its two horizontal
    // comparisons (the <=2-bits-per-block bound the planted corpus'
    // Hamming budget rides)
    val flat = img((_, _) => 100)
    val bumped = img((x, y) => if (x / 4 == 4 && y / 4 == 3) 200 else 100)
    val d = java.lang.Long.bitCount(
      Multimodal.dHash64(flat) ^ Multimodal.dHash64(bumped))
    assert(d == 1, s"one raised block over a flat field moved $d bits")
    // non-aligned dims fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.dHash64(new java.awt.image.BufferedImage(
        35, 32, java.awt.image.BufferedImage.TYPE_INT_RGB))
    }
  }

  test("multimodal_dedup_phash: full recall on planted variants, zero false pairs") {
    val rows = SparkEntry.queries("multimodal_dedup_phash")(
      spark, "/root/testdata/sf0.001").collect()
    // planted: first 96 doc_ids, group = id % 16, nested perturbations
    // guarantee Hamming <= 6 within a group; mixed patterns keep groups
    // ~32 bits apart
    val expected = (for {
      a <- 0L until 96L; b <- (a + 1) until 96L if a % 16 == b % 16
    } yield (a, b)).toSet
    val got = rows.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(got == expected,
      s"recall/precision broke: missing ${(expected -- got).take(3)}, " +
        s"spurious ${(got -- expected).take(3)}")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("same_group"))
      assert(r.getAs[Int]("hamming") <= 6)
    }
  }

  test("wavDecoder parses REAL RIFF bytes to true header facts through the seam") {
    // tiny PCM WAVs generated in-test via the JDK — the audio sibling of
    // the PNG round-trip above
    def wav(rate: Int, channels: Int, frames: Int): Array[Byte] = {
      val pcm = new Array[Byte](frames * channels * 2)
      for (i <- pcm.indices) pcm(i) = ((i * 7) % 251).toByte
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val (w1, w2) = (wav(8000, 1, 120), wav(22050, 2, 333))
    val rows = Seq(
      Row(1L, "audio", w1, Row("gen", w1.length.toLong)),
      Row(2L, "audio", w2, Row("gen", w2.length.toLong)))
    val mediaDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val out = Multimodal.decodeAudioFeatures(mediaDf).orderBy("media_id").collect()
    assert(out.map(r => (r.getAs[Int]("sample_rate_hz"), r.getAs[Int]("channels"),
      r.getAs[Long]("n_frames"))).toSeq == Seq((8000, 1, 120L), (22050, 2, 333L)))
    // duration derives from the header with integer arithmetic
    assert(out(0).getAs[Long]("duration_us") == 120L * 1000000L / 8000L)
    assert(out(0).getAs[Long]("checksum") == Multimodal.byteChecksum(w1))
    assert(out(0).getAs[Long]("n_bytes") == w1.length.toLong)
  }

  test("audio decoder seam: factory once per partition, header parse once per row") {
    val inits = spark.sparkContext.longAccumulator("wav-inits")
    val decodes = spark.sparkContext.longAccumulator("wav-calls")
    val m = media.repartition(3)
    val nPartitions = m.rdd.getNumPartitions
    val out = Multimodal.decodeAudioFeatures(m, () => {
      inits.add(1)
      bytes => { decodes.add(1); (Multimodal.byteChecksum(bytes), 8000, 1, 10L) }
    })
    assert(out.count() == 2)
    assert(inits.value == nPartitions,
      s"expected one decoder init per partition ($nPartitions), got ${inits.value}")
    assert(decodes.value == 2, s"expected one parse per row, got ${decodes.value}")
  }

  test("wavDecoder fails loudly on non-audio bytes") {
    val ex = intercept[Exception] {
      val rows = Seq(Row(1L, "audio", Array[Byte](1, 2, 3), Row(null, null)))
      Multimodal.decodeAudioFeatures(
        spark.createDataFrame(spark.sparkContext.parallelize(rows),
          Multimodal.mediaSchema)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("multimodal_decode_wav: every generated WAV header-parses to its parameters") {
    val rows = SparkEntry.queries("multimodal_decode_wav")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("params_match"),
        s"WAV round-trip broke for media ${r.getAs[Long]("media_id")}: " +
          s"decoded ${r.getAs[Int]("sample_rate_hz")}Hz/" +
          s"${r.getAs[Int]("channels")}ch/${r.getAs[Long]("n_frames")}f vs " +
          s"expected ${r.getAs[Int]("exp_rate")}/${r.getAs[Int]("exp_ch")}/" +
          s"${r.getAs[Long]("exp_frames")}")
      assert(r.getAs[Long]("n_bytes") > 44L) // RIFF header + payload
      assert(r.getAs[Long]("duration_us") ==
        r.getAs[Long]("n_frames") * 1000000L / r.getAs[Int]("sample_rate_hz"))
    }
  }

  test("gifDecoder parses REAL animated-GIF bytes to frame census through the seam") {
    // multi-frame GIFs generated in-test via the JDK sequence writer —
    // the video sibling of the PNG/WAV round-trips above
    def gif(w: Int, h: Int, frames: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        for (f <- 0 until frames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until h; x <- 0 until w)
            img.setRGB(x, y, ((f * 101 + x * 7 + y * 13) % 0xffffff))
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "video", gif(12, 9, 3), Row("s", 0L)),
      Row(2L, "video", gif(5, 7, 1), Row("s", 0L)),
      Row(3L, "video", gif(20, 4, 6), Row("s", 0L)))
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val out = Multimodal.decodeVideoFeatures(m).orderBy("media_id").collect()
    assert(out.map(r => (r.getAs[Int]("width"), r.getAs[Int]("height"),
      r.getAs[Int]("n_frames"))).toSeq == Seq((12, 9, 3), (5, 7, 1), (20, 4, 6)))
    out.foreach(r => assert(r.getAs[Long]("checksum") > 0L))
  }

  test("gifDecoder fails loudly on non-GIF bytes") {
    import org.apache.spark.sql.Row
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(9L, "video", Array[Byte](1, 2, 3, 4), Row(null, null)))),
      Multimodal.mediaSchema)
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoFeatures(bad).collect()
    }
    assert(ex.getMessage != null)
  }

  test("multimodal_decode_gif: every generated GIF decodes to its parameters") {
    val rows = SparkEntry.queries("multimodal_decode_gif")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("params_match"),
        s"GIF round-trip broke for media ${r.getAs[Long]("media_id")}: " +
          s"decoded ${r.getAs[Int]("width")}x${r.getAs[Int]("height")}" +
          s"x${r.getAs[Int]("n_frames")}f vs expected " +
          s"${r.getAs[Int]("exp_w")}x${r.getAs[Int]("exp_h")}" +
          s"x${r.getAs[Int]("exp_frames")}")
      assert(r.getAs[Long]("n_bytes") > 0L)
    }
  }

  test("multimodal_frame_stats: one row per decoded frame, luminance lawful, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val stats = SparkEntry.queries("multimodal_frame_stats")(spark, dir).collect()
    val census = SparkEntry.queries("multimodal_decode_gif")(spark, dir)
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("n_frames")).toMap
    // one row per frame of every fixture GIF
    val byMedia = stats.groupBy(_.getAs[Long]("media_id")).view.mapValues(_.length).toMap
    assert(byMedia == census, "frame-stat rows must match the container census")
    stats.foreach { r =>
      val lum = r.getAs[Double]("mean_luma")
      assert(lum >= 0.0 && lum <= 255.0, s"luminance $lum out of range")
      assert(r.getAs[Long]("n_pixels") ==
        r.getAs[Int]("width").toLong * r.getAs[Int]("height"))
      assert(r.getAs[Int]("frame_idx") >= 0)
    }
    // palette quantization is codec-defined but DETERMINISTIC: re-run equal
    val again = SparkEntry.queries("multimodal_frame_stats")(spark, dir).collect()
    assert(stats.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("sampleFrames: one row per stride step") {
    val out = Multimodal.sampleFrames(media, stride = 4).orderBy("media_id", "frame_idx")
      .collect()
    val img = out.filter(_.getAs[Long]("media_id") == 1L)
    assert(img.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 1L))
    assert(img.map(_.getAs[Int]("frame_byte")).toSeq == Seq(1, 5))
  }
}
