package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("featurize is deterministic and batch-shape independent") {
    val media = spark.createDataset(Seq(
      MediaRow(1L, "image/png", 4, 4, Array[Byte](1, 2, 3, 4)),
      MediaRow(2L, "audio/wav", 0, 0, Array[Byte](9, 8, 7))))
    val a = Multimodal.featurize(media, batchSize = 1)
      .collect().map(f => (f.media_id, f.checksum)).toMap
    val b = Multimodal.featurize(media, batchSize = 64)
      .collect().map(f => (f.media_id, f.checksum)).toMap
    assert(a == b)
    assert(a(1L) != a(2L))
  }

  test("feature schema carries typed metadata through") {
    val media = spark.createDataset(Seq(
      MediaRow(1L, "image/png", 4, 4, Array[Byte](1, 2, 3, 4))))
    val f = Multimodal.featurize(media).collect()(0)
    assert(f.mime == "image/png" && f.n_bytes == 4L && f.features.length == 8)
  }

  test("PpmDecoder: generated asset decodes to asserted dimensions and pixel stats") {
    // 2x1 gradient: pixels (r,g,b) = (0,0,seed) and (255,0,seed+1)
    val bytes = Multimodal.generatePpm(2, 1, seed = 10L)
    val f = Multimodal.PpmDecoder.decode(
      MediaRow(7L, "image/x-portable-pixmap", 2, 1, bytes))
    val Array(w, h, meanR, meanG, meanB, lumMin, lumMean, lumMax) = f.features
    assert((w, h) == (2.0, 1.0))
    assert(meanR == 127.5 && meanG == 0.0 && meanB == 10.5)
    assert(lumMin < lumMean && lumMean < lumMax)
    assert(f.mime == "image/x-portable-pixmap" && f.n_bytes == bytes.length.toLong)
    // deterministic across invocations
    assert(Multimodal.PpmDecoder.decode(
      MediaRow(7L, "x", 2, 1, Multimodal.generatePpm(2, 1, 10L))).checksum == f.checksum)
  }

  test("PpmDecoder: header comments parse; malformed payloads fail fast") {
    val pixels = Array[Byte](10, 20, 30)
    val withComment = ("P6\n# a comment\n 1 1\n# another\n255\n"
      .getBytes("US-ASCII") ++ pixels)
    val f = Multimodal.PpmDecoder.decode(MediaRow(1L, "x", 1, 1, withComment))
    assert(f.features.take(5).toSeq == Seq(1.0, 1.0, 10.0, 20.0, 30.0))
    intercept[IllegalArgumentException] {   // truncated pixel data
      Multimodal.PpmDecoder.decode(MediaRow(1L, "x", 2, 2,
        "P6\n2 2\n255\n".getBytes("US-ASCII") ++ pixels))
    }
    intercept[IllegalArgumentException] {   // not ppm at all
      Multimodal.PpmDecoder.decode(MediaRow(1L, "x", 1, 1, Array[Byte](1, 2, 3)))
    }
    intercept[IllegalArgumentException] {   // hostile geometry: 3*w*h would
      // wrap Int — must fail fast, not silently emit garbage features
      Multimodal.PpmDecoder.decode(MediaRow(1L, "x", 0, 0,
        "P6\n100000 100000\n255\n".getBytes("US-ASCII") ++ pixels))
    }
  }

  test("ppm decode runs distributed over generated assets with per-id geometry") {
    val feats = Multimodal.featurize(
      Multimodal.ppmFromDocuments(spark, "/root/testdata/sf0.001"),
      Multimodal.PpmDecoder)
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features(0) == (8 + f.media_id % 8).toDouble)
      assert(f.features(1) == (8 + f.media_id % 5).toDouble)
    }
  }

  test("resizePpm: geometry transforms, pixels sampled nearest-neighbor") {
    val src = Multimodal.generatePpm(16, 10, seed = 3L)
    val small = Multimodal.resizePpm(src, 8, 5)
    val f = Multimodal.PpmDecoder.decode(MediaRow(1L, "x", 8, 5, small))
    assert(f.features(0) == 8.0 && f.features(1) == 5.0)
    // exact 2× downscale keeps corner pixel (0,0) identical
    val (_, _, _, srcOff) = Multimodal.PpmDecoder.parseHeader(src)
    val (_, _, _, outOff) = Multimodal.PpmDecoder.parseHeader(small)
    assert(src.slice(srcOff, srcOff + 3).toSeq == small.slice(outOff, outOff + 3).toSeq)
    // same-size resize is pixel-identical
    val same = Multimodal.resizePpm(src, 16, 10)
    val (_, _, _, sameOff) = Multimodal.PpmDecoder.parseHeader(same)
    assert(same.drop(sameOff).toSeq == src.drop(srcOff).toSeq)
    // distributed form updates metadata and payload together
    val resized = Multimodal.resize(
      spark.createDataset(Seq(MediaRow(9L, "x", 16, 10, src))), 4, 4).collect()(0)
    assert(resized.width == 4 && resized.height == 4)
    assert(Multimodal.PpmDecoder.decode(resized).features(0) == 4.0)
  }

  test("frame sampling walks self-describing frame boundaries") {
    val frames = (0 until 5).map(i => Multimodal.generatePpm(4, 3, seed = i.toLong))
    val video = frames.flatten.toArray
    assert(Multimodal.splitFrames(video).map(_.toSeq) == frames.map(_.toSeq))
    val sampled = Multimodal.sampleFrames(
      spark.createDataset(Seq(MediaRow(1L, "video/x-ppm-stream", 4, 3, video))),
      every = 2).collect()(0)
    val kept = Multimodal.splitFrames(sampled.payload)
    assert(kept.map(_.toSeq) == Seq(frames(0), frames(2), frames(4)).map(_.toSeq))
  }

  test("binaryFile source ingests opaque assets with glob filtering") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.bin"), Array[Byte](9, 8))
    java.nio.file.Files.write(dir.resolve("skip.txt"), Array[Byte](0))
    val got = Multimodal.readBinaryFiles(spark, dir.toString, "*.bin")
      .selectExpr("path", "length", "content")
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq == Seq(("a.bin", 3L), ("b.bin", 2L)))
    assert(got(0)._3 == Seq[Byte](1, 2, 3))
  }

  test("WavDecoder: generated sine decodes to declared format and physical levels") {
    val rate = 8000
    val nFrames = 800
    val freq = 400.0
    val wav = Multimodal.generateWav(rate, nFrames, freq, amplitude = 0.5)
    val f = Multimodal.WavDecoder.decode(MediaRow(3L, "audio/x-wav", nFrames, 1, wav))
    val Array(ch, sr, frames, dur, rms, peak, zcr) = f.features
    assert(ch == 1.0 && sr == rate.toDouble && frames == nFrames.toDouble)
    assert(math.abs(dur - nFrames.toDouble / rate) < 1e-9)
    // dual-tone at amplitudes (0.4, 0.1): rms = 0.5*sqrt(0.4^2+0.1^2)... for
    // uncorrelated sines rms^2 = (0.4^2 + 0.1^2)/2; allow generous tolerance
    val expectedRms = math.sqrt((0.4 * 0.4 + 0.1 * 0.1) / 2)
    assert(math.abs(rms - expectedRms) < 0.02, s"rms $rms vs $expectedRms")
    assert(peak <= 0.5 && peak > 0.3)
    // a 400 Hz tone crosses zero ~2*400 times/sec → zcr ≈ 2*freq/rate
    assert(math.abs(zcr - 2 * freq / rate) < 0.02, s"zcr $zcr")
  }

  test("WavDecoder: chunk walking skips unknown chunks; hostile sizes fail fast") {
    val wav = Multimodal.generateWav(8000, 16, 440.0)
    // splice an unknown odd-sized chunk between WAVE tag and fmt
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = wav.take(12) ++ junk ++ wav.drop(12)
    // fix RIFF size field (not validated against total, but keep honest)
    val f = Multimodal.WavDecoder.decode(MediaRow(1L, "x", 16, 1, spliced))
    assert(f.features(2) == 16.0)
    // declared chunk size past payload end must throw, not overrun
    val evil = wav.clone()
    evil(40) = -1; evil(41) = -1; evil(42) = -1; evil(43) = 0x7f // data size
    intercept[IllegalArgumentException] {
      Multimodal.WavDecoder.decode(MediaRow(1L, "x", 16, 1, evil))
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavDecoder.decode(MediaRow(1L, "x", 0, 0,
        "RIFXnope".getBytes("US-ASCII")))
    }
  }

  test("wav decode runs distributed with per-id pitch/length") {
    val media = Multimodal.wavFromDocuments(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.featurize(media, Multimodal.WavDecoder)
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val frames = 400 + (f.media_id % 17) * 40
      assert(f.features(2) == frames.toDouble, s"media ${f.media_id}")
      assert(f.features(4) > 0.1) // audible signal, not silence
    }
  }

  test("perceptual hash is invariant under resize and header re-encode") {
    import graft.functions.ImageAverageHash
    val base = Multimodal.generateBlockPpm(16, 16, seed = 42L)
    val h0 = ImageAverageHash.compute(base)
    // nearest-neighbor resize to other 8-divisible geometries: bit-exact
    for ((w, h) <- Seq((24, 24), (32, 32), (8, 8), (40, 24)))
      assert(ImageAverageHash.compute(Multimodal.resizePpm(base, w, h)) == h0,
        s"hash moved at ${w}x$h")
    // byte-level re-encode: inject a header comment — different bytes,
    // identical pixels, identical hash
    val (wd, ht, _, off) = Multimodal.PpmDecoder.parseHeader(base)
    val reenc = (s"P6\n# re-encoded copy\n$wd $ht\n255\n".getBytes("US-ASCII")
      ++ base.drop(off))
    assert(!java.util.Arrays.equals(reenc, base))
    assert(ImageAverageHash.compute(reenc) == h0)
    // distinct seeds are far apart — chunk bucketing can't false-pair them
    val other = ImageAverageHash.compute(Multimodal.generateBlockPpm(16, 16, 43L))
    assert(java.lang.Long.bitCount(h0 ^ other) > 3)
  }

  test("expression parity: DataFrame path equals the direct kernel") {
    val rows = (0L until 16L)
      .map(i => (i, Multimodal.generateBlockPpm(16, 16, i)))
    val viaExpr = rows.toDF("media_id", "payload")
      .select(col("media_id"),
        graft.functions.ImageAverageHash.imageAvgHash(col("payload")).as("h"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, payload) =>
      assert(viaExpr(id) == graft.functions.ImageAverageHash.compute(payload))
    }
  }


  test("ImageIoDecoder: PNG round trip reproduces the PPM twin exactly") {
    // same pixels, two routes: raw P6 parse vs JDK PNG encode->decode.
    // Every feature INCLUDING the pixel-rolling checksum must agree -
    // the compression round trip is lossless or this fails.
    Seq(5L, 12L, 999L).foreach { id =>
      val ppm = Multimodal.generatePpm(13, 9, id)
      val png = Multimodal.encodePng(ppm)
      assert(png.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47),
        "payload must be a real PNG (magic bytes)")
      val viaPpm = Multimodal.PpmDecoder.decode(
        Multimodal.MediaRow(id, "image/x-portable-pixmap", 13, 9, ppm))
      val viaPng = Multimodal.ImageIoDecoder.decode(
        Multimodal.MediaRow(id, "image/png", 13, 9, png))
      assert(viaPng.checksum == viaPpm.checksum, "pixel checksum")
      assert(viaPng.features.toSeq == viaPpm.features.toSeq,
        s"features: ${viaPng.features.toSeq} vs ${viaPpm.features.toSeq}")
    }
  }

  test("ImageIoDecoder: BMP decodes through the same seam") {
    val ppm = Multimodal.generatePpm(8, 8, 3L)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodePng(ppm)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val viaBmp = Multimodal.ImageIoDecoder.decode(
      Multimodal.MediaRow(3L, "image/bmp", 8, 8, bos.toByteArray))
    val viaPpm = Multimodal.PpmDecoder.decode(
      Multimodal.MediaRow(3L, "image/x-portable-pixmap", 8, 8, ppm))
    assert(viaBmp.features.toSeq == viaPpm.features.toSeq)
  }

  test("resizeImageIo matches resizePpm pixel-for-pixel") {
    val ppm = Multimodal.generateBlockPpm(16, 16, 7L)
    val viaIo = Multimodal.ImageIoDecoder.decode(Multimodal.MediaRow(
      7L, "image/png", 24, 24,
      Multimodal.resizeImageIo(Multimodal.encodePng(ppm), 24, 24)))
    val viaPpm = Multimodal.PpmDecoder.decode(Multimodal.MediaRow(
      7L, "image/x-portable-pixmap", 24, 24,
      Multimodal.resizePpm(ppm, 24, 24)))
    assert(viaIo.checksum == viaPpm.checksum)
    assert(viaIo.features.toSeq == viaPpm.features.toSeq)
  }

  test("png decode runs distributed over generated assets") {
    val feats = Multimodal.featurize(
      Multimodal.pngFromDocuments(spark, "/root/testdata/sf0.001"),
      Multimodal.ImageIoDecoder).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val (w, h) = (8 + (f.media_id % 8).toInt, 8 + (f.media_id % 5).toInt)
      assert(f.features(0) == w.toDouble && f.features(1) == h.toDouble,
        s"asset ${f.media_id}: geometry ${f.features.toSeq}")
    }
  }

  test("imageNearDups pairs each asset with exactly its resized copy") {
    val base = spark.range(0, 40).as[Long]
      .map(id => MediaRow(id, "image/x-portable-pixmap", 16, 16,
        Multimodal.generateBlockPpm(16, 16, id)))
    val copies = Multimodal.resize(base, 24, 24)
      .map(r => r.copy(media_id = r.media_id + 1000L))
    val pairs = Multimodal.imageNearDups(base.unionByName(copies))
      .as[(Long, Long, Int)].collect()
    assert(pairs.length == 40, s"got ${pairs.length} pairs")
    pairs.foreach { case (a, b, ham) =>
      assert(b == a + 1000L, s"unexpected pair ($a, $b)")
      assert(ham == 0)
    }
  }
}
