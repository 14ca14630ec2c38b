package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.queries.BinaryQueries

/** Multimodal pixel tier: REAL ImageIO decode and Java2D resize
  * through the batch plumbing — pixel-verified against planted
  * colors, plus the schema/batch/undecodable-drop contract a codec
  * swap would inherit. */
class MultimodalSpec extends SparkSpec {

  private def writeUniform(dir: String, k: Int): Unit = {
    val (r, g, b) = BinaryQueries.uniColor(k)
    val (w, h) = BinaryQueries.uniDims(k)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, BinaryQueries.uniName(k)),
      BinaryQueries.uniformPng(r, g, b, w, h))
  }

  private def expectedLuma(k: Int): Double = {
    val (r, g, b) = BinaryQueries.uniColor(k)
    (299L * r + 587L * g + 114L * b) / 1000.0
  }

  test("windowEnergies: analytic PCM16 means, silence lattice exact") {
    import org.apache.spark.sql.functions._
    val s = spark; import s.implicits._
    // hand-built clip: 100 samples = 2 windows of 50; window 0 all
    // zero (silent), window 1 constant amplitude 300 and -300
    // alternating -> mean |sample| = 300 exactly
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit =
      out.write(Array(v.toByte, (v >> 8).toByte), 0, 2)
    def le32(v: Int): Unit =
      out.write(Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte), 0, 4)
    out.write("RIFF".getBytes("US-ASCII"), 0, 4); le32(36 + 200)
    out.write("WAVEfmt ".getBytes("US-ASCII"), 0, 8)
    le32(16); le16(1); le16(1); le32(8000); le32(16000); le16(2)
    le16(16)
    out.write("data".getBytes("US-ASCII"), 0, 4); le32(200)
    (0 until 100).foreach { i =>
      val v = if (i < 50) 0 else if (i % 2 == 0) 300 else -300
      le16(v & 0xFFFF)
    }
    val df = Seq(Tuple1(out.toByteArray)).toDF("content")
    val we = df.select(graft.ops.Multimodal
      .windowEnergies(col("content"), 50).as("we"))
      .as[Seq[Long]].head()
    assert(we == Seq(0L, 300L))
    // ragged tail dropped: 120 samples at window 50 -> still 2 windows
    val longer = out.toByteArray ++ Array.fill(40)(0.toByte)
    val we2 = Seq(Tuple1(longer)).toDF("content")
      .select(graft.ops.Multimodal
        .windowEnergies(col("content"), 50).as("we"))
      .as[Seq[Long]].head()
    assert(we2.length == 2)
  }

  test("batch decode: real pixels, exact analytic luma; bad files drop") {
    val dir = graft.TempRoots.create("graft_mm")
    (0 until 10).foreach(writeUniform(dir, _))
    // plant one undecodable file among the PNGs
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "broken.png"),
      "not a png at all".getBytes("UTF-8"))
    val images = Multimodal.readBinaryDir(spark, dir, "*.png")
    val decoded = Multimodal.decodeDataset(images, batchSize = 7)
    val rows = decoded.collect().map(m => m.file_name -> m).toMap
    assert(rows.size == 10, "broken file must drop")
    assert(!rows.contains("broken.png"))
    (0 until 10).foreach { k =>
      val m = rows(BinaryQueries.uniName(k))
      val (w, h) = BinaryQueries.uniDims(k)
      assert(m.width == w && m.height == h)
      assert(m.mean_luma == expectedLuma(k), // bit-exact, not approx
        s"${m.file_name}: ${m.mean_luma} != ${expectedLuma(k)}")
    }
    // the header-only Column tier agrees with the pixel decoder on dims
    val viaExpr = images
      .select(col("file_name"),
        Multimodal.pngHeaderStruct(col("content")).as("d"))
      .filter(col("d").isNotNull)
      .select(col("file_name"), col("d.width"), col("d.height"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaBatch = decoded.collect()
      .map(m => (m.file_name, m.width, m.height)).toSet
    assert(viaExpr == viaBatch)
  }

  test("decode averages true pixel values, not just headers") {
    // 2x1 black|white: mean luma must be exactly 127.5 — a header fake
    // or off-by-one pixel walk cannot produce it
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val res = Multimodal.decodeBatch(Seq(out.toByteArray), batchSize = 1)
    assert(res == Seq(Some((2L, 1L, 127.5))))
  }

  test("resize resamples real pixels; round-trip keeps uniform color") {
    val dir = graft.TempRoots.create("graft_mm_rs")
    (0 until 5).foreach(writeUniform(dir, _))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "broken.png"), Array[Byte](1, 2, 3))
    val images = Multimodal.readBinaryDir(spark, dir, "*.png")
    val resized = Multimodal.resizeDataset(images, 224L, 224L, batchSize = 3)
    val bytes = resized.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(bytes.size == 5, "broken file must drop at resize")
    // pixel-level check OUTSIDE the engine: every output pixel is the
    // planted color (bilinear over a uniform field is exact)
    (0 until 5).foreach { k =>
      val (r, g, b) = BinaryQueries.uniColor(k)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes(BinaryQueries.uniName(k))))
      assert(img.getWidth == 224 && img.getHeight == 224)
      val px = img.getRGB(0, 0, 224, 224, null, 0, 224)
      val want = 0xFF000000 | (r << 16) | (g << 8) | b
      assert(px.forall(_ == want), s"k=$k resample changed pixels")
    }
    // re-decoding the resized output through the SAME pipeline reads
    // the new dims and the preserved color
    val redecoded = Multimodal.decodeDataset(resized, batchSize = 3).collect()
    assert(redecoded.length == 5)
    redecoded.foreach { m =>
      val k = m.file_name.slice(4, 7).toInt
      assert(m.width == 224L && m.height == 224L)
      assert(m.mean_luma == expectedLuma(k))
    }
  }

  test("frame sampling: even stride, bounded count, zero-frame safety") {
    val s = spark; import s.implicits._
    val clips = Seq(("a", 100L), ("b", 7L), ("c", 0L), ("d", 1000L))
      .toDF("clip_id", "n_frames")
    val sampled = clips.select(col("clip_id"),
      Multimodal.sampleFrameIdx(col("n_frames"), maxFrames = 8).as("frame_idx"))
    val byClip = sampled.collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).toSeq.sorted).toMap
    assert(!byClip.contains("c"), "0-frame clip must emit no rows")
    assert(byClip("b") == (0L until 7L), "short clips keep every frame")
    Seq("a", "d").foreach { c =>
      val idx = byClip(c)
      assert(idx.size <= 8, s"$c sampled ${idx.size} frames")
      assert(idx.head == 0L)
      val strides = idx.sliding(2).map(p => p(1) - p(0)).toSeq.distinct
      assert(strides.size == 1, s"$c stride uneven: $strides")
    }
  }

  test("decoder contract rejects oversized batches") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeBatch(Seq.fill(9)(Array[Byte](1)), batchSize = 8)
    }
    assert(e.getMessage.contains("at most 8"))
  }

  test("invalid resize targets fail loudly instead of quarantining everything") {
    // a valid PNG: if the bad target leaked into the per-image try it
    // would come back None (silently "undecodable")
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    for ((w, h) <- Seq((0L, 10L), (10L, -1L), (Int.MaxValue + 1L, 10L))) {
      val e = intercept[IllegalArgumentException] {
        Multimodal.resizeBatch(Seq(out.toByteArray), w, h, batchSize = 1)
      }
      assert(e.getMessage.contains("resize target"))
    }
    // and at plan time, before any job runs
    intercept[IllegalArgumentException] {
      Multimodal.resizeDataset(
        spark.emptyDataFrame
          .selectExpr("'' as file_name", "cast(null as binary) as content"),
        0L, 10L)
    }
  }

  test("JPEG segment walk: dims + progressive flag through a variable " +
    "prefix; bad magic, SOS-before-SOF and walk-bound all quarantine") {
    val s = spark; import s.implicits._
    import graft.queries.BinaryQueries
    // k=2 → two COM segments before SOF0; k=1 → one COM, SOF2
    val badMagic = BinaryQueries.jpegBytes(0).clone()
    badMagic(0) = 'X'.toByte
    // a JPEG whose SOF sits past the walk bound: 20 COM segments
    val deep = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0xFF, 0xD8).map(_.toByte), 0, 2)
      (0 until 20).foreach { _ =>
        out.write(Array(0xFF, 0xFE, 0, 4, 0, 0).map(_.toByte), 0, 6)
      }
      out.write(Array(0xFF, 0xC0, 0, 8, 8, 0, 48, 0, 64, 0)
        .map(_.toByte), 0, 10)
      out.toByteArray
    }
    val df = Seq(
      ("base", BinaryQueries.jpegBytes(2)),
      ("prog", BinaryQueries.jpegBytes(1)),
      ("bad", badMagic), ("deep", deep)).toDF("name", "content")
    val rows = df
      .withColumn("m", Multimodal.jpegSofStruct(col("content")))
      .filter(col("m").isNotNull)
      .select(col("name"), col("m.width"), col("m.height"),
        col("m.progressive"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows.keySet == Set("base", "prog"),
      s"quarantine failed: ${rows.keySet}")
    val (w2, h2) = BinaryQueries.jpegDims(2)
    val (w1, h1) = BinaryQueries.jpegDims(1)
    assert(rows("base") == ((w2.toLong, h2.toLong, false)), rows("base"))
    assert(rows("prog") == ((w1.toLong, h1.toLong, true)), rows("prog"))
    // the same deep file IS parseable with a wider bound — proves the
    // quarantine above was the bound, not a parse failure
    val wide = df.filter(col("name") === "deep")
      .select(Multimodal.jpegSofStruct(col("content"), maxSegs = 32))
      .collect().head
    assert(!wide.isNullAt(0), "deep file must parse at maxSegs=32")
  }

  test("aHash: hand-checked half-split hash; robust to a single-pixel " +
    "edit; corrupt bytes quarantine") {
    def img(w: Int, h: Int)(color: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, color(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", out)
      out.toByteArray
    }
    // left half black, right half white: bits set exactly on cells
    // with cx >= 4 (strictly-above-mean contract)
    val split = img(16, 16)((x, _) => if (x < 8) 0x000000 else 0xFFFFFF)
    val rightMask = (for (r <- 0 until 8; c <- 4 until 8)
      yield 1L << (8 * r + c)).reduce(_ | _)
    // same image with ONE bright pixel flipped dark: cell means move
    // by 1/32, nowhere near the half-range margin — hash unchanged
    val edited = img(16, 16)((x, y) =>
      if (x == 12 && y == 3) 0x000000
      else if (x < 8) 0x000000 else 0xFFFFFF)
    val out = graft.ops.Multimodal.aHashBatch(
      Seq(split, edited, "garbage".getBytes("UTF-8")), batchSize = 8)
    assert(out(0).contains((rightMask, 32)), s"split: ${out(0)}")
    assert(out(1).map(_._1) == Some(rightMask),
      "single-pixel edit must not move the hash")
    assert(out(2).isEmpty, "corrupt bytes must quarantine")
  }

  test("WAV header parse: little-endian fields exact, corrupt magic " +
    "gated out") {
    val s = spark; import s.implicits._
    val good = graft.queries.BinaryQueries.wavBytes(5) // ch=2 r=44100 b=16
    val bad = good.clone(); bad(0) = 'X'.toByte
    val df = Seq(("good", good), ("bad", bad)).toDF("name", "content")
    val rows = df.filter(Multimodal.isWav(col("content")))
      .select(col("name"),
        Multimodal.wavChannels(col("content")),
        Multimodal.wavSampleRate(col("content")),
        Multimodal.wavBitsPerSample(col("content")),
        Multimodal.wavDataBytes(col("content")),
        Multimodal.wavDurationMs(col("content")))
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("good"),
      "corrupt RIFF magic must be gated out")
    val r = rows.head
    val nSamples = 100 + 17 * 5
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 44100L, 16L)))
    assert(r.getLong(4) == nSamples * 4L, "data bytes (LE32) wrong")
    assert(r.getLong(5) == nSamples * 4L * 1000L / (44100L * 4L),
      "integer duration_ms wrong")
  }

  test("MP4 box walk: v0/v1 mvhd through shifted moov; corrupt, " +
    "moov-less, and extended-size files quarantine") {
    val s = spark; import s.implicits._
    import graft.queries.BinaryQueries
    // k=2: v0 mvhd behind an 8-byte free pad; k=3: v1 with the 2^33
    // duration high word
    val v0 = BinaryQueries.mp4Bytes(2)
    val v1 = BinaryQueries.mp4Bytes(3)
    val corrupt = BinaryQueries.mp4Bytes(2).clone()
    corrupt(4) = 'X'.toByte
    val nomoov = BinaryQueries.mp4Bytes(2).take(28)
    // extended-size (size==1) top-level box: must die, not misparse
    val ext = BinaryQueries.mp4Bytes(2).clone()
    ext(20) = 0; ext(21) = 0; ext(22) = 0; ext(23) = 1
    val df = Seq(("v0", v0), ("v1", v1), ("corrupt", corrupt),
      ("nomoov", nomoov), ("ext", ext)).toDF("name", "content")
    val rows = df
      .select(col("name"),
        Multimodal.mp4MvhdStruct(col("content")).as("m"))
      .collect().map(r => r.getString(0) -> Option(r.getStruct(1))).toMap
    // the staged (projection-boundary) form must agree exactly with
    // the composed Column form
    val staged = Multimodal.withMp4Mvhd(df, "content", "m")
      .select(col("name"), col("m"))
      .collect().map(r => r.getString(0) -> Option(r.getStruct(1))).toMap
    assert(staged.view.mapValues(_.map(_.toString)).toMap ==
      rows.view.mapValues(_.map(_.toString)).toMap)
    assert(rows("corrupt").isEmpty && rows("nomoov").isEmpty &&
      rows("ext").isEmpty)
    val m0 = rows("v0").get
    assert(m0.getLong(0) == 0L)
    assert(m0.getLong(1) == 600L * 3)          // timescale, k=2
    assert(m0.getLong(2) == 3600L * 3 + 26L)   // duration
    assert(m0.getLong(3) == (3600L * 3 + 26L) * 1000L / 1800L)
    val m1 = rows("v1").get
    assert(m1.getLong(0) == 1L)
    assert(m1.getLong(2) == 3600L * 4 + 39L + BinaryQueries.V1DurationHigh,
      "BE64 duration high word lost")
  }
}
