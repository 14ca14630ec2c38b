package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Ledger, Multimodal}

/** Binary / multimodal queries over a real binaryFile source, plus the
  * processed-file MD5 ledger — SURVEY.md §2.9 ST2, §2.1 S10, and the
  * multimodal-plumbing extension.
  *
  * The fixture is a deterministic set of structurally-valid PNG files
  * (true 8-byte signature + IHDR with encoded width/height) written
  * driver-side — fixture scaffolding only; every engine-path byte
  * (scan, checksum, header parse, frame explode) runs distributed on
  * the binaryFile source. The DuckDB oracle reads the SAME files with
  * read_blob and parses the same header offsets.
  */
object BinaryQueries extends QueryPack {

  val NumFiles = 30
  val ImagesDir = "/tmp/graft_fixtures/binmm/images"

  /** Structurally-valid minimal PNG: signature, IHDR(width,height),
    * deterministic pseudo-CRC, k-dependent payload so sizes differ. */
  def pngBytes(k: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit =
      out.write(Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte), 0, 4)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), 0, 8)
    be32(13L)                                   // IHDR length
    out.write("IHDR".getBytes("US-ASCII"), 0, 4)
    be32(100L + 7L * k)                         // width
    be32(50L + 13L * k)                         // height
    out.write(Array(8, 6, 0, 0, 0).map(_.toByte), 0, 5)
    be32(k.toLong * 2654435761L % 0xFFFFFFFFL)  // pseudo-CRC
    val payload = Array.fill(k * 11 + 5)((k % 251).toByte)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  def fileName(k: Int): String = f"img_$k%03d.png"

  /** Idempotent fixture write (plain java.nio — no Spark job for 30
    * small files; the engine path STARTS at the binaryFile scan). */
  def writeFixture(): String = {
    val dir = java.nio.file.Paths.get(ImagesDir)
    java.nio.file.Files.createDirectories(dir)
    (0 until NumFiles).foreach { k =>
      java.nio.file.Files.write(dir.resolve(fileName(k)), pngBytes(k))
    }
    dir.toString
  }

  // ---------------------------------------------------------------
  // Uniform-color REAL PNGs: the pixel-decode fixture. Each file's
  // name encodes its planted color and dimensions, so a SQL oracle
  // can predict the decoder's output analytically — (299r+587g+114b)
  // /1000.0 is bit-exact for a uniform image (see Multimodal.lumaMilli).
  // ---------------------------------------------------------------

  val UniformDir = "/tmp/graft_fixtures/binmm/uniform"
  val NumUniform = 24

  def uniColor(k: Int): (Int, Int, Int) =
    ((k * 37 + 11) % 256, (k * 59 + 5) % 256, (k * 83 + 7) % 256)
  def uniDims(k: Int): (Int, Int) = (16 + (k % 5) * 8, 12 + (k % 7) * 6)
  def uniName(k: Int): String = {
    val (r, g, b) = uniColor(k); val (w, h) = uniDims(k)
    f"uni_$k%03d_${r}_${g}_${b}_${w}x$h.png"
  }

  /** Uniform-color RGB PNG, ImageIO-encoded (lossless, so the decoder
    * reads back exactly the planted color). Fixture scaffolding. */
  def uniformPng(r: Int, g: Int, b: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, Array.fill(w * h)((r << 16) | (g << 8) | b), 0, w)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Idempotent uniform-PNG fixture + one planted non-image (the
    * Spark glob picks it up; the decoder must quarantine-drop it; the
    * oracle's `uni_*` glob never sees it). */
  def writeUniformFixture(): String = {
    val dir = java.nio.file.Paths.get(UniformDir)
    java.nio.file.Files.createDirectories(dir)
    (0 until NumUniform).foreach { k =>
      val p = dir.resolve(uniName(k))
      if (!java.nio.file.Files.exists(p)) {
        val (r, g, b) = uniColor(k); val (w, h) = uniDims(k)
        java.nio.file.Files.write(p, uniformPng(r, g, b, w, h))
      }
    }
    java.nio.file.Files.write(dir.resolve("broken.png"),
      "not an image".getBytes("UTF-8"))
    dir.toString
  }

  private def lumaSql(group: Int): String =
    s"CAST(regexp_extract(file_name, 'uni_\\d+_(\\d+)_(\\d+)_(\\d+)_', $group) AS BIGINT)"

  /** REAL pixel decode (JDK ImageIO), oracle-checked: binaryFile scan
    * → batched ImageIO decode on executors → (dims, true mean Rec.601
    * luminance). The oracle never decodes — it derives the expected
    * output from the colors/dims planted in the filenames, which only
    * match if the decoder read the actual pixels correctly. The
    * planted broken.png must be quarantine-dropped, never error. */
  val imageDecode = GQuery(
    "q_image_decode",
    (s, d) => {
      val dir = writeUniformFixture()
      Multimodal.decodeDataset(
        Multimodal.readBinaryDir(s, dir, "*.png"), batchSize = 8)
        .toDF()
        .select("file_name", "width", "height", "mean_luma")
        .orderBy("file_name")
    },
    Some(s"""
      WITH f AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name
        FROM read_blob('$UniformDir/uni_*.png'))
      SELECT file_name,
             CAST(regexp_extract(file_name, '_(\\d+)x(\\d+)\\.png', 1) AS BIGINT) AS width,
             CAST(regexp_extract(file_name, '_(\\d+)x(\\d+)\\.png', 2) AS BIGINT) AS height,
             (299 * ${lumaSql(1)} + 587 * ${lumaSql(2)} + 114 * ${lumaSql(3)}) / 1000.0
               AS mean_luma
      FROM f ORDER BY file_name
    """),
    prepare = Some((_, _) => { writeUniformFixture(); () }))

  /** REAL resample (Java2D bilinear) + lossless PNG re-encode, then
    * decoded back THROUGH THE ENGINE: output dims must be the resize
    * target and — uniform color being resample-invariant — mean luma
    * must still match the planted color exactly. */
  val imageResize = GQuery(
    "q_image_resize",
    (s, d) => {
      val dir = writeUniformFixture()
      val resized = Multimodal.resizeDataset(
        Multimodal.readBinaryDir(s, dir, "*.png"), 32L, 24L, batchSize = 8)
      Multimodal.decodeDataset(resized, batchSize = 8)
        .toDF()
        .select("file_name", "width", "height", "mean_luma")
        .orderBy("file_name")
    },
    Some(s"""
      WITH f AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name
        FROM read_blob('$UniformDir/uni_*.png'))
      SELECT file_name,
             CAST(32 AS BIGINT) AS width,
             CAST(24 AS BIGINT) AS height,
             (299 * ${lumaSql(1)} + 587 * ${lumaSql(2)} + 114 * ${lumaSql(3)}) / 1000.0
               AS mean_luma
      FROM f ORDER BY file_name
    """),
    prepare = Some((_, _) => { writeUniformFixture(); () }))

  /** Real multimodal metadata: binaryFile scan → PNG header parse
    * (width/height from IHDR bytes) → frame-sampling explode (one row
    * per sampled frame with its byte offset) — the header-only Column
    * tier of the media pipeline ([[Multimodal.pngHeaderStruct]]); the
    * pixel tier is `q_image_decode`/`q_image_resize`. */
  val binaryMeta = GQuery(
    "q_binary_meta",
    (s, d) => {
      val dir = writeFixture()
      Multimodal.readBinaryDir(s, dir, "*.png")
        .select(col("file_name"), col("size_bytes"),
          Multimodal.pngWidth(col("content")).as("img_width"),
          Multimodal.pngHeight(col("content")).as("img_height"))
        .withColumn("n_frames", pmod(col("img_width"), lit(4L)) + 1L)
        .withColumn("frame_idx",
          explode(sequence(lit(0L), col("n_frames") - 1L)))
        .withColumn("frame_offset",
          expr("frame_idx * (size_bytes DIV n_frames)"))
        .orderBy("file_name", "frame_idx")
    },
    Some(s"""
      WITH img AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
               size AS size_bytes,
               ${Multimodal.beUint32Sql("content", 17)} AS img_width,
               ${Multimodal.beUint32Sql("content", 21)} AS img_height
        FROM read_blob('$ImagesDir/*.png')),
      meta AS (SELECT *, img_width % 4 + 1 AS n_frames FROM img)
      SELECT file_name, size_bytes, img_width, img_height, n_frames,
             unnest(generate_series(0, n_frames - 1)) AS frame_idx,
             unnest(generate_series(0, n_frames - 1)) * (size_bytes // n_frames)
               AS frame_offset
      FROM meta ORDER BY file_name, frame_idx
    """))

  // ---------------------------------------------------------------
  // WAV fixture: canonical 44-byte PCM headers with k-dependent
  // channels/rate/bits/payload, plus one corrupt file (bad RIFF
  // magic) that the isWav gate must quarantine — the audio twin of
  // the PNG fixture; header-only metadata, no sample decode.
  // ---------------------------------------------------------------

  val NumWavs = 24
  val AudioDir = "/tmp/graft_fixtures/binmm/audio"

  def wavBytes(k: Int): Array[Byte] = {
    val channels = 1 + (k % 2)
    val rate = Seq(8000, 16000, 44100)(k % 3)
    val bits = Seq(8, 16)(k % 2)
    val nSamples = 100 + 17 * k
    val blockAlign = channels * bits / 8
    val dataBytes = nSamples * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit =
      out.write(Array(v.toByte, (v >> 8).toByte), 0, 2)
    def le32(v: Int): Unit =
      out.write(Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte), 0, 4)
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    le32(36 + dataBytes)
    out.write("WAVEfmt ".getBytes("US-ASCII"), 0, 8)
    le32(16); le16(1)                    // PCM fmt chunk
    le16(channels); le32(rate)
    le32(rate * blockAlign)              // byte rate
    le16(blockAlign); le16(bits)
    out.write("data".getBytes("US-ASCII"), 0, 4)
    le32(dataBytes)
    out.write(Array.fill(dataBytes)((k % 113).toByte), 0, dataBytes)
    out.toByteArray
  }

  def wavName(k: Int): String = f"clip_$k%03d.wav"

  def writeWavFixture(): String = {
    val dir = java.nio.file.Paths.get(AudioDir)
    java.nio.file.Files.createDirectories(dir)
    (0 until NumWavs).foreach { k =>
      java.nio.file.Files.write(dir.resolve(wavName(k)), wavBytes(k))
    }
    val corrupt = wavBytes(0); corrupt(0) = 'X'.toByte
    java.nio.file.Files.write(dir.resolve("corrupt.wav"), corrupt)
    dir.toString
  }

  val PcmDir = "/tmp/graft_fixtures/binmm/pcm"
  val NumPcm = 12

  /** PCM16LE mono clips with a deterministic silence lattice: window
    * w (50 samples) is all-zero when w % 3 == 0, otherwise a
    * sawtooth in [-1000, 1000) keyed by (k, i) — so silent/loud
    * windows alternate predictably and every energy is an exact
    * integer both engines recompute. */
  def pcmBytes(k: Int): Array[Byte] = {
    val nSamples = 400 + 40 * k
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit =
      out.write(Array(v.toByte, (v >> 8).toByte), 0, 2)
    def le32(v: Int): Unit =
      out.write(Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte), 0, 4)
    val dataBytes = 2 * nSamples
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    le32(36 + dataBytes)
    out.write("WAVEfmt ".getBytes("US-ASCII"), 0, 8)
    le32(16); le16(1)
    le16(1); le32(8000)
    le32(8000 * 2)
    le16(2); le16(16)
    out.write("data".getBytes("US-ASCII"), 0, 4)
    le32(dataBytes)
    (0 until nSamples).foreach { i =>
      val v = if ((i / 50) % 3 == 0) 0
      else ((i * (k + 3)) % 2000) - 1000
      le16(v & 0xFFFF)
    }
    out.toByteArray
  }

  def writePcmFixture(): String = {
    val dir = java.nio.file.Paths.get(PcmDir)
    java.nio.file.Files.createDirectories(dir)
    (0 until NumPcm).foreach { k =>
      java.nio.file.Files.write(dir.resolve(f"pcm_$k%03d.wav"),
        pcmBytes(k))
    }
    val corrupt = pcmBytes(0); corrupt(0) = 'X'.toByte
    java.nio.file.Files.write(dir.resolve("corrupt.wav"), corrupt)
    dir.toString
  }

  /** Audio metadata from the binaryFile source: RIFF/WAV header
    * fields as pure little-endian Column arithmetic
    * ([[Multimodal.leUint32]] and friends — no decode, whole-stage
    * codegen), integer-exact duration_ms, and the isWav gate
    * quarantining the planted corrupt file. The DuckDB oracle
    * re-parses the same bytes via read_blob hex slices. */
  val audioMeta = GQuery(
    "q_audio_meta",
    (s, d) => {
      val dir = writeWavFixture()
      Multimodal.readBinaryDir(s, dir, "*.wav")
        .filter(Multimodal.isWav(col("content")))
        .select(col("file_name"), col("size_bytes"),
          Multimodal.wavChannels(col("content")).as("channels"),
          Multimodal.wavSampleRate(col("content")).as("sample_rate"),
          Multimodal.wavBitsPerSample(col("content")).as("bits"),
          Multimodal.wavDataBytes(col("content")).as("data_bytes"),
          Multimodal.wavDurationMs(col("content")).as("duration_ms"))
        .orderBy("file_name")
    },
    Some(s"""
      SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
             size AS size_bytes,
             ${Multimodal.leUint16Sql("content", 23)} AS channels,
             ${Multimodal.leUint32Sql("content", 25)} AS sample_rate,
             ${Multimodal.leUint16Sql("content", 35)} AS bits,
             ${Multimodal.leUint32Sql("content", 41)} AS data_bytes,
             ${Multimodal.leUint32Sql("content", 41)} * 1000
               // ${Multimodal.leUint32Sql("content", 29)} AS duration_ms
      FROM read_blob('$AudioDir/*.wav')
      WHERE ${Multimodal.isWavSql("content")}
      ORDER BY file_name
    """))

  // ---------------------------------------------------------------
  // Block-PNG fixture for the perceptual hash: each 32×24 image is a
  // 2×2 grid of quadrant colors derived from k. Dimensions divide the
  // 8×8 aHash grid exactly, so every hash cell lies inside one
  // quadrant and the whole 64-bit hash is an analytic function of the
  // four quadrant lumas — which the filename's k encodes. The oracle
  // never decodes a pixel; it re-derives the colors, the four
  // strict-majority bits, and composes the hash from quadrant bit
  // masks.
  // ---------------------------------------------------------------

  val NumBlocks = 24
  val BlockDir = "/tmp/graft_fixtures/binmm/blocks"

  def blockColor(k: Int, q: Int): (Int, Int, Int) =
    ((k * 37 + 11 + 17 * q) % 256,
      (k * 59 + 5 + 29 * q) % 256,
      (k * 83 + 7 + 41 * q) % 256)

  def blockName(k: Int): String = f"blk_$k%03d.png"

  def blockPng(k: Int): Array[Byte] = {
    val (w, h) = (32, 24)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val q = (if (y >= h / 2) 2 else 0) + (if (x >= w / 2) 1 else 0)
      val (r, g, b) = blockColor(k, q)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Every 4th block gets a byte-identical twin under a dup_ name —
    * the planted near-dup population for q_image_neardup (exact
    * copies hash identically by construction; the single-pixel-edit
    * robustness case lives in MultimodalSpec where it's provable). */
  def writeBlockFixture(): String = {
    val dir = java.nio.file.Paths.get(BlockDir)
    java.nio.file.Files.createDirectories(dir)
    (0 until NumBlocks).foreach { k =>
      val p = dir.resolve(blockName(k))
      if (!java.nio.file.Files.exists(p))
        java.nio.file.Files.write(p, blockPng(k))
      if (k % 4 == 0) {
        val d = dir.resolve(f"dup_$k%03d.png")
        if (!java.nio.file.Files.exists(d))
          java.nio.file.Files.write(d, blockPng(k))
      }
    }
    java.nio.file.Files.write(dir.resolve("blk_corrupt.png"),
      "not an image at all".getBytes("UTF-8"))
    dir.toString
  }

  /** Quadrant bit mask over the 8×8 cell grid (row-major bit = 8r+c):
    * q0 = top-left, q1 = top-right, q2 = bottom-left, q3 =
    * bottom-right. Disjoint masks sum without carries, so the oracle
    * composes the hash arithmetically (bit 63 makes q3's mask a
    * negative BIGINT literal — exact two's complement either way). */
  private def quadMask(q: Int): Long = {
    var m = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      val qq = (if (r >= 4) 2 else 0) + (if (c >= 4) 1 else 0)
      if (qq == q) m |= 1L << (8 * r + c)
    }
    m
  }

  /** Perceptual-hash image fingerprinting
    * ([[Multimodal.aHashBatch]]): REAL pixel decode → exact 8×8
    * area-average aHash, the raw-image leg of the near-dup family
    * (SimHash for text, cosine for embeddings, aHash for pixels —
    * re-encoded or lightly edited images collide at small Hamming
    * distance, which no byte checksum can see). The oracle predicts
    * every 64-bit hash analytically from the filename-encoded
    * quadrant colors — strict integer majority bits composed through
    * literal quadrant masks — so a single mis-binned pixel or a
    * float mean anywhere breaks the match. The planted corrupt file
    * must quarantine-drop. */
  val imagePhash = GQuery(
    "q_image_phash",
    (s, d) => {
      val dir = writeBlockFixture()
      Multimodal.aHashDataset(
        Multimodal.readBinaryDir(s, dir, "blk_*.png"), batchSize = 8)
        .toDF()
        .select(col("file_name"), col("phash"),
          col("n_set_bits").cast("long").as("n_set_bits"))
        .orderBy("file_name")
    },
    Some {
      def lum(j: Int) =
        s"(299 * ((k * 37 + 11 + ${17 * j}) % 256) + " +
          s"587 * ((k * 59 + 5 + ${29 * j}) % 256) + " +
          s"114 * ((k * 83 + 7 + ${41 * j}) % 256))"
      def bit(j: Int) =
        s"(CASE WHEN 4 * l$j > (l0 + l1 + l2 + l3) THEN 1 ELSE 0 END)"
      s"""
      WITH f AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
               CAST(regexp_extract(filename, 'blk_(\\d+)\\.png', 1)
                 AS INT) AS k
        FROM read_blob('$BlockDir/blk_*.png')
        WHERE regexp_matches(filename, 'blk_\\d+\\.png')),
      lums AS (
        SELECT file_name, ${lum(0)} AS l0, ${lum(1)} AS l1,
               ${lum(2)} AS l2, ${lum(3)} AS l3
        FROM f),
      bits AS (
        SELECT file_name, ${bit(0)} AS b0, ${bit(1)} AS b1,
               ${bit(2)} AS b2, ${bit(3)} AS b3
        FROM lums)
      SELECT file_name,
             CAST(b0 * ${quadMask(0)} + b1 * ${quadMask(1)}
                + b2 * ${quadMask(2)} + b3 * (${quadMask(3)})
               AS BIGINT) AS phash,
             CAST(16 * (b0 + b1 + b2 + b3) AS BIGINT) AS n_set_bits
      FROM bits ORDER BY file_name
    """})

  /** Image near-dup pair discovery — aHash banded into 4×16-bit
    * chunks (the SimHash machinery verbatim: bucket collisions only,
    * never all-pairs), exact Hamming verify at ≤ 6 bits. On the block
    * fixture the hash space is the 16 quadrant-bit patterns, so every
    * equal-pattern file pair — the planted byte-identical dup_ twins
    * AND the organic k-collisions — must surface at Hamming 0, and
    * nothing else can pass the threshold (patterns differ by whole
    * 16-bit quadrants). The oracle derives each file's pattern
    * analytically from its filename k and emits equal-pattern pairs
    * under the same lexicographic ordering bucketPairs produces. The
    * corrupt file must quarantine out of discovery entirely. */
  val imageNearDup = GQuery(
    "q_image_neardup",
    (s, d) => {
      val dir = writeBlockFixture()
      val hashed = Multimodal.aHashDataset(
        Multimodal.readBinaryDir(s, dir, "*.png"), batchSize = 8).toDF()
      val chunkRows = hashed.select(col("file_name"), col("phash"),
        explode(array((0 until 4).map(ci => struct(lit(ci).as("ci"),
          shiftright(col("phash"), ci * 16)
            .bitwiseAND(lit(0xFFFFL)).as("cv"))): _*)).as("ch"))
        .select(col("file_name"), col("phash"),
          col("ch.ci"), col("ch.cv"))
      graft.ops.Dedup.bucketPairs(chunkRows, Seq("ci", "cv"),
          struct(col("file_name"), col("phash")))
        .select(col("a.file_name").as("id_a"),
          col("b.file_name").as("id_b"),
          graft.ops.Dedup.hammingDistance(col("a.phash"), col("b.phash"))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 6)
        .orderBy("id_a", "id_b")
    },
    Some {
      def lum(j: Int) =
        s"(299 * ((k * 37 + 11 + ${17 * j}) % 256) + " +
          s"587 * ((k * 59 + 5 + ${29 * j}) % 256) + " +
          s"114 * ((k * 83 + 7 + ${41 * j}) % 256))"
      def bit(j: Int) =
        s"(CASE WHEN 4 * l$j > (l0 + l1 + l2 + l3) THEN 1 ELSE 0 END)"
      s"""
      WITH f AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
               CAST(regexp_extract(filename, '(?:blk|dup)_(\\d+)\\.png', 1)
                 AS INT) AS k
        FROM read_blob('$BlockDir/*.png')
        WHERE regexp_matches(filename, '(?:blk|dup)_\\d+\\.png')),
      lums AS (
        SELECT file_name, ${lum(0)} AS l0, ${lum(1)} AS l1,
               ${lum(2)} AS l2, ${lum(3)} AS l3
        FROM f),
      pat AS (
        SELECT file_name, ${bit(0)} AS b0, ${bit(1)} AS b1,
               ${bit(2)} AS b2, ${bit(3)} AS b3
        FROM lums)
      SELECT a.file_name AS id_a, b.file_name AS id_b,
             CAST(0 AS BIGINT) AS hamming
      FROM pat a JOIN pat b ON a.file_name < b.file_name
      WHERE a.b0 = b.b0 AND a.b1 = b.b1 AND a.b2 = b.b2 AND a.b3 = b.b3
      ORDER BY id_a, id_b
    """})

  // ---------------------------------------------------------------
  // JPEG fixture: structurally-valid JPEG streams with a k-dependent
  // variable segment prefix (JFIF APP0, 0-2 COM segments of varying
  // length, DQT) before the SOF marker — the shape that forces a real
  // segment walk; fixed offsets cannot find JPEG dimensions. Plus two
  // planted quarantine cases: a bad-magic file and an SOS-before-SOF
  // stream (the walk must die, not misparse).
  // ---------------------------------------------------------------

  val NumJpegs = 24
  val JpegDir = "/tmp/graft_fixtures/binmm/jpeg"

  def jpegDims(k: Int): (Int, Int) = (64 + 9 * k, 48 + 5 * k)

  def jpegBytes(k: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(code: Int): Unit = { out.write(0xFF); out.write(code) }
    def seg(code: Int, payload: Array[Byte]): Unit = {
      m(code)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    m(0xD8)                                        // SOI
    seg(0xE0, "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0))  // APP0
    (0 until k % 3).foreach { j =>                 // variable COM prefix
      seg(0xFE, Array.fill(5 + 7 * j + k)((k % 97).toByte))
    }
    seg(0xDB, Array.fill(65)((k % 251).toByte))    // DQT
    val (w, h) = jpegDims(k)
    seg(if (k % 2 == 0) 0xC0 else 0xC2,            // SOF0 / SOF2
      Array[Byte](8,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xC4, Array.fill(16 + k)((k % 31).toByte)) // DHT
    seg(0xDA, Array[Byte](1, 1, 0, 0, 63, 0))      // SOS
    val payload = Array.fill(40 + 3 * k)((k % 199).toByte)
    out.write(payload, 0, payload.length)          // entropy data
    m(0xD9)                                        // EOI
    out.toByteArray
  }

  def jpegName(k: Int): String = f"pic_$k%03d.jpg"

  def writeJpegFixture(): String = {
    val dir = java.nio.file.Paths.get(JpegDir)
    java.nio.file.Files.createDirectories(dir)
    (0 until NumJpegs).foreach { k =>
      java.nio.file.Files.write(dir.resolve(jpegName(k)), jpegBytes(k))
    }
    val badMagic = jpegBytes(0); badMagic(0) = 'X'.toByte
    java.nio.file.Files.write(dir.resolve("notjpeg.jpg"), badMagic)
    // SOS directly after APP0: the walk must terminate dead, never
    // read dimensions from entropy-coded bytes
    val sosFirst = new java.io.ByteArrayOutputStream()
    sosFirst.write(Array(0xFF, 0xD8, 0xFF, 0xE0, 0, 4, 0, 0,
      0xFF, 0xDA, 0, 4, 1, 0).map(_.toByte), 0, 14)
    sosFirst.write(Array.fill(32)(7.toByte), 0, 32)
    java.nio.file.Files.write(dir.resolve("headless.jpg"),
      sosFirst.toByteArray)
    dir.toString
  }

  /** JPEG metadata via the bounded segment walk
    * ([[Multimodal.jpegSofStruct]]): dimensions + the progressive flag
    * from SOF0/SOF2, pure Column byte arithmetic over the binaryFile
    * source. The DuckDB oracle re-walks the same bytes with a
    * RECURSIVE CTE over read_blob hex slices — a genuinely different
    * control-flow formulation of the same walk — and both engines must
    * quarantine the planted bad-magic and SOS-before-SOF files. */
  val jpegMeta = GQuery(
    "q_jpeg_meta",
    (s, d) => {
      val dir = writeJpegFixture()
      Multimodal.readBinaryDir(s, dir, "*.jpg")
        .withColumn("_m", Multimodal.jpegSofStruct(col("content")))
        .filter(col("_m").isNotNull)
        .select(col("file_name"), col("size_bytes"),
          col("_m.width").as("width"), col("_m.height").as("height"),
          col("_m.progressive").as("progressive"))
        .orderBy("file_name")
    },
    Some(s"""
      WITH RECURSIVE jb AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
               size AS size_bytes, hex(content) AS hx
        FROM read_blob('$JpegDir/*.jpg')
        WHERE ${Multimodal.isJpegSql("content")}),
      walk AS (
        SELECT file_name, size_bytes, hx, CAST(3 AS BIGINT) AS off,
               0 AS st, CAST(0 AS BIGINT) AS w, CAST(0 AS BIGINT) AS h,
               0 AS prog, 0 AS steps
        FROM jb
        UNION ALL
        SELECT file_name, size_bytes, hx,
               CASE WHEN mark <> 'FF' OR code IN ('DA', 'D9') THEN off
                    WHEN code IN ('C0', 'C2') THEN off
                    ELSE off + 2 + seglen END,
               CASE WHEN mark <> 'FF' OR code IN ('DA', 'D9') THEN 2
                    WHEN code IN ('C0', 'C2') THEN 1
                    ELSE 0 END,
               CASE WHEN code IN ('C0', 'C2') THEN
                 CAST(('0x' || substring(hx, 2 * (off + 7) - 1, 4)) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END,
               CASE WHEN code IN ('C0', 'C2') THEN
                 CAST(('0x' || substring(hx, 2 * (off + 5) - 1, 4)) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END,
               CASE WHEN code = 'C2' THEN 1 ELSE 0 END,
               steps + 1
        FROM (
          SELECT file_name, size_bytes, hx, off, st, steps,
                 substring(hx, 2 * off - 1, 2) AS mark,
                 substring(hx, 2 * off + 1, 2) AS code,
                 CAST(('0x' || substring(hx, 2 * (off + 2) - 1, 4))
                   AS BIGINT) AS seglen
          FROM walk WHERE st = 0 AND steps < 16))
      SELECT file_name, size_bytes, w AS width, h AS height,
             prog = 1 AS progressive
      FROM walk WHERE st = 1
      ORDER BY file_name
    """))

  /** Planted ledger state: every k≡0 (mod 3) file carries its TRUE
    * byte checksum (→ unchanged), k≡1 a stale checksum (→ changed),
    * k≡2 is absent (→ new), and one ghost row has no file on disk
    * (→ missing). The oracle reproduces the decisions from the planted
    * pattern — which verifies the engine's md5-compare behavior, since
    * a checksum mismatch anywhere would flip a decision. */
  def plantedLedger(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def trueCk(k: Int): String =
      md.digest(pngBytes(k)).map("%02x".format(_)).mkString
    val rows = (0 until NumFiles).flatMap { k =>
      (k % 3) match {
        case 0 => Some((fileName(k), trueCk(k)))
        case 1 => Some((fileName(k), "0" * 32))
        case _ => None
      }
    } :+ (("ghost.png", "f" * 32))
    rows.toDF("file_name", "checksum")
  }

  val fileLedger = GQuery(
    "q_file_ledger",
    (s, d) => {
      val dir = writeFixture()
      val scanned = Ledger.scan(s, dir, "*.png")
      Ledger.decide(scanned, plantedLedger(s))
        .select("file_name", "size_bytes", "decision")
        .orderBy("file_name")
    },
    Some(s"""
      SELECT * FROM (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
               size AS size_bytes,
               CASE CAST(regexp_extract(filename, 'img_(\\d+)\\.png', 1) AS INT) % 3
                 WHEN 0 THEN 'unchanged'
                 WHEN 1 THEN 'changed'
                 ELSE 'new' END AS decision
        FROM read_blob('$ImagesDir/*.png')
        UNION ALL
        SELECT 'ghost.png', CAST(NULL AS BIGINT), 'missing'
      ) ORDER BY file_name
    """))

  // ---------------------------------------------------------------
  // MP4 fixture: structurally-valid ISO-BMFF files — ftyp, a free box
  // whose k-dependent size SHIFTS moov (so a fixed-offset read cannot
  // pass), then moov with a leading udta child the inner walk must
  // skip before mvhd. k%3==0 files carry a version-1 mvhd whose
  // 64-bit duration has a NONZERO high word (the BE64 reassembly is
  // exercised, not just compiled). Plus a bad-magic corrupt file and
  // a moov-less truncated file, both of which the parser must
  // quarantine. The oracle never walks a box: it re-derives every
  // field analytically from the filename's k (the block-PNG aHash
  // convention), so the two sides agree only if the walk really
  // landed on mvhd.
  // ---------------------------------------------------------------

  val NumMp4s = 18
  val VideoDir = "/tmp/graft_fixtures/binmm/video"
  /** v1 durations get 2^33 added: forces the BE64 high word. */
  val V1DurationHigh = 8589934592L

  def mp4Bytes(k: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = out.write(Array((v >> 24).toByte,
      (v >> 16).toByte, (v >> 8).toByte, v.toByte), 0, 4)
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def pad(n: Int): Unit = out.write(Array.fill(n)(0.toByte), 0, n)
    be32(20); tag("ftyp"); tag("isom"); be32(0x200); tag("mp41")
    val freePad = (k % 5) * 4
    be32(8 + freePad); tag("free"); pad(freePad)
    val version = if (k % 3 == 0) 1 else 0
    val timescale = 600L * (1 + k % 4)
    val duration = 3600L * (k + 1) + 13L * k +
      (if (version == 1) V1DurationHigh else 0L)
    val mvhdSize = if (version == 1) 120 else 108
    be32(8 + 12 + mvhdSize); tag("moov")
    be32(12); tag("udta"); be32(0)
    be32(mvhdSize); tag("mvhd")
    out.write(Array[Byte](version.toByte, 0, 0, 0), 0, 4)
    if (version == 1) {
      pad(16)                            // 64-bit ctime + mtime
      be32(timescale)
      be32(duration >> 32); be32(duration & 0xFFFFFFFFL)
      pad(120 - 40)
    } else {
      pad(8)                             // 32-bit ctime + mtime
      be32(timescale); be32(duration)
      pad(108 - 28)
    }
    out.toByteArray
  }

  def mp4Name(k: Int): String = f"vid_$k%03d.mp4"

  def writeMp4Fixture(): String = {
    val dir = java.nio.file.Paths.get(VideoDir)
    java.nio.file.Files.createDirectories(dir)
    (0 until NumMp4s).foreach { k =>
      java.nio.file.Files.write(dir.resolve(mp4Name(k)), mp4Bytes(k))
    }
    val corrupt = mp4Bytes(0); corrupt(4) = 'X'.toByte
    java.nio.file.Files.write(dir.resolve("corrupt.mp4"), corrupt)
    // structurally valid boxes but no moov: walk must die at EOF
    java.nio.file.Files.write(dir.resolve("nomoov.mp4"),
      mp4Bytes(1).take(28))
    dir.toString
  }

  /** Video metadata from the two-level MP4 box walk
    * ([[Multimodal.mp4MvhdStruct]] — bounded HOF folds, no decode,
    * no UDF): version, timescale, version-width duration, and the
    * truncated-integer duration_ms. The corrupt and moov-less files
    * must quarantine to NULL and vanish from the result. */
  val videoMeta = GQuery(
    "q_video_meta",
    (s, d) => {
      val dir = writeMp4Fixture()
      Multimodal.withMp4Mvhd(
        Multimodal.readBinaryDir(s, dir, "*.mp4"), "content", "m")
        .filter(col("m").isNotNull)
        .select(col("file_name"), col("size_bytes"),
          col("m.version").as("version"),
          col("m.timescale").as("timescale"),
          col("m.duration").as("duration"),
          col("m.duration_ms").as("duration_ms"))
        .orderBy("file_name")
    },
    Some(s"""
      WITH f AS (
        SELECT CAST(regexp_extract(filename, 'vid_(\\d+)\\.mp4', 1) AS INT)
                 AS k,
               regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
               size AS size_bytes
        FROM read_blob('$VideoDir/*.mp4')
        WHERE ${Multimodal.isMp4Sql("content")}
          AND regexp_matches(filename, 'vid_\\d+\\.mp4$$')),
      g AS (
        SELECT file_name, size_bytes,
               CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END AS version,
               600 * (1 + k % 4) AS timescale,
               3600 * (k + 1) + 13 * k +
                 CASE WHEN k % 3 = 0 THEN $V1DurationHigh ELSE 0 END
                 AS duration
        FROM f)
      SELECT file_name, size_bytes,
             CAST(version AS BIGINT) AS version,
             CAST(timescale AS BIGINT) AS timescale,
             CAST(duration AS BIGINT) AS duration,
             duration * 1000 // timescale AS duration_ms
      FROM g ORDER BY file_name
    """))

  /** Frame-sampling plumbing over video-shaped rows: even-stride
    * index fan-out ([[Multimodal.sampleFrameIdx]]) — <= 16 sampled
    * frames per clip regardless of length, zero rows for empty clips.
    * The per-frame decode plugs in downstream (stubbed per the
    * multimodal contract); this gates the distributed fan-out shape. */
  val frameSample = GQuery(
    "q_frame_sample",
    (s, d) => graft.Tables.documents(s, d)
      .select(col("doc_id").as("video_id"),
        (col("n_chars") % 97).cast("long").as("n_frames"))
      .select(col("video_id"), col("n_frames"),
        Multimodal.sampleFrameIdx(col("n_frames"), maxFrames = 16)
          .as("frame_idx"))
      .orderBy("video_id", "frame_idx"),
    Some("""
      WITH v AS (
        SELECT doc_id AS video_id, CAST(n_chars % 97 AS BIGINT) AS n_frames
        FROM documents)
      SELECT video_id, n_frames,
             unnest(generate_series(0, n_frames - 1,
               greatest((n_frames + 15) // 16, 1))) AS frame_idx
      FROM v WHERE n_frames > 0
      ORDER BY video_id, frame_idx
    """))

  // ---------------------------------------------------------------
  // Binary COLUMNS in a parquet table — the other multimodal storage
  // shape (the brief's "treat image/audio/video as opaque binary
  // columns with typed metadata"): not a binaryFile directory but a
  // normal table whose `content` column carries the bytes. Fixture
  // content is sf-independent (deterministic PNGs + one corrupt row),
  // so no sf-keyed path is needed.
  // ---------------------------------------------------------------

  val BinTableDir = "/tmp/graft_fixtures/binmm/bintable"

  def writeBinaryTableFixture(s: org.apache.spark.sql.SparkSession): String = {
    import s.implicits._
    val rows = (0 until NumFiles).map { k =>
      (k.toLong, "image/png", pngBytes(k))
    } :+ {
      val corrupt = pngBytes(0); corrupt(0) = 'X'.toByte
      (NumFiles.toLong, "application/octet-stream", corrupt)
    }
    rows.toDF("img_id", "mime", "content")
      .repartition(2)
      .write.mode("overwrite").parquet(BinTableDir)
    BinTableDir
  }

  /** Multimodal bytes as a TABLE COLUMN: checksum + header parse over
    * `content BINARY` read from parquet — same Column expressions as
    * the binaryFile leg, different storage shape (the one a 100 TB
    * corpus actually uses: bytes co-located with their typed metadata
    * row, partition-prunable, no tiny-file listing). The corrupt row
    * stays IN the result with NULL dims — column-shape quarantine is
    * per-value, not per-file. The oracle re-reads the same parquet
    * with DuckDB and re-parses the same offsets over the BLOB. */
  val binaryColumn = GQuery(
    "q_binary_column",
    (s, d) => {
      val dir = writeBinaryTableFixture(s)
      s.read.parquet(dir).select(
        col("img_id"), col("mime"),
        length(col("content")).cast("long").as("n_bytes"),
        // md5 over the HEX of the bytes: DuckDB's md5 is
        // VARCHAR-only, and a blob->varchar cast would choke on
        // non-UTF8 bytes; hex is uppercase in both engines
        md5(hex(col("content"))).as("content_md5"),
        when(Multimodal.isPng(col("content")),
          Multimodal.pngWidth(col("content"))).as("img_width"),
        when(Multimodal.isPng(col("content")),
          Multimodal.pngHeight(col("content"))).as("img_height"))
        .orderBy("img_id")
    },
    Some(s"""
      SELECT img_id, mime,
             CAST(octet_length(content) AS BIGINT) AS n_bytes,
             md5(hex(content)) AS content_md5,
             CASE WHEN ${Multimodal.isPngSql("content")}
               THEN ${Multimodal.beUint32Sql("content", 17)} END AS img_width,
             CASE WHEN ${Multimodal.isPngSql("content")}
               THEN ${Multimodal.beUint32Sql("content", 21)} END AS img_height
      FROM read_parquet('$BinTableDir/*.parquet')
      ORDER BY img_id
    """),
    eager = true)

  // ---------------------------------------------------------------
  // Content-defined chunking fixture: deterministic LCG byte blobs.
  // Files 9-11 are files 0-2 with a 101-byte random prefix INSERTED —
  // the shift-resistance scenario fixed-offset chunking destroys:
  // every boundary after the insertion re-synchronizes because the
  // cut rule sees only the last `window` bytes, so the copies share
  // almost all their chunk hashes at different offsets. Plus a
  // sub-minLen file (single tail chunk) and an empty file (no rows).
  // ---------------------------------------------------------------

  val BlobDir = "/tmp/graft_fixtures/binmm/blobs"
  val CdcWindow = 16
  val CdcDivisor = 256
  val CdcMin = 64
  val CdcMax = 1024

  def blobBytes(k: Int, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var x = 123456789L + k * 987654321L
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      a(i) = (x >>> 33).toByte
      i += 1
    }
    a
  }

  def writeBlobFixture(): String = {
    val dir = java.nio.file.Paths.get(BlobDir)
    java.nio.file.Files.createDirectories(dir)
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    (0 until 9).foreach { k =>
      put(f"blob_$k%02d.bin", blobBytes(k, 1500 + 317 * k))
    }
    (9 until 12).foreach { k =>
      put(f"blob_$k%02d.bin",
        blobBytes(1000 + k, 101) ++ blobBytes(k - 9, 1500 + 317 * (k - 9)))
    }
    put("tiny.bin", blobBytes(99, 40))
    put("empty.bin", Array.empty[Byte])
    dir.toString
  }

  private def cdcChunkFrame(s: org.apache.spark.sql.SparkSession) = {
    import org.apache.spark.sql.graftbridge.Bridge
    val dir = writeBlobFixture()
    Multimodal.readBinaryDir(s, dir, "*.bin")
      .select(col("file_name"),
        explode(Bridge.column(graft.functions.RollingChunks(
          Bridge.expression(col("content")),
          CdcWindow, CdcDivisor, CdcMin, CdcMax))).as("c"))
      .select(col("file_name"), col("c.offset").as("chunk_offset"),
        col("c.len").as("len"), col("c.chunk_md5").as("chunk_md5"))
  }

  /** The oracle re-walks the same bytes: a recursive CTE advances one
    * byte per step carrying (h, chunk_start) — the exact mod-1e9+7
    * rolling hash and min/max cut rule of [[graft.functions
    * .RollingChunks]] — then hashes each chunk's hex slice. A
    * genuinely different control flow (sequential recursion vs one
    * imperative pass) over identical arithmetic. */
  private def cdcWalkSql: String = {
    val pow = BigInt(graft.functions.RollingChunks.A)
      .modPow(CdcWindow - 1, graft.functions.RollingChunks.M)
    val A = graft.functions.RollingChunks.A
    val M = graft.functions.RollingChunks.M
    def byteAt(pos: String) =
      s"CAST(('0x' || substring(f.hx, 2*($pos)+1, 2)) AS BIGINT)"
    s"""
      WITH RECURSIVE fx AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
               hex(content) AS hx, size AS n
        FROM read_blob('$BlobDir/*.bin')
        WHERE size > 0),
      walk AS (
        SELECT file_name, -1 AS i, CAST(0 AS BIGINT) AS h,
               CAST(0 AS BIGINT) AS cstart, FALSE AS cut,
               CAST(0 AS BIGINT) AS cut_start, CAST(0 AS BIGINT) AS cut_len
        FROM fx
        UNION ALL
        SELECT file_name, j, h2,
               CASE WHEN (j - cstart + 1 >= $CdcMin AND h2 % $CdcDivisor = 0)
                      OR (j - cstart + 1 >= $CdcMax)
                 THEN j + 1 ELSE cstart END,
               (j - cstart + 1 >= $CdcMin AND h2 % $CdcDivisor = 0)
                 OR (j - cstart + 1 >= $CdcMax),
               cstart, j - cstart + 1
        FROM (
          SELECT w.file_name, w.i + 1 AS j, w.cstart,
                 ((CASE WHEN w.i + 1 >= $CdcWindow
                     THEN (w.h - ${byteAt(s"w.i + 1 - $CdcWindow")} * $pow % $M
                           + $M) % $M
                     ELSE w.h END) * $A
                   + ${byteAt("w.i + 1")}) % $M AS h2
          FROM walk w JOIN fx f USING (file_name)
          WHERE w.i + 1 < f.n) t),
      chunks AS (
        SELECT file_name, cut_start AS offset, cut_len AS len
        FROM walk WHERE cut
        UNION ALL
        SELECT w.file_name, w.cstart, f.n - w.cstart
        FROM walk w JOIN fx f USING (file_name)
        WHERE w.i = f.n - 1 AND w.cstart < f.n)
    """
  }

  /** CDC chunk inventory: every (file, offset, len, content hash). */
  val cdcChunks = GQuery(
    "q_cdc_chunks",
    (s, d) => cdcChunkFrame(s).orderBy("file_name", "chunk_offset"),
    Some(s"""
      $cdcWalkSql
      SELECT c.file_name, CAST(c.offset AS BIGINT) AS chunk_offset,
             CAST(c.len AS BIGINT) AS len,
             md5(substring(f.hx, 2*c.offset+1, 2*c.len)) AS chunk_md5
      FROM chunks c JOIN fx f USING (file_name)
      ORDER BY file_name, chunk_offset
    """))

  /** Chunk-level dedup discovery: content hashes shared by >= 2
    * distinct files — the bytes a chunk store would keep once. The
    * prefix-inserted copies surface here despite having NO equal
    * whole-file checksum and NO aligned offsets. */
  val cdcSharedChunks = GQuery(
    "q_cdc_shared_chunks",
    (s, d) => cdcChunkFrame(s)
      .groupBy("chunk_md5")
      .agg(countDistinct(col("file_name")).cast("long").as("n_files"),
        count(lit(1)).cast("long").as("n_copies"),
        max(col("len")).cast("long").as("len"))
      .filter(col("n_files") >= 2)
      .orderBy("chunk_md5"),
    Some(s"""
      $cdcWalkSql,
      hashed AS (
        SELECT c.file_name,
               md5(substring(f.hx, 2*c.offset+1, 2*c.len)) AS chunk_md5,
               c.len
        FROM chunks c JOIN fx f USING (file_name))
      SELECT chunk_md5,
             CAST(count(DISTINCT file_name) AS BIGINT) AS n_files,
             CAST(count(*) AS BIGINT) AS n_copies,
             CAST(max(len) AS BIGINT) AS len
      FROM hashed GROUP BY chunk_md5
      HAVING count(DISTINCT file_name) >= 2
      ORDER BY chunk_md5
    """))

  /** PCM energy/silence census ([[Multimodal.windowEnergies]]) —
    * the voice-activity-trim primitive: per-file window count,
    * silent-window count (mean-abs < 10), peak and mean window
    * energy, all integer-exact. The oracle re-walks every sample
    * byte via hex slices, regroups by window, and re-derives the
    * same censuses — so the sign fold, the window floor, and the
    * integer means gate together. The fixture's silence lattice
    * (every third window all-zero) makes a wrong window boundary
    * shift the silent count immediately. */
  val audioEnergy = GQuery(
    "q_audio_energy",
    (s, d) => {
      val dir = writePcmFixture()
      val we = Multimodal.windowEnergies(col("content"), 50)
      Multimodal.readBinaryDir(s, dir, "*.wav")
        .filter(Multimodal.isWav(col("content")))
        .select(col("file_name"), we.as("we"))
        .select(col("file_name"),
          size(col("we")).cast("long").as("n_windows"),
          size(filter(col("we"), e => e < 10L)).cast("long")
            .as("n_silent"),
          coalesce(array_max(col("we")), lit(0L)).as("max_energy"),
          (aggregate(col("we"), lit(0L), (a, e) => a + e) /
            greatest(size(col("we")), lit(1))).cast("long")
            .as("mean_energy"))
        .orderBy("file_name")
    },
    Some(s"""
      WITH src AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS file_name,
               content, (size - 44) // 2 AS ns
        FROM read_blob('$PcmDir/*.wav')
        WHERE ${Multimodal.isWavSql("content")}),
      samp AS (
        SELECT file_name, content,
               unnest(generate_series(0,
                 CAST(ns // 50 AS INT) * 50 - 1)) AS i
        FROM src WHERE ns >= 50),
      wins AS (
        SELECT file_name, i // 50 AS w,
               SUM(${Multimodal.pcm16AbsSql("content", "i")}) // 50
                 AS energy
        FROM samp GROUP BY file_name, w),
      agg AS (
        SELECT file_name, CAST(count(*) AS BIGINT) AS n_windows,
               CAST(count(*) FILTER (WHERE energy < 10) AS BIGINT)
                 AS n_silent,
               CAST(max(energy) AS BIGINT) AS max_energy,
               CAST(sum(energy) // count(*) AS BIGINT) AS mean_energy
        FROM wins GROUP BY file_name)
      SELECT s.file_name,
             coalesce(a.n_windows, 0) AS n_windows,
             coalesce(a.n_silent, 0) AS n_silent,
             coalesce(a.max_energy, 0) AS max_energy,
             coalesce(a.mean_energy, 0) AS mean_energy
      FROM src s LEFT JOIN agg a USING (file_name)
      ORDER BY s.file_name
    """))

  def all: Seq[GQuery] =
    Seq(binaryMeta, fileLedger, imageDecode, imageResize, audioMeta,
      jpegMeta, imagePhash, imageNearDup, videoMeta, frameSample,
      binaryColumn, cdcChunks, cdcSharedChunks, audioEnergy)
}
