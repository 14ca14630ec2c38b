package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) columns — opaque bytes + typed metadata.
  *
  * Posture for a 100 TB training-data pipeline: images/audio/video
  * ride as `binary` columns with structured metadata alongside. Two
  * tiers of work:
  *
  *  - METADATA (container headers are plain bytes) stays in codegen'd
  *    Column expressions (`substring` on binary, `hex`, `conv`) — no
  *    UDFs, mirrored exactly by the DuckDB oracle;
  *  - PIXEL work (decode, resample) runs per-partition in bounded
  *    batches via `mapPartitions`, backed by the JDK's ImageIO/Java2D
  *    (PNG, JPEG, GIF, BMP — whatever the installed ImageIO plugins
  *    read). Formats the JDK can't decode would swap in a codec at
  *    [[decodeBatch]]/[[resizeBatch]]; everything else — schema,
  *    batching, quarantine-on-undecodable, partitioning — is format-
  *    agnostic and stays put.
  */
object Multimodal {

  /** Binary-file source: one row per file with path, length, bytes.
    * Spark's binaryFile source parallelizes files across tasks; at
    * scale prefer many medium files (or a packed parquet of binary
    * columns, as testdata's documents/embeddings do) over millions of
    * tiny ones — the file LISTING is the driver-side bottleneck. */
  def readBinaryDir(spark: SparkSession, dir: String,
                    glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length").as("size_bytes"),
        col("content"))

  /** Big-endian unsigned 32-bit int at a 1-based byte offset. */
  def beUint32(content: Column, offset: Int): Column =
    conv(hex(substring(content, offset, 4)), 16, 10).cast("long")

  /** PNG header fields: 8-byte signature, then the IHDR chunk puts
    * width at bytes 17-20 and height at 21-24 (big-endian). */
  val PngMagicHex = "89504E470D0A1A0A"
  def isPng(content: Column): Column =
    hex(substring(content, 1, 8)) === PngMagicHex
  def pngWidth(content: Column): Column = beUint32(content, 17)
  def pngHeight(content: Column): Column = beUint32(content, 21)

  /** DuckDB mirrors (read_blob column expressions). DuckDB has no
    * substring over BLOB, so the mirror hexes the whole blob and
    * slices the hex string: byte offset o (1-based) lives at hex
    * chars 2o−1 .. 2o. */
  def beUint32Sql(contentExpr: String, offset: Int): String =
    s"CAST(('0x' || substring(hex($contentExpr), ${2 * offset - 1}, 8)) AS BIGINT)"
  def isPngSql(contentExpr: String): String =
    s"substring(hex($contentExpr), 1, 16) = '$PngMagicHex'"

  /** Header-only metadata struct (no pixel decode): the cheap Column
    * path for scans that only need dimensions — runs in whole-stage
    * codegen, never materializes pixels. Non-PNG → null. */
  def pngHeaderStruct(content: Column): Column =
    when(isPng(content),
      struct(
        pngWidth(content).as("width"),
        pngHeight(content).as("height")))
      .otherwise(lit(null))

  final case class DecodedMeta(file_name: String, width: Long,
                               height: Long, mean_luma: Double)

  /** Integer Rec.601 luma weights, per mille: 299·R + 587·G + 114·B.
    * The image SUM is accumulated exactly in a Long (≤ 255000/pixel,
    * overflow-free below ~3.6e13 pixels), so mean = sum/(1000·n) is ONE
    * correctly-rounded IEEE division of two exactly-representable
    * values — for a uniform-color image it equals the per-pixel value
    * (299r+587g+114b)/1000.0 bit-for-bit, which is what lets a SQL
    * oracle predict it analytically. */
  private def lumaMilli(p: Int): Long =
    299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)

  /** Real batch decoder over JDK ImageIO. Contract: receives at most
    * `batchSize` images (decoders amortize setup per batch, the
    * vectorized-UDF shape), returns one Option per input in order
    * (None = undecodable → row dropped, the quarantine-at-decode
    * convention). Output per image: (width, height, true mean Rec.601
    * luminance over every pixel). Memory: one decoded image at a time
    * per task — the pixel buffer is released before the next decode. */
  def decodeBatch(contents: Seq[Array[Byte]], batchSize: Int): Seq[Option[(Long, Long, Double)]] = {
    require(contents.size <= batchSize,
      s"decoder contract: at most $batchSize images per call")
    javax.imageio.ImageIO.setUseCache(false) // no /tmp spill on executors
    contents.map { b =>
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null) None // no registered reader for these bytes
        else {
          val w = img.getWidth; val h = img.getHeight
          // getRGB normalizes any internal raster layout to sRGB ints —
          // exact for the 8-bit formats we care about
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sum = 0L; var i = 0
          while (i < px.length) { sum += lumaMilli(px(i)); i += 1 }
          Some((w.toLong, h.toLong, sum.toDouble / (1000.0 * px.length)))
        }
      } catch { // corrupt stream inside a valid container: drop, don't kill the task
        case scala.util.control.NonFatal(_) => None
      }
    }
  }

  /** Real batch resize — the write-path twin of [[decodeBatch]]:
    * ImageIO decode → Java2D bilinear resample to (width, height) →
    * lossless PNG re-encode. Undecodable input → None, same quarantine
    * convention as decode. */
  def resizeBatch(contents: Seq[Array[Byte]], width: Long, height: Long,
                  batchSize: Int): Seq[Option[Array[Byte]]] = {
    require(contents.size <= batchSize,
      s"resizer contract: at most $batchSize images per call")
    // caller bugs (0, negative, or >Int.MaxValue targets) must fail
    // loudly here — inside the per-image try they would silently
    // quarantine EVERY image as "undecodable"
    require(width >= 1 && width <= Int.MaxValue &&
        height >= 1 && height <= Int.MaxValue,
      s"resize target must be in [1, ${Int.MaxValue}]: ${width}x$height")
    javax.imageio.ImageIO.setUseCache(false)
    contents.map { b =>
      try {
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (src == null) None
        else {
          val dst = new java.awt.image.BufferedImage(
            width.toInt, height.toInt, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, width.toInt, height.toInt, null)
          } finally g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", out)
          Some(out.toByteArray)
        }
      } catch {
        case scala.util.control.NonFatal(_) => None
      }
    }
  }

  /** Batch resize over a decoded frame — same mapPartitions shape as
    * [[decodeDataset]]; a non-JDK resampler would swap in at
    * [[resizeBatch]] only. */
  def resizeDataset(images: DataFrame, width: Long, height: Long,
                    batchSize: Int = 64): DataFrame = {
    // fail on a bad target at plan time, not per-task
    require(width >= 1 && width <= Int.MaxValue &&
        height >= 1 && height <= Int.MaxValue,
      s"resize target must be in [1, ${Int.MaxValue}]: ${width}x$height")
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        batch.zip(resizeBatch(batch.map(_._2), width, height, batchSize))
          .collect { case ((name, _), Some(bytes)) => (name, bytes) }
      }).toDF("file_name", "content")
  }

  // ----- audio (RIFF/WAV) — the little-endian leg ------------------

  /** Little-endian unsigned ints at a 1-based byte offset: RIFF/WAV
    * metadata is little-endian where PNG's is big-endian, so the
    * bytes are hex'd individually and re-concatenated reversed —
    * still pure codegen'd Column arithmetic, no decode. */
  def leUint16(content: Column, offset: Int): Column =
    conv(concat(hex(substring(content, offset + 1, 1)),
      hex(substring(content, offset, 1))), 16, 10).cast("long")

  def leUint32(content: Column, offset: Int): Column =
    conv(concat(hex(substring(content, offset + 3, 1)),
      hex(substring(content, offset + 2, 1)),
      hex(substring(content, offset + 1, 1)),
      hex(substring(content, offset, 1))), 16, 10).cast("long")

  /** Canonical 44-byte PCM WAV header layout (1-based offsets):
    * "RIFF" at 1, "WAVE" at 9, channels 23-24 (LE16), sample rate
    * 25-28 (LE32), byte rate 29-32 (LE32), bits/sample 35-36 (LE16),
    * "data" + LE32 payload size at 37/41. */
  val RiffMagicHex = "52494646"
  val WaveMagicHex = "57415645"
  def isWav(content: Column): Column =
    hex(substring(content, 1, 4)) === RiffMagicHex &&
      hex(substring(content, 9, 4)) === WaveMagicHex
  def wavChannels(content: Column): Column = leUint16(content, 23)
  def wavSampleRate(content: Column): Column = leUint32(content, 25)
  def wavByteRate(content: Column): Column = leUint32(content, 29)
  def wavBitsPerSample(content: Column): Column = leUint16(content, 35)
  def wavDataBytes(content: Column): Column = leUint32(content, 41)

  /** Integer duration in milliseconds: payload bytes scaled by the
    * header's byte rate — integer division, exact in both engines. */
  def wavDurationMs(content: Column): Column =
    ((wavDataBytes(content) * 1000L) / wavByteRate(content))
      .cast("long")

  /** DuckDB mirrors (hex-slice convention of [[beUint32Sql]], with
    * the byte order reversed before the parse). */
  private def leHex(contentExpr: String, offset: Int, n: Int): String =
    (offset + n - 1).to(offset, -1)
      .map(o => s"substring(hex($contentExpr), ${2 * o - 1}, 2)")
      .mkString(" || ")
  def leUint16Sql(contentExpr: String, offset: Int): String =
    s"CAST(('0x' || ${leHex(contentExpr, offset, 2)}) AS BIGINT)"
  def leUint32Sql(contentExpr: String, offset: Int): String =
    s"CAST(('0x' || ${leHex(contentExpr, offset, 4)}) AS BIGINT)"
  def isWavSql(contentExpr: String): String =
    s"(substring(hex($contentExpr), 1, 8) = '$RiffMagicHex' AND " +
      s"substring(hex($contentExpr), 17, 8) = '$WaveMagicHex')"

  // ----- audio energy (PCM16 mono) — the compute leg --------------

  /** |sample i| of a canonical 44-byte-header PCM16LE mono WAV
    * (0-based sample index; two's-complement sign fold). */
  private def pcm16Abs(content: Column, i: Column): Column = {
    val lo = byteAt(content, lit(45L) + i * 2L)
    val hi = byteAt(content, lit(46L) + i * 2L)
    val v = lo + hi * 256L
    abs(when(v >= 32768L, v - 65536L).otherwise(v))
  }

  /** Per-window mean-absolute energies of a PCM16LE mono payload —
    * the voice-activity/silence-trim primitive an audio training
    * pipeline runs before anything else. One pass of pure Column
    * byte arithmetic (no decode, no UDF): window w's energy is the
    * integer mean of |sample| over its `window` samples; the ragged
    * tail window is dropped (floor), matching the oracle's integer
    * division exactly. Bounded by design: audio rides as bounded
    * binary cells ([[readBinaryDir]] posture), so the per-row fold
    * is clip-sized, never corpus-sized. */
  def windowEnergies(content: Column, window: Int): Column = {
    require(window > 0, s"window must be positive: $window")
    // Column `/` is true division — cast back to the integer floor
    // the oracle's `//` computes (all operands non-negative here)
    val nSamples = ((length(content) - 44L) / 2L).cast("long")
    val nWin = (nSamples / window).cast("int")
    val idx = when(nWin > lit(0), sequence(lit(0), nWin - 1))
      .otherwise(array().cast("array<int>"))
    transform(idx, w =>
      (aggregate(sequence(lit(0), lit(window - 1)), lit(0L),
        (acc, i) => acc +
          pcm16Abs(content, w.cast("long") * window + i.cast("long")))
        / window).cast("long"))
  }

  /** DuckDB mirror pieces for the energy walk (hex-slice
    * convention): |sample i| with the same sign fold. */
  def pcm16AbsSql(contentExpr: String, iExpr: String): String = {
    val lo = s"CAST(('0x' || substring(hex($contentExpr), " +
      s"2*(45 + 2*($iExpr)) - 1, 2)) AS BIGINT)"
    val hi = s"CAST(('0x' || substring(hex($contentExpr), " +
      s"2*(46 + 2*($iExpr)) - 1, 2)) AS BIGINT)"
    s"abs(CASE WHEN ($lo + 256*($hi)) >= 32768 " +
      s"THEN ($lo + 256*($hi)) - 65536 ELSE ($lo + 256*($hi)) END)"
  }

  // ----- image (JPEG) — the segment-walk leg ----------------------

  /** JPEG signature: SOI immediately followed by a marker byte
    * (FF D8 FF). */
  val JpegMagicHex = "FFD8FF"
  def isJpeg(content: Column): Column =
    hex(substring(content, 1, 3)) === JpegMagicHex
  def isJpegSql(contentExpr: String): String =
    s"substring(hex($contentExpr), 1, 6) = '$JpegMagicHex'"

  private def byteAt(content: Column, off: Column): Column =
    conv(hex(content.substr(off.cast("int"), lit(1))), 16, 10).cast("long")
  private def beU16At(content: Column, off: Column): Column =
    conv(hex(content.substr(off.cast("int"), lit(2))), 16, 10).cast("long")

  /** JPEG dimensions need a SEGMENT WALK — unlike PNG/WAV there is no
    * fixed header offset: the frame header (SOF0 baseline / SOF2
    * progressive) sits after a variable prefix of APPn/COM/DQT/DHT
    * segments, each self-describing via a big-endian 16-bit length.
    * The walk is a bounded fold over at most `maxSegs` segments —
    * state (offset, status, w, h, sof-code) threaded through a HOF
    * `aggregate` lambda, NOT an unrolled when-chain: each unrolled
    * step would re-inline the whole prior state expression (the
    * exponential-tree twin of the per-element re-evaluation rule), and
    * the fold keeps the state a bounded reference. Still pure Column
    * arithmetic over byte peeks — no decode, no UDF.
    *
    * Returns struct(width, height, progressive) or NULL for anything
    * that isn't a walkable JPEG (bad magic, truncated stream,
    * SOS/EOI before any SOF, > maxSegs prefix segments) — the same
    * quarantine posture as [[pngHeaderStruct]]/[[isWav]]. */
  def jpegSofStruct(content: Column, maxSegs: Int = 16): Column = {
    require(maxSegs >= 1 && maxSegs <= 64,
      s"jpegSofStruct maxSegs must be in [1, 64]: $maxSegs")
    // st: 0 = walking, 1 = SOF found, 2 = dead
    def st(off: Column, s: Column, w: Column, h: Column, c: Column) =
      struct(off.as("off"), s.as("st"), w.as("w"), h.as("h"), c.as("c"))
    val init = st(lit(3L), lit(0L), lit(0L), lit(0L), lit(0L))
    val walked = aggregate(
      sequence(lit(1), lit(maxSegs)), init,
      (acc, _) => {
        val off = acc.getField("off")
        val mark = byteAt(content, off)
        val code = byteAt(content, off + 1L)
        val isSof = code === 0xC0L || code === 0xC2L
        when(acc.getField("st") =!= 0L, acc).otherwise(
          when(mark =!= 0xFFL || code === 0xDAL || code === 0xD9L,
            st(off, lit(2L), lit(0L), lit(0L), lit(0L)))
            .when(isSof, st(off, lit(1L),
              beU16At(content, off + 7L),   // [len 2][prec 1][h 2][w 2]
              beU16At(content, off + 5L), code))
            .otherwise(st(off + 2L + beU16At(content, off + 2L),
              lit(0L), lit(0L), lit(0L), lit(0L))))
      })
    when(isJpeg(content) && walked.getField("st") === 1L,
      struct(
        walked.getField("w").as("width"),
        walked.getField("h").as("height"),
        (walked.getField("c") === 0xC2L).as("progressive")))
      .otherwise(lit(null))
  }

  /** Deterministic frame-index sampling for video-shaped rows: an
    * even stride over [0, n_frames) yielding ≤ `maxFrames` indexes,
    * exploded to one row per sampled frame. Pure Column arithmetic —
    * the per-frame EXTRACT plugs in at [[decodeBatch]]; this is the
    * fan-out plumbing (a 2-hour clip explodes to its sample frames on
    * the executor, never materializing every frame). */
  def sampleFrameIdx(nFrames: Column, maxFrames: Int): Column = {
    val stride = greatest(
      floor((nFrames.cast("double") + maxFrames - 1) / maxFrames)
        .cast("long"),
      lit(1L))
    explode(when(nFrames > 0,
      sequence(lit(0L), nFrames.cast("long") - 1, stride))
      .otherwise(array().cast("array<long>")))
  }

  // ----- video (MP4 / ISO-BMFF) — the box-walk leg ----------------

  /** ISO-BMFF signature: an `ftyp` box leads the file (fourcc at
    * bytes 5-8; the first four bytes are its size). */
  val Mp4FtypHex = "66747970"
  def isMp4(content: Column): Column =
    hex(substring(content, 5, 4)) === Mp4FtypHex
  def isMp4Sql(contentExpr: String): String =
    s"substring(hex($contentExpr), 9, 8) = '$Mp4FtypHex'"

  private def beU32At(content: Column, off: Column): Column =
    conv(hex(content.substr(off.cast("int"), lit(4))), 16, 10).cast("long")

  /** Bounded sibling-box scan: walk `[size(BE32)][fourcc]` boxes from
    * `start` (1-based) until `end`, returning the offset of the first
    * box whose fourcc hex equals `fourCcHex`, else NULL. Same fold
    * discipline as [[jpegSofStruct]] (HOF aggregate, bounded steps,
    * state by reference). Extended (size==1) and to-end (size==0)
    * boxes quarantine as unwalkable — `size < 8` is dead. */
  private def boxOffset(content: Column, start: Column, end: Column,
                        fourCcHex: String, maxBoxes: Int): Column = {
    def st(off: Column, s: Column) = struct(off.as("off"), s.as("st"))
    val walked = aggregate(
      sequence(lit(1), lit(maxBoxes)), st(start, lit(0L)),
      (acc, _) => {
        val off = acc.getField("off")
        val size = beU32At(content, off)
        val typ = hex(content.substr((off + 4L).cast("int"), lit(4)))
        when(acc.getField("st") =!= 0L, acc).otherwise(
          when(off >= end || size < 8L, st(off, lit(2L)))
            .when(typ === lit(fourCcHex), st(off, lit(1L)))
            .otherwise(st(off + size, lit(0L))))
      })
    when(walked.getField("st") === 1L, walked.getField("off"))
      .otherwise(lit(null).cast("long"))
  }

  /** MP4 movie-header metadata without a decoder: locate `moov` among
    * the top-level boxes, then `mvhd` among moov's children (each a
    * bounded [[boxOffset]] scan — the two-level analogue of the JPEG
    * segment walk), and read version, timescale, and duration at
    * their version-dependent offsets (v1 carries 64-bit times; its
    * duration reassembles from two BE32 reads). duration_ms is
    * truncated integer scaling, the [[wavDurationMs]] convention.
    *
    * Returns struct(version, timescale, duration, duration_ms) or
    * NULL for anything unwalkable (bad magic, missing moov/mvhd,
    * extended-size boxes, zero timescale) — the shared quarantine
    * posture of this family. */
  def mp4MvhdStruct(content: Column, maxBoxes: Int = 16): Column = {
    require(maxBoxes >= 1 && maxBoxes <= 64,
      s"mp4MvhdStruct maxBoxes must be in [1, 64]: $maxBoxes")
    val fileEnd = length(content).cast("long") + 1L
    val moov = boxOffset(content, lit(1L), fileEnd, MoovHex, maxBoxes)
    val moovEnd = moov + beU32At(content, moov)
    val mvhd = boxOffset(content, moov + 8L, moovEnd, MvhdHex, maxBoxes)
    mvhdAt(content, mvhd)
  }

  private val MoovHex = "6D6F6F76"
  private val MvhdHex = "6D766864"

  /** Read the mvhd fields at a RESOLVED offset column. */
  private def mvhdAt(content: Column, mvhd: Column): Column = {
    val ver = byteAt(content, mvhd + 8L)
    val ts = when(ver === 1L, beU32At(content, mvhd + 28L))
      .otherwise(beU32At(content, mvhd + 20L))
    val dur = when(ver === 1L,
      beU32At(content, mvhd + 32L) * 4294967296L +
        beU32At(content, mvhd + 36L))
      .otherwise(beU32At(content, mvhd + 24L))
    when(isMp4(content) && mvhd.isNotNull && ts > 0L,
      struct(ver.as("version"), ts.as("timescale"), dur.as("duration"),
        ((dur * 1000L) / ts).cast("long").as("duration_ms")))
      .otherwise(lit(null))
  }

  /** [[mp4MvhdStruct]] with PROJECTION BOUNDARIES between the two
    * fold stages — the form query paths must use. As one composed
    * Column, each reference to the moov fold re-inlines the whole
    * 16-step aggregate (moov appears in three places, mvhd in six:
    * the generated code explodes combinatorially and janino pays for
    * it — q_video_meta measured 3.96 s vs 0.39 s for the same-shape
    * JPEG walk). Staging each fold as a withColumn keeps it a slot
    * read: CollapseProject cannot merge the projections because the
    * folds are non-cheap and multiply referenced — the same binding
    * discipline as the int8 scale (r8) and TokenSegments (r9). */
  def withMp4Mvhd(df: DataFrame, contentCol: String, outCol: String,
                  maxBoxes: Int = 16): DataFrame = {
    require(maxBoxes >= 1 && maxBoxes <= 64,
      s"withMp4Mvhd maxBoxes must be in [1, 64]: $maxBoxes")
    val content = col(contentCol)
    val fileEnd = length(content).cast("long") + 1L
    df.withColumn("_moov",
        boxOffset(content, lit(1L), fileEnd, MoovHex, maxBoxes))
      .withColumn("_mvhd",
        boxOffset(content, col("_moov") + 8L,
          col("_moov") + beU32At(content, col("_moov")), MvhdHex, maxBoxes))
      .withColumn(outCol, mvhdAt(content, col("_mvhd")))
      .drop("_moov", "_mvhd")
  }

  /** Average-hash (aHash) perceptual fingerprint: decode, bin pixels
    * into an 8×8 grid by integer floor boundaries (`cell = x·8/w` —
    * true area averaging, NOT an interpolating resize whose boundary
    * sampling is codec-dependent), then bit i is set iff cell i's
    * mean luma STRICTLY exceeds the global mean. The comparison is
    * cross-multiplied exact integer arithmetic over milli-luma sums
    * (`sum_i · N > total · n_i`) — no float mean, no rounding ties —
    * which is what lets a SQL oracle predict the hash analytically
    * for block-structured fixtures. Near-identical images (re-encodes,
    * minor edits) land at small Hamming distance; pair discovery
    * composes with [[graft.ops.Dedup.bucketPairs]] exactly like
    * SimHash.
    *
    * Returns (hash, n_set_bits) per image; None for undecodable
    * inputs (quarantine convention) and for images beyond 2^24 pixels
    * (the exact-compare products stay inside int64: 255000 ·
    * 2^24/64 · 2^24 < 2^63). */
  def aHashBatch(contents: Seq[Array[Byte]],
                 batchSize: Int): Seq[Option[(Long, Int)]] = {
    require(contents.size <= batchSize,
      s"hasher contract: at most $batchSize images per call")
    javax.imageio.ImageIO.setUseCache(false)
    contents.map { b =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          if (w < 8 || h < 8 || w.toLong * h > (1L << 24)) None
          else {
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val sums = new Array[Long](64)
            val cnts = new Array[Long](64)
            var y = 0
            while (y < h) {
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                val c = cy * 8 + x * 8 / w
                sums(c) += lumaMilli(px(y * w + x))
                cnts(c) += 1L
                x += 1
              }
              y += 1
            }
            var total = 0L; var i = 0
            while (i < 64) { total += sums(i); i += 1 }
            val n = w.toLong * h
            var hash = 0L; var nset = 0
            i = 0
            while (i < 64) {
              if (sums(i) * n > total * cnts(i)) {
                hash |= 1L << i; nset += 1
              }
              i += 1
            }
            Some((hash, nset))
          }
        }
      } catch {
        case scala.util.control.NonFatal(_) => None
      }
    }
  }

  final case class HashedImage(file_name: String, phash: Long,
                               n_set_bits: Int)

  /** Batched aHash over a (file_name, content) frame — the same
    * mapPartitions plumbing as [[decodeDataset]]. */
  def aHashDataset(images: DataFrame,
                   batchSize: Int = 64): Dataset[HashedImage] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        batch.zip(aHashBatch(batch.map(_._2), batchSize)).collect {
          case ((name, _), Some((hash, nset))) =>
            HashedImage(name, hash, nset)
        }
      })
  }

  /** Per-partition batch decode — the Spark-side plumbing of a
    * vectorized decoder: rows stream through `mapPartitions` in
    * bounded batches (executor-local, no shuffle; memory bounded by
    * batchSize·imageSize per task), undecodable files drop out, and
    * the output is a typed Dataset. A non-JDK codec would swap in at
    * [[decodeBatch]] only. */
  def decodeDataset(images: DataFrame,
                    batchSize: Int = 64): Dataset[DecodedMeta] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        batch.zip(decodeBatch(batch.map(_._2), batchSize)).collect {
          case ((name, _), Some((w, h, luma))) =>
            DecodedMeta(name, w, h, luma)
        }
      })
  }
}
