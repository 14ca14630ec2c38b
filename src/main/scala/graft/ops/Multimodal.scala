package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) columns — opaque bytes + typed metadata.
  *
  * Posture for a 100 TB training-data pipeline: images/audio/video
  * ride as `binary` columns with structured metadata alongside; the
  * engine's job is the PLUMBING — a real binaryFile source, real
  * byte-level metadata extraction (container headers are plain bytes),
  * partition-friendly layout — while pixel/sample DECODING belongs to
  * library code at the edge (no image/audio libs in this environment;
  * see [[decodeStub]]).
  *
  * Byte parsing uses only codegen'd built-ins (`substring` on binary,
  * `hex`, `conv`) — no UDFs, mirrored exactly by the DuckDB oracle.
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

  /** Decode stub: the real pixel decode would run per-partition via a
    * vectorized batch UDF against an imaging library (absent in this
    * container). The deterministic stand-in derives a "mean luminance"
    * from header bytes so downstream plumbing (schema, batching,
    * null-handling for undecodable files) is exercised end to end. */
  def decodeStub(content: Column): Column =
    when(isPng(content),
      struct(
        pngWidth(content).as("width"),
        pngHeight(content).as("height"),
        (beUint32(content, 25) % 256).as("mean_luma_stub")))
      .otherwise(lit(null))

  final case class DecodedMeta(file_name: String, width: Long,
                               height: Long, mean_luma: Double)

  /** STUB decoder body — the ONE function a real imaging library
    * replaces. Contract: receives at most `batchSize` images (decoders
    * amortize setup per batch, the vectorized-UDF shape), returns one
    * Option per input in order (None = undecodable → row dropped, the
    * quarantine-at-decode convention). The stand-in parses the PNG
    * header and derives a deterministic fake luminance. */
  def decodeBatch(contents: Seq[Array[Byte]], batchSize: Int): Seq[Option[(Long, Long, Double)]] = {
    require(contents.size <= batchSize,
      s"decoder contract: at most $batchSize images per call")
    contents.map { b =>
      // be(25) reads bytes 24..27 — a truncated header must return
      // None, not crash the task
      val magicOk = b.length >= 28 &&
        b.take(8).map(x => f"${x & 0xff}%02X").mkString == PngMagicHex
      if (!magicOk) None
      else {
        def be(off: Int) = // 1-based offset like the Column variant
          ((b(off - 1) & 0xffL) << 24) | ((b(off) & 0xffL) << 16) |
            ((b(off + 1) & 0xffL) << 8) | (b(off + 2) & 0xffL)
        Some((be(17), be(21), (be(25) % 256).toDouble))
      }
    }
  }

  /** STUB resize — the batch-contract twin of [[decodeBatch]] for the
    * write path. The header rewrite is REAL byte work (PNG IHDR width
    * at bytes 17-20, height at 21-24, big-endian, rewritten in a
    * copy); only pixel RESAMPLING is stubbed (data bytes pass through
    * untouched, so the output is a header-consistent fixture, not a
    * viewable image — exactly what plumbing tests need). Undecodable
    * input → None, same quarantine convention as decode. */
  def resizeBatch(contents: Seq[Array[Byte]], width: Long, height: Long,
                  batchSize: Int): Seq[Option[Array[Byte]]] = {
    require(contents.size <= batchSize,
      s"resizer contract: at most $batchSize images per call")
    contents.zip(decodeBatch(contents, batchSize)).map {
      case (_, None) => None
      case (b, Some(_)) =>
        val out = b.clone()
        def putBe(off: Int, v: Long): Unit = { // 1-based like beUint32
          out(off - 1) = ((v >> 24) & 0xff).toByte
          out(off) = ((v >> 16) & 0xff).toByte
          out(off + 1) = ((v >> 8) & 0xff).toByte
          out(off + 2) = (v & 0xff).toByte
        }
        putBe(17, width); putBe(21, height)
        Some(out)
    }
  }

  /** Batch resize over a decoded frame — same mapPartitions shape as
    * [[decodeDataset]]; swapping in a real resampler touches only
    * [[resizeBatch]]. */
  def resizeDataset(images: DataFrame, width: Long, height: Long,
                    batchSize: Int = 64): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { batch =>
        batch.zip(resizeBatch(batch.map(_._2), width, height, batchSize))
          .collect { case ((name, _), Some(bytes)) => (name, bytes) }
      }).toDF("file_name", "content")
  }

  /** Deterministic frame-index sampling for video-shaped rows: an
    * even stride over [0, n_frames) yielding ≤ `maxFrames` indexes,
    * exploded to one row per sampled frame. Pure Column arithmetic —
    * the per-frame EXTRACT is the stubbed decoder step; this is the
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

  /** Per-partition batch decode — the Spark-side plumbing of a
    * vectorized decoder, with the codec stubbed: rows stream through
    * `mapPartitions` in bounded batches (executor-local, no shuffle;
    * memory bounded by batchSize·imageSize per task), undecodable
    * files drop out, and the output is a typed Dataset. Swapping in a
    * real decoder touches ONLY [[decodeBatch]]. */
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
