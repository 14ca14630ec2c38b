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

  /** Real multimodal metadata: binaryFile scan → PNG header parse
    * (width/height from IHDR bytes) → frame-sampling explode (one row
    * per sampled frame with its byte offset) — the partition/batch
    * shape of a media pipeline, with the codec stubbed
    * ([[Multimodal.decodeStub]]). */
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

  def all: Seq[GQuery] = Seq(binaryMeta, fileLedger)
}
