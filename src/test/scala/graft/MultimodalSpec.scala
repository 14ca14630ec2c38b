package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.queries.BinaryQueries

/** Multimodal decode plumbing: the batch-decode hook's schema, batch
  * shape, and undecodable-drop behavior over the real binaryFile
  * fixture — everything a real codec swap would inherit. */
class MultimodalSpec extends SparkSpec {

  test("batch decode: typed output matches header parse; bad files drop") {
    // own copy of the fixture: the shared dir backs oracle queries and
    // must not grow a planted broken file
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString
    (0 until BinaryQueries.NumFiles).foreach { k =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, BinaryQueries.fileName(k)),
        BinaryQueries.pngBytes(k))
    }
    // plant one undecodable file among the PNGs
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "broken.png"),
      "not a png at all".getBytes("UTF-8"))
    val images = Multimodal.readBinaryDir(spark, dir, "*.png")
    val decoded = Multimodal.decodeDataset(images, batchSize = 7)
    val rows = decoded.collect().map(m => m.file_name -> m).toMap
    assert(rows.size == BinaryQueries.NumFiles, "broken file must drop")
    assert(!rows.contains("broken.png"))
    (0 until BinaryQueries.NumFiles).foreach { k =>
      val m = rows(BinaryQueries.fileName(k))
      assert(m.width == 100L + 7L * k)
      assert(m.height == 50L + 13L * k)
      assert(m.mean_luma >= 0 && m.mean_luma < 256)
    }
    // and the Column-level stub agrees with the batch decoder
    val viaExpr = images
      .select(col("file_name"), Multimodal.decodeStub(col("content")).as("d"))
      .filter(col("d").isNotNull)
      .select(col("file_name"), col("d.width"), col("d.height"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaBatch = decoded.collect()
      .map(m => (m.file_name, m.width, m.height)).toSet
    assert(viaExpr == viaBatch)
  }

  test("resize rewrites header dims through the batch plumbing; bad files drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm_rs").toString
    (0 until 5).foreach { k =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, BinaryQueries.fileName(k)),
        BinaryQueries.pngBytes(k))
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "broken.png"), Array[Byte](1, 2, 3))
    val images = Multimodal.readBinaryDir(spark, dir, "*.png")
    val resized = Multimodal.resizeDataset(images, 224L, 224L, batchSize = 3)
    // re-decoding the resized output through the SAME pipeline reads
    // the rewritten dims — the round-trip proves header consistency
    val redecoded = Multimodal.decodeDataset(resized, batchSize = 3).collect()
    assert(redecoded.length == 5, "broken file must drop at resize")
    redecoded.foreach { m =>
      assert(m.width == 224L && m.height == 224L,
        s"${m.file_name}: ${m.width}x${m.height}")
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
}
