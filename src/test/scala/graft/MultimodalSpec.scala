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

  test("decoder contract rejects oversized batches") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeBatch(Seq.fill(9)(Array[Byte](1)), batchSize = 8)
    }
    assert(e.getMessage.contains("at most 8"))
  }
}
