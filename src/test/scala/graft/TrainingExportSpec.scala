package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Chunking, JsonlIngest, Sampling, TextOps}
import graft.pipeline.TrainingExport

/** Training-export composition: the written shards contain exactly
  * the chunks the pipeline stages say, each exactly once; re-runs are
  * byte-stable; shard routing matches the seeded hash.
  */
class TrainingExportSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("shard", IntegerType),
    StructField("doc_id", LongType),
    StructField("chunk_id", IntegerType),
    StructField("chunk_text", StringType)))

  test("written shards = the composed stages, every chunk exactly once") {
    val dir = graft.TempRoots
      .create("graft_texport")
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    TrainingExport.run(spark, docs, s"$dir/out",
      minQualityMilli = 800L, langs = Seq("en"),
      chunkSize = 32, overlap = 8, seed = "spec-0", numShards = 3)
    val back = JsonlIngest.read(spark, s"$dir/out/shard_dir=*", schema)
      .cache()
    assert(back.filter(col("_corrupt").isNotNull).count() == 0,
      "export wrote lines its own reader quarantines")
    // recompose the expectation from the individually-proven stages
    val clean = docs.filter(
      TextOps.qualityMilli(col("text")) >= 800L &&
        TextOps.predictedLang(col("text")) === "en")
    val expected = Chunking.chunk(clean, "text", Seq("doc_id"), 32, 8)
      .withColumn("_k",
        col("doc_id") * TrainingExport.KeyStride + col("chunk_id"))
      .withColumn("shard", Sampling.shardOf(col("_k"), "spec-0", 3))
      .select("shard", "doc_id", "chunk_id", "chunk_text")
    assert(rowsAsSet(back.select("shard", "doc_id", "chunk_id",
      "chunk_text")) == rowsAsSet(expected),
      "written shard contents differ from the composed stages")
    assert(back.count() ==
      back.select("doc_id", "chunk_id").distinct().count(),
      "a chunk was written more than once")
  }

  test("re-export is byte-stable across runs") {
    val dir = graft.TempRoots
      .create("graft_texport2")
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    def digest(path: String): Map[String, String] = {
      val base = new java.io.File(path)
      base.listFiles().filter(_.getName.startsWith("shard_dir="))
        .flatMap { d =>
          d.listFiles().filter(_.getName.startsWith("part-")).map { f =>
            val b = java.nio.file.Files.readAllBytes(f.toPath)
            d.getName -> java.util.Base64.getEncoder.encodeToString(
              java.security.MessageDigest.getInstance("MD5").digest(b))
          }
        }.toMap
    }
    TrainingExport.run(spark, docs, s"$dir/a", 800L, Seq("en"),
      32, 8, "spec-0", 3)
    TrainingExport.run(spark, docs, s"$dir/b", 800L, Seq("en"),
      32, 8, "spec-0", 3)
    val (a, b) = (digest(s"$dir/a"), digest(s"$dir/b"))
    assert(a.nonEmpty, "no shard files written")
    assert(a == b, "re-export is not byte-stable")
  }
}
