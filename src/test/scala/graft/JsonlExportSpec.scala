package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{JsonlExport, JsonlIngest}

/** JSONL export: same-engine round-trip fidelity (including the
  * characters JSON escaping must handle), byte-stable re-export, and
  * the sharded layout. Cross-engine parse fidelity is the
  * q_jsonl_export oracle's job.
  */
class JsonlExportSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("round-trips quotes, backslashes, newlines, unicode, nulls") {
    val s = spark; import s.implicits._
    val dir = graft.TempRoots
      .create("graft_jsonl_export")
    val rows = Seq(
      (1L, """he said "hi" \ bye"""),
      (2L, "line1\nline2\ttabbed"),
      (3L, "café — 日本語"),
      (4L, null.asInstanceOf[String]),
      (5L, ""))
    val df = rows.toDF("doc_id", "text")
    JsonlExport.write(df, s"$dir/docs", shards = 2, shardBy = "doc_id")
    // cache: Spark disallows raw-file queries whose pruned projection
    // is only the corrupt-record column (the count below would be)
    val back = JsonlIngest.read(spark, s"$dir/docs", schema).cache()
    assert(back.filter(col("_corrupt").isNotNull).count() == 0,
      "export produced lines the ingest reader quarantines")
    val got = back.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getAs[String]("text"))).toSet
    assert(got == rows.toSet, s"round-trip mismatch: $got")
  }

  test("re-export is byte-stable; shard count as requested") {
    val s = spark; import s.implicits._
    val dir = graft.TempRoots
      .create("graft_jsonl_export2")
    val docs = Tables.documents(spark, TinySf)
      .select("doc_id", "text", "lang")
    def bytesOf(path: String): Map[String, String] = {
      val d = new java.io.File(path)
      d.listFiles().filter(_.getName.startsWith("part-"))
        .map { f =>
          val b = java.nio.file.Files.readAllBytes(f.toPath)
          // part file names carry a random UUID; key on content hash
          // position via the in-name split index instead
          f.getName.take(10) -> java.util.Base64.getEncoder
            .encodeToString(java.security.MessageDigest
              .getInstance("MD5").digest(b))
        }.toMap
    }
    JsonlExport.write(docs, s"$dir/a", shards = 4, shardBy = "doc_id")
    JsonlExport.write(docs, s"$dir/b", shards = 4, shardBy = "doc_id")
    val (a, b) = (bytesOf(s"$dir/a"), bytesOf(s"$dir/b"))
    assert(a.size == 4, s"expected 4 shards, found ${a.keySet}")
    assert(a == b, "re-export is not byte-stable")
  }
}
