package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.JsonlIngest

class JsonlSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("meta", StructType(Seq(
      StructField("lang", StringType))))))

  private def write(lines: Seq[String]): String = {
    val dir = java.nio.file.Paths.get(graft.TempRoots.create("graft_jsonl"))
    java.nio.file.Files.write(dir.resolve("d.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    s"$dir/d.jsonl"
  }

  test("explicit nested schema parses; malformed lines quarantine with raw text") {
    val path = write(Seq(
      """{"doc_id": 1, "text": "a", "meta": {"lang": "en"}}""",
      """{"doc_id": 2, "text": "b"}""", // missing meta -> null, NOT corrupt
      """{"doc_id": 3, "text": "trunca""", // truncated -> corrupt
      "garbage line"))
    val df = JsonlIngest.read(spark, path, schema)
    val good = df.filter(col("_corrupt").isNull)
    // NB: good.count() would trip QUERY_ONLY_CORRUPT_RECORD_COLUMN
    // (pruning leaves only the filter's corrupt column) — exactly the
    // caveat JsonlIngest.read documents; keep a data column in play
    assert(good.select("doc_id").collect().length == 2)
    assert(good.select("meta.lang").collect().map(_.getString(0)).toSet
      == Set("en", null))
    val bad = df.filter(col("_corrupt").isNotNull)
      .select("_corrupt", "doc_id").collect()
    assert(bad.length == 2, "both malformed lines must quarantine")
    assert(bad.forall(_.isNullAt(1)), "corrupt rows carry no data fields")
    assert(bad.map(_.getString(0)).toSet ==
      Set("""{"doc_id": 3, "text": "trunca""", "garbage line"),
      "quarantine must preserve the raw line for reprocessing")
  }

  test("a schema colliding with the corrupt column is rejected") {
    val e = intercept[IllegalArgumentException](JsonlIngest.read(
      spark, "/nonexistent", schema.add("_corrupt", StringType)))
    assert(e.getMessage.contains("_corrupt"))
  }
}
