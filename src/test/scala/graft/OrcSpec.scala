package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Orc

/** ORC interchange: value fidelity on the edge cases a text format
  * would stress (null vs empty string, unicode, embedded newlines),
  * the bounded-shard layout, and the pushdown/pruning plan contract
  * that makes a filtered probe over an ORC landing zone footer-cheap.
  */
class OrcSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("tag", StringType)))

  test("round trip keeps null vs empty distinct, unicode and " +
    "newlines byte-exact") {
    val s = spark; import s.implicits._
    val dir = graft.TempRoots.create("graft_orc")
    val rows = Seq(
      (1L, "plain", "a"),
      (2L, "", "b"),                     // empty string is NOT null
      (3L, null.asInstanceOf[String], "c"),
      (4L, "uni é中😀", "d"),
      (5L, "line1\nline2\ttabbed", "e"))
    val df = rows.toDF("id", "text", "tag")
    Orc.write(df, s"$dir/t", shards = 2, shardBy = "id")
    val back = Orc.read(s, s"$dir/t", schema)
    assert(rowsAsSet(back) == rowsAsSet(df))
    assert(back.filter(col("text").isNull).count() == 1)
    assert(back.filter(col("text") === "").count() == 1)
  }

  test("sharded layout: bounded file count, all rows present") {
    val s = spark
    val dir = graft.TempRoots.create("graft_orc")
    val df = Tables.documents(s, TinySf)
      .select(col("doc_id").as("id"), col("text"),
        col("lang").as("tag"))
    Orc.write(df, s"$dir/d", shards = 4, shardBy = "id")
    val files = new java.io.File(s"$dir/d").listFiles()
      .filter(f => f.getName.startsWith("part-"))
    assert(files.length == 4, s"expected 4 shards: ${files.length}")
    assert(Orc.read(s, s"$dir/d", schema).count() == df.count())
  }

  test("plan: predicate pushdown and column pruning reach the ORC scan") {
    val s = spark
    val dir = graft.TempRoots.create("graft_orc")
    val df = Tables.documents(s, TinySf)
      .select(col("doc_id").as("id"), col("text"),
        col("lang").as("tag"))
    Orc.write(df, s"$dir/d", shards = 2, shardBy = "id")
    val probe = Orc.read(s, s"$dir/d", schema)
      .filter(col("id") > 100L).select("id", "tag")
    val plan = probe.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,100)]"),
      plan.take(1500))
    assert(plan.contains("ReadSchema: struct<id:bigint,tag:string>"),
      plan.take(1500))
  }
}
