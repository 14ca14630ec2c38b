package graft

import org.apache.spark.sql.functions._
import graft.ops.Upsert
import java.nio.file.Files

/** Crash-safe layer overwrite (SURVEY.md §7.4: plain Parquet has no
  * transactions — a crashed overwrite must never corrupt a layer).
  */
class AtomicOverwriteSpec extends SparkSpec {

  private def frame(tag: String, n: Int) = {
    val s = spark; import s.implicits._
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  test("first write then replace: readers always see a complete layer") {
    val path = Files.createTempDirectory("graft-ao").resolve("layer").toString
    Upsert.atomicOverwrite(frame("v1", 10), path)
    assert(spark.read.parquet(path).agg(count_distinct(col("tag"))).head().getLong(0) === 1)
    Upsert.atomicOverwrite(frame("v2", 20), path)
    val out = spark.read.parquet(path)
    assert(out.count() === 20)
    assert(out.select("tag").distinct().head().getString(0) === "v2")
    // no staging debris left behind
    val parent = new java.io.File(path).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("__tmp__")))
    assert(!parent.exists(_.contains("__old__")))
  }

  test("a write that fails mid-job leaves the existing layer intact") {
    val path = Files.createTempDirectory("graft-ao2").resolve("layer").toString
    Upsert.atomicOverwrite(frame("good", 5), path)
    // a frame whose evaluation throws at write time
    val bomb = frame("bad", 5).withColumn("boom",
      udf((i: Long) => {
        if (i > 2) throw new RuntimeException("evaluation bomb"); i
      }).apply(col("id")))
    intercept[Throwable](Upsert.atomicOverwrite(bomb, path))
    val out = spark.read.parquet(path)
    assert(out.count() === 5)
    assert(out.select("tag").distinct().head().getString(0) === "good")
  }
}
