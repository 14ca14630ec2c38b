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
    val path = java.nio.file.Paths.get(TempRoots.create("graft-ao")).resolve("layer").toString
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
    val path = java.nio.file.Paths.get(TempRoots.create("graft-ao2")).resolve("layer").toString
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

  test("a crash between the two renames is recovered, never destroyed") {
    val path = java.nio.file.Paths.get(TempRoots.create("graft-ao3")).resolve("layer").toString
    Upsert.atomicOverwrite(frame("v1", 10), path)
    // simulate the crash window: target staged away to .__old__, the
    // new version never published
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".__old__")))
    // a reader-side recovery restores the only copy
    assert(Upsert.recoverCrashedSwap(spark, path))
    assert(spark.read.parquet(path).count() === 10)
    assert(!Upsert.recoverCrashedSwap(spark, path), "recovery is idempotent")
    // and an overwrite arriving straight after a crash also recovers
    // (its own read-modify plan executes after the restore)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".__old__")))
    val merged = frame("v2", 3) // stands in for batch merged onto restored
    Upsert.atomicOverwrite(merged, path)
    assert(spark.read.parquet(path).count() === 3)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".__old__")))
  }
}
