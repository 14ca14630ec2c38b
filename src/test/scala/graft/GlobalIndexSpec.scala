package graft

import graft.ops.GlobalIndex

/** Scalable global row numbering: dense 1..N over key order, exact
  * bucketing on hostile value ranges, and the plan contract that the
  * big-side window is per-bucket, never single-partition. */
class GlobalIndexSpec extends SparkSpec {

  private def assertDense(rows: Seq[(Long, Long)]): Unit = {
    val sorted = rows.sortBy(_._1)
    assert(sorted.map(_._2) == (1L to rows.length.toLong),
      s"index not dense over key order: ${sorted.take(10)}")
  }

  test("index is dense 1..N in key order over a shuffled input") {
    val s = spark; import s.implicits._
    val keys = new scala.util.Random(7).shuffle((100L to 400L).toVector)
    val df = keys.toDF("k").repartition(4)
    val out = GlobalIndex.withGlobalIndex(df, "k", "idx", buckets = 8)
      .select("k", "idx").as[(Long, Long)].collect().toSeq
    assertDense(out)
  }

  test("negative keys and a single-bucket degenerate case") {
    val s = spark; import s.implicits._
    val df = Seq(-50L, -3L, 0L, 7L, 999L).toDF("k")
    assertDense(GlobalIndex.withGlobalIndex(df, "k", "idx", buckets = 1)
      .select("k", "idx").as[(Long, Long)].collect().toSeq)
    assertDense(GlobalIndex.withGlobalIndex(df, "k", "idx", buckets = 64)
      .select("k", "idx").as[(Long, Long)].collect().toSeq)
  }

  test("sparse/skewed value range still totals correctly") {
    val s = spark; import s.implicits._
    // all mass in the first value-bucket plus two far outliers
    val df = ((1L to 300L) ++ Seq(1000000L, 2000000L)).toDF("k")
    assertDense(GlobalIndex.withGlobalIndex(df, "k", "idx", buckets = 16)
      .select("k", "idx").as[(Long, Long)].collect().toSeq)
  }

  test("plan: the big-side window is partitioned, not a global sort") {
    val s = spark; import s.implicits._
    val df = (1L to 1000L).toDF("k")
    val out = GlobalIndex.withGlobalIndex(df, "k", "idx", buckets = 8)
    // the row_number window over the data must carry the bucket in
    // its partition spec; the only unpartitioned window is the
    // <=buckets-row offset prefix sum
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("row_number() windowspecdefinition(_bkt"),
      s"global_idx row_number must be per-bucket, not one partition:\n$plan")
  }
}
