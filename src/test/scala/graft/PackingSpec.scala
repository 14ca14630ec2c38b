package graft

import org.apache.spark.sql.functions._
import graft.ops.Packing

/** Context-packing semantics: complete assignment, bounded overflow,
  * doc integrity, and the partitioned (never single-partition) window. */
class PackingSpec extends SparkSpec {

  test("every doc lands in exactly one pack; overflow only by the straddler") {
    val s = spark; import s.implicits._
    // doc sizes 1..400 tokens over 1000 docs, budget 1000, 4 buckets
    val docs = (0L until 1000L).map(i => (i, (i % 400) + 1))
      .toDF("doc_id", "n_tokens")
    val assigned = Packing.assignments(docs, "doc_id", col("n_tokens"),
      budget = 1000L, buckets = 4)
    assert(assigned.count() == 1000L, "packing must not drop or split docs")
    assert(assigned.select("doc_id").distinct().count() == 1000L)
    val packs = assigned.groupBy("pack_bucket", "pack_id")
      .agg(sum("pack_tokens_doc").as("fill"),
        max("pack_tokens_doc").as("biggest"))
      .collect()
    packs.foreach { p =>
      val fill = p.getLong(2); val biggest = p.getLong(3)
      assert(fill < 1000L + biggest,
        s"pack ${p.get(0)}/${p.get(1)} fill $fill exceeds budget+straddler")
    }
    // greedy fill actually packs: mean fill is a decent fraction of
    // budget (docs average ~200 tokens, so packs should sit near 1000)
    val meanFill = packs.map(_.getLong(2)).sum.toDouble / packs.length
    assert(meanFill > 700.0, s"packs underfilled: mean $meanFill")
  }

  test("oversized docs get their own pack") {
    val s = spark; import s.implicits._
    val docs = Seq((0L, 5000L), (4L, 10L), (8L, 10L))
      .toDF("doc_id", "n_tokens") // same bucket (all % 4 == 0)
    val a = Packing.assignments(docs, "doc_id", col("n_tokens"),
      budget = 100L, buckets = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack_id")).toMap
    assert(a(0L) == 0L)
    assert(a(4L) == 50L, "doc after the giant starts past its budget span")
    assert(a(8L) == 50L, "small docs share the next pack")
  }

  test("the packing window is partitioned, never a single global task") {
    val s = spark; import s.implicits._
    val docs = (0L until 100L).map((_, 10L)).toDF("doc_id", "n_tokens")
    val plan = Packing.assignments(docs, "doc_id", col("n_tokens"),
      1000L, 8).queryExecution.executedPlan.toString()
    assert(plan.contains("pack_bucket"), plan.take(500))
    assert(!plan.contains("No Partition Defined"),
      "packing must not fall into the global-window trap")
    val windowLine = plan.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(windowLine.contains("partitionBy") ||
      plan.contains("hashpartitioning(pack_bucket"),
      s"window not partitioned by bucket:\n$windowLine")
  }
}
