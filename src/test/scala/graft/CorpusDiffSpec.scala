package graft

import org.apache.spark.sql.functions._
import graft.ops.CorpusDiff

/** Corpus snapshot diff: hand-checked statuses and the
  * every-id-exactly-one-status invariant on real documents.
  */
class CorpusDiffSpec extends SparkSpec {

  test("hand-checked: added/removed/changed/unchanged") {
    val s = spark; import s.implicits._
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val nu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "t")
    val out = CorpusDiff.diff(old, nu, "id", "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"), s"got: $out")
  }

  test("every id gets exactly one status; rollup masses add up") {
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val v2 = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" x")))
          .otherwise(col("text")).as("text"))
    val d = CorpusDiff.diff(docs, v2, "doc_id", "text").cache()
    assert(d.count() == d.select("doc_id").distinct().count(),
      "an id appeared under two statuses")
    val m = CorpusDiff.summarize(d, "doc_id").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val nOld = docs.count()
    assert(m.getOrElse("removed", 0L) + m.getOrElse("changed", 0L) +
      m.getOrElse("unchanged", 0L) == nOld,
      s"old-side statuses don't cover the old corpus: $m")
    assert(m.getOrElse("added", 0L) == 0L,
      s"no ids were added in this scenario: $m")
  }
}
