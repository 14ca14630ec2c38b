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

  test("diffColumns: per-column attribution, null transitions both " +
    "ways, unchanged rows never surface") {
    val s = spark; import s.implicits._
    val old = Seq(
      (1L, Some("n1"), Some(10.0)),   // unchanged
      (2L, Some("n2"), Some(20.0)),   // balance changes
      (3L, Some("n3"), Some(30.0)),   // name -> null transition
      (4L, None: Option[String], Some(40.0)), // null -> value
      (5L, Some("n5"), Some(50.0)))   // removed
      .toDF("id", "name", "bal")
    val nu = Seq(
      (1L, Some("n1"), Some(10.0)),
      (2L, Some("n2"), Some(21.0)),
      (3L, None: Option[String], Some(30.0)),
      (4L, Some("n4"), Some(40.0)),
      (6L, Some("n6"), Some(60.0)))   // added
      .toDF("id", "name", "bal")
    val out = CorpusDiff.diffColumns(old, nu, Seq("id"),
      Seq("name", "bal")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2))))
      .toMap
    assert(out == Map(
      2L -> ("changed", Some("bal")),
      3L -> ("changed", Some("name")),
      4L -> ("changed", Some("name")),
      5L -> ("removed", None),
      6L -> ("added", None)), s"got: $out")
    assert(!out.contains(1L), "unchanged row leaked")
  }

  test("diffColumns: multi-column changes list columns in caller " +
    "order; an all-null payload row still classifies by membership") {
    val s = spark; import s.implicits._
    val old = Seq((1L, Some("a"), Some(1.0)),
      (2L, None: Option[String], None: Option[Double]))
      .toDF("id", "name", "bal")
    val nu = Seq((1L, Some("b"), Some(2.0)),
      (2L, None: Option[String], None: Option[Double]))
      .toDF("id", "name", "bal")
    val out = CorpusDiff.diffColumns(old, nu, Seq("id"),
      Seq("name", "bal")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2))))
      .toMap
    assert(out == Map(1L -> ("changed", Some("name,bal"))), s"got: $out")
    // id 2: both sides present, all payload null-equal -> unchanged,
    // NOT added/removed (membership flags, not key-null checks)
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
