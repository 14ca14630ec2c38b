package graft

import org.apache.spark.sql.functions._
import graft.ops.{DerivedView, TableStore}

/** Incrementally-maintained aggregate views: delta-proportional
  * ticks, exactly-once positions inside the view's own commits,
  * loud resync on source rewrites. */
class DerivedViewSpec extends SparkSpec {

  private def tmp() = graft.TempRoots
    .create("graft_dview") + "/t"

  test("ticks fold deltas; position rides in the view's commits") {
    val s = spark; import s.implicits._
    val src = tmp(); val view = tmp()
    TableStore.append(Seq(("a", 1L), ("a", 2L), ("b", 10L))
      .toDF("k", "v"), src)
    assert(DerivedView.tick(spark, src, view,
      Seq("k"), Seq("v")) == Some(1L))
    def state() = TableStore.read(spark, view).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("sum_v"))).toMap
    assert(state() == Map("a" -> (2L, 3L), "b" -> (1L, 10L)))
    // nothing new: no commit
    assert(DerivedView.tick(spark, src, view, Seq("k"), Seq("v")).isEmpty)
    // two more source commits, one tick: both folded
    TableStore.append(Seq(("a", 5L)).toDF("k", "v"), src)
    TableStore.append(Seq(("c", 7L)).toDF("k", "v"), src)
    assert(DerivedView.tick(spark, src, view, Seq("k"), Seq("v")).nonEmpty)
    assert(state() == Map("a" -> (3L, 8L), "b" -> (1L, 10L),
      "c" -> (1L, 7L)))
    // a compaction in the source contributes nothing
    TableStore.compact(spark, src, targetBytes = 1L << 30)
    assert(DerivedView.tick(spark, src, view, Seq("k"), Seq("v")).nonEmpty)
    assert(state() == Map("a" -> (3L, 8L), "b" -> (1L, 10L),
      "c" -> (1L, 7L)))
    // a content REWRITE in the source is loud, never a stale view
    TableStore.overwrite(Seq(("z", 1L)).toDF("k", "v"), src)
    val ex = intercept[IllegalArgumentException] {
      DerivedView.tick(spark, src, view, Seq("k"), Seq("v"))
    }
    assert(ex.getMessage.contains("resync"))
  }

  private def joinState(view: String): Map[(Long, String), Int] = {
    val rows = TableStore.read(spark, view)
      .select("k", "seg").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    rows.groupBy(identity).map { case (k, xs) => k -> xs.length }
  }

  test("tickJoin maintains A ⋈ B under uneven appends, exactly once") {
    val s = spark; import s.implicits._
    val a = tmp(); val b = tmp(); val view = tmp()
    def tick() = DerivedView.tickJoin(spark, a, b, view, "k")
    TableStore.append(Seq((1L, "x1"), (2L, "x2")).toDF("k", "pay"), a)
    // inner join with a side that doesn't exist yet: decline
    assert(tick().isEmpty)
    TableStore.append(Seq((1L, "s1"), (3L, "s3")).toDF("k", "seg"), b)
    assert(tick().nonEmpty)
    assert(joinState(view) == Map((1L, "s1") -> 1))
    // A-only advance, with a compaction that must contribute nothing
    TableStore.append(Seq((3L, "x3"), (1L, "x1b")).toDF("k", "pay"), a)
    TableStore.compact(spark, a, targetBytes = 1L << 30)
    assert(tick().nonEmpty)
    assert(joinState(view) ==
      Map((1L, "s1") -> 2, (3L, "s3") -> 1))
    // both sides advance in ONE tick: ΔA⋈B ∪ A_old⋈ΔB, no pair twice
    TableStore.append(Seq((2L, "s2")).toDF("k", "seg"), b)
    TableStore.append(Seq((2L, "x2b")).toDF("k", "pay"), a)
    assert(tick().nonEmpty)
    assert(joinState(view) == Map((1L, "s1") -> 2, (3L, "s3") -> 1,
      (2L, "s2") -> 2)) // (2,x2) old⋈ΔB + (2,x2b) ΔA⋈B
    // at the head: nothing to do — replaying a tick can never double
    assert(tick().isEmpty)
    assert(tick().isEmpty)
  }

  test("tickMap encodes each source row exactly once") {
    val s = spark; import s.implicits._
    val src = tmp(); val view = tmp()
    def enc(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), (col("v") * 2).as("enc"))
    def tick() = DerivedView.tickMap(spark, src, view, enc)
    assert(tick().isEmpty) // source never committed: nothing to do
    TableStore.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), src)
    assert(tick().nonEmpty)
    // two appends + a compaction, ONE tick: both deltas flow, the
    // layout commit contributes nothing (no re-encode of history)
    TableStore.append(Seq((3L, 30L)).toDF("k", "v"), src)
    TableStore.compact(spark, src, targetBytes = 1L << 30)
    TableStore.append(Seq((1L, 11L)).toDF("k", "v"), src)
    assert(tick().nonEmpty)
    assert(tick().isEmpty) // head
    val out = TableStore.read(spark, view).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq((1L, 20L), (1L, 22L), (2L, 40L), (3L, 60L)))
    // a content rewrite upstream: loud resync, never a stale index
    TableStore.overwrite(Seq((9L, 90L)).toDF("k", "v"), src)
    val ex = intercept[IllegalArgumentException] { tick() }
    assert(ex.getMessage.contains("resync"))
  }

  test("tickJoin positions survive the view's own vacuum") {
    val s = spark; import s.implicits._
    val a = tmp(); val b = tmp(); val view = tmp()
    TableStore.append(Seq((1L, "x")).toDF("k", "pay"), a)
    TableStore.append(Seq((1L, "s")).toDF("k", "seg"), b)
    assert(DerivedView.tickJoin(spark, a, b, view, "k").nonEmpty)
    // several more view commits so the vacuum has a horizon to move
    TableStore.append(Seq((2L, "y")).toDF("k", "pay"), a)
    assert(DerivedView.tickJoin(spark, a, b, view, "k").nonEmpty)
    TableStore.vacuum(spark, view, keepVersions = 1)
    // the checkpoint carried the viewpos marker: a tick at the head
    // still knows it is at the head — replaying from a lost position
    // would double-append the whole history
    assert(DerivedView.tickJoin(spark, a, b, view, "k").isEmpty)
    assert(joinState(view) == Map((1L, "s") -> 1))
  }

  test("tickJoin is loud on source rewrites and column overlap") {
    val s = spark; import s.implicits._
    val a = tmp(); val b = tmp(); val view = tmp()
    TableStore.append(Seq((1L, "x")).toDF("k", "pay"), a)
    TableStore.append(Seq((1L, "s")).toDF("k", "seg"), b)
    assert(DerivedView.tickJoin(spark, a, b, view, "k").nonEmpty)
    // a content rewrite in a source: adds-only deltas can't express
    // the retraction of joined rows — resync, loudly
    TableStore.overwrite(Seq((9L, "z")).toDF("k", "pay"), a)
    val ex = intercept[IllegalArgumentException] {
      DerivedView.tickJoin(spark, a, b, view, "k")
    }
    assert(ex.getMessage.contains("resync"))
    // non-key column collision: the view owns ONE flat schema
    val b2 = tmp(); val view2 = tmp()
    TableStore.append(Seq((1L, "q")).toDF("k", "pay"), b2)
    val ex2 = intercept[IllegalArgumentException] {
      DerivedView.tickJoin(spark, a, b2, view2, "k")
    }
    assert(ex2.getMessage.contains("one flat schema"))
  }
}
