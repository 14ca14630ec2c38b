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
}
