package graft

import graft.queries.StarQueries

/** Plan-shape assertions for the star-load family: the composite
  * null-safe dim join must stay a single hash join (EqualNullSafe keys
  * are hash-joinable — a nested-loop fallback would be quadratic), and
  * the star fact load's dim joins must broadcast. */
class StarSpec extends SparkSpec {

  test("null-safe composite dim join plans as ONE hash join, no BNLJ") {
    val df = StarQueries.nullsafeDimJoin.run(spark, TinySf)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"nested-loop fallback in plan:\n${plan.take(1200)}")
    val hashJoins = plan.linesIterator
      .count(l => l.contains("HashJoin"))
    assert(hashJoins == 1, s"expected exactly 1 hash join, got $hashJoins")
    // and the result is right-shaped: every lineitem row lands exactly
    // one service_key
    assert(df.count() > 0)
  }

  test("star fact load broadcasts every dim join") {
    val df = StarQueries.starFactLoad.run(spark, TinySf)
    val plan = df.queryExecution.executedPlan.toString()
    val broadcasts = plan.linesIterator
      .count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 3,
      s"expected >=3 broadcast dim joins, got $broadcasts:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"))
  }
}
