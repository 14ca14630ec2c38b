package graft

import org.apache.spark.sql.functions._
import graft.ops.SuffStats

/** Sufficient-statistics profiles: hand-checked moments and slope
  * (both signs), merge grouping-invariance, the null-row and
  * constant-x edges, and the one-Exchange profile plan.
  */
class SuffStatsSpec extends SparkSpec {

  private def fin(rows: Seq[(String, Double, Double)]) = {
    val s = spark; import s.implicits._
    val df = rows.toDF("g", "x", "y")
    SuffStats.finalize(
      SuffStats.profile(df, Seq("g"), "x", "y", 2, 2), Seq("g"))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("hand-computed moments and positive slope") {
    val r = fin(Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0)))("a")
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("sx") == 600L)
    assert(r.getAs[Long]("sy") == 1200L)
    assert(r.getAs[String]("sxx_s") == "140000")
    assert(r.getAs[String]("syy_s") == "560000")
    assert(r.getAs[String]("sxy_s") == "280000")
    // slope of the scaled series: y = 2x -> 2.0 in micro
    assert(r.getAs[Long]("slope_micro") == 2000000L)
  }

  test("negative slope keeps its sign through the abs-div route") {
    val r = fin(Seq(("a", 1.0, -2.0), ("a", 2.0, -4.0)))("a")
    assert(r.getAs[Long]("slope_micro") == -2000000L)
  }

  test("constant x yields a null slope, not a division error") {
    val r = fin(Seq(("a", 5.0, 1.0), ("a", 5.0, 9.0)))("a")
    assert(r.isNullAt(r.fieldIndex("slope_micro")))
  }

  test("a half-null row is excluded whole (sums stay in sync)") {
    val s = spark; import s.implicits._
    val df = Seq(
      ("a", Some(1.0), Some(2.0)),
      ("a", Some(9.0), None), // must not contribute its x either
      ("a", None, Some(7.0)))
      .toDF("g", "x", "y")
    val p = SuffStats.profile(df, Seq("g"), "x", "y", 2, 2)
      .collect().head
    assert(p.getAs[Long]("n") == 1L)
    assert(p.getAs[Long]("sx") == 100L)
    assert(p.getAs[Long]("sy") == 200L)
  }

  test("merge: any grouping of batch profiles equals the direct " +
    "whole-data profile") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(300)((s"g${rng.nextInt(3)}",
      rng.nextInt(1000) / 100.0, rng.nextInt(9000) / 100.0))
    val df = rows.toDF("g", "x", "y")
    val direct = SuffStats.finalize(
      SuffStats.profile(df, Seq("g"), "x", "y", 2, 2), Seq("g"))
    val batched = SuffStats.finalize(
      SuffStats.merge(
        (0 until 4).map(i => SuffStats.profile(
          df.filter(abs(hash(col("x"), col("y"))) % 4 === i),
          Seq("g"), "x", "y", 2, 2)).reduce(_ unionByName _),
        Seq("g")),
      Seq("g"))
    assert(rowsAsSet(batched) == rowsAsSet(direct))
  }

  test("plan: profile is ONE hash Exchange (map-side combinable)") {
    val plan = SuffStats.profile(Tables.lineitem(spark, TinySf),
      Seq("l_returnflag"), "l_quantity", "l_extendedprice", 2, 2)
      .queryExecution.executedPlan.toString()
    val hashEx = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected 1 hash Exchange, found $hashEx:\n" +
      plan.take(1500))
    assert(plan.contains("partial_"), plan.take(1500))
  }
}
