package graft

import org.apache.spark.sql.functions._
import graft.ops.Partitioned

/** P10: run-date partition pruning — the #1 scan lever for the 100 TB
  * fact. Asserts the equality predicate lands in the scan's
  * PartitionFilters (planning-time directory pruning), not just the
  * parquet PushedFilters, and that dynamic overwrite touches only the
  * written partition. */
class PruningSpec extends SparkSpec {

  private def factDf = {
    import spark.implicits._
    Tables.orders(spark, TinySf).select(
      $"o_orderkey", $"o_orderstatus", $"o_totalprice",
      date_format($"o_orderdate", "yyyy-MM").as("run_month"))
  }

  test("partitioned write + slice read prunes at planning time") {
    val dir = java.nio.file.Paths.get(graft.TempRoots.create("graft_prune"))
      .toString + "/fact"
    Partitioned.writeBy(factDf, dir, "run_month")
    val slice = Partitioned.readSlice(spark, dir, "run_month", "1995-03")
    val scan = slice.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters:"), scan.take(500))
    assert(
      scan.linesIterator.exists(l =>
        l.contains("PartitionFilters:") && l.contains("run_month") &&
          l.contains("1995-03")),
      s"run_month=1995-03 not in PartitionFilters:\n${scan.take(1500)}")
    // pruned scan reads strictly fewer files than the full table
    val allFiles = spark.read.parquet(dir).inputFiles.length
    val expected = factDf.filter(col("run_month") === "1995-03")
    assert(rowsAsSet(slice.drop("run_month")) ==
      rowsAsSet(expected.drop("run_month")))
    assert(allFiles > 1, "fixture must span multiple partitions")
  }

  test("dim-filter join prunes fact partitions at RUNTIME (dynamic " +
      "partition pruning)") {
    // The second prune lever beside the static slice read: when the
    // run-date filter lives on a DIMENSION (calendar, release table)
    // rather than on the fact itself, Spark's dynamic partition
    // pruning turns the broadcast dim's build-side values into a
    // partition filter on the fact scan — whole directories skipped
    // at runtime, not just row groups. At 100 TB this is the
    // difference between scanning one month and scanning the table
    // whenever the date predicate arrives via a join.
    val dir = java.nio.file.Paths.get(graft.TempRoots.create("graft_dpp"))
      .toString + "/fact"
    Partitioned.writeBy(factDf, dir, "run_month")
    import spark.implicits._
    val months = factDf.select("run_month").distinct()
      .as[String].collect().sorted
    assert(months.length > 1, "fixture must span multiple partitions")
    // the dim must be a SOURCE with a filter on it (a local relation
    // constant-folds the filter away and DPP sees no selective
    // predicate to reuse)
    val calDir = dir.stripSuffix("/fact") + "/calendar"
    months.zipWithIndex
      .map { case (m, i) => (m, if (i == 0) "closed" else "open") }
      .toSeq.toDF("run_month", "period_status")
      .write.mode("overwrite").parquet(calDir)
    val calendar = spark.read.parquet(calDir)
    val fact = spark.read.parquet(dir)
    val joined = fact
      .join(broadcast(calendar.filter($"period_status" === "closed")),
        "run_month")
    val planned = joined.queryExecution.executedPlan.toString()
    assert(planned.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n${planned.take(2000)}")
    val cols = Seq("run_month", "o_orderkey", "o_orderstatus",
      "o_totalprice", "period_status").map(col)
    val expected = factDf.filter($"run_month" === months.head)
      .withColumn("period_status", lit("closed"))
    assert(rowsAsSet(joined.select(cols: _*)) ==
      rowsAsSet(expected.select(cols: _*)))
  }

  test("dynamic overwrite replaces only the written partition") {
    val dir = java.nio.file.Paths.get(graft.TempRoots.create("graft_dyn"))
      .toString + "/fact"
    Partitioned.writeBy(factDf, dir, "run_month")
    val before = spark.read.parquet(dir).count()
    // rewrite ONE month with a single marker row
    import spark.implicits._
    val marker = Seq((-1L, "X", 0.0, "1995-03"))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "run_month")
    Partitioned.writeBy(marker, dir, "run_month")
    val after = spark.read.parquet(dir)
    val monthBefore = factDf.filter(col("run_month") === "1995-03").count()
    assert(after.filter(col("run_month") === "1995-03").count() == 1)
    assert(after.count() == before - monthBefore + 1,
      "other partitions must be untouched")
  }
}
