package graft

import org.apache.spark.sql.functions._

/** The Tables layer promises plain parquet reads with no barriers, so
  * predicate pushdown and column pruning reach the scan — asserted
  * here on the physical plan, not just documented. */
class PushdownSpec extends SparkSpec {

  private def scanLine(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString()
    plan.linesIterator.find(_.contains("FileScan parquet"))
      .getOrElse(fail(s"no parquet scan in plan:\n${plan.take(800)}"))
  }

  test("filters push down to the lineitem scan") {
    val scan = scanLine(
      Tables.lineitem(spark, TinySf)
        .filter(col("l_quantity") < 10 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_quantity"))
    assert(scan.contains("PushedFilters:"))
    assert(scan.contains("LessThan(l_quantity,10.0)"), scan)
    assert(scan.contains("EqualTo(l_returnflag,R)"), scan)
  }

  test("projection prunes the documents scan to selected columns") {
    val scan = scanLine(
      Tables.documents(spark, TinySf).select("doc_id", "text"))
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      scan)
    assert(!scan.contains("lang"), "unused columns must not be read")
  }

  test("a query-pack plan keeps pruning through expressions") {
    // q_token_stats derives three expression columns from text only:
    // the scan must still read just (doc_id, text)
    val scan = scanLine(graft.queries.TextQueries.tokenStats
      .run(spark, TinySf))
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      scan)
  }
}
