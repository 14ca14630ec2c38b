package graft

import org.apache.spark.sql.functions._
import graft.ops.Dates

/** F13 month-boundary pin (SURVEY §7.4): the engine's tenure follows
  * Postgres age() month-borrow semantics, which diverges from Spark's
  * floor(months_between) exactly when the reference date is the last
  * day of its month and the created day-of-month is larger. */
class DatesSpec extends SparkSpec {

  private def tenure(ref: String, created: String): Long = {
    import spark.implicits._
    Seq((ref, created)).toDF("r", "c")
      .select(Dates.tenureMonths(to_date($"r"), to_date($"c")).as("t"))
      .head().getLong(0)
  }

  private def mbFloor(ref: String, created: String): Long = {
    import spark.implicits._
    Seq((ref, created)).toDF("r", "c")
      .select(floor(months_between(to_date($"r"), to_date($"c"))).as("t"))
      .head().getLong(0)
  }

  test("the Feb-29 pin: age() borrows where months_between rounds up") {
    assert(tenure("2025-02-28", "2024-02-29") == 11L)
    assert(mbFloor("2025-02-28", "2024-02-29") == 12L,
      "divergence fixture no longer diverges — re-pin")
  }

  test("day-borrow edges match Postgres age() semantics") {
    // values pinned against DuckDB age() (Postgres-compatible)
    assert(tenure("2024-02-29", "2024-01-30") == 0L)
    assert(tenure("2024-02-29", "2024-01-29") == 1L)
    assert(tenure("2024-03-31", "2024-01-31") == 2L)
    assert(tenure("2024-03-30", "2024-01-31") == 1L)
    assert(tenure("2026-08-15", "2024-08-16") == 23L)
    assert(tenure("2026-08-15", "2024-08-15") == 24L)
    assert(tenure("2026-08-15", "2024-02-29") == 29L)
    assert(tenure("2025-03-01", "2025-01-31") == 1L)
    assert(tenure("2026-03-01", "2024-12-31") == 14L)
  }
}
