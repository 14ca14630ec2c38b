package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Calendar arithmetic — SURVEY.md §2.8 F13.
  *
  * The reference computes customer tenure with PostgreSQL
  * `EXTRACT(YEAR FROM age(now, created))*12 + EXTRACT(MONTH FROM age)`
  * (reference: dags/churn_export_dag_cloude.py:348-351). Postgres
  * `age()` counts COMPLETED calendar months with a day-borrow: the raw
  * month difference loses one month when the reference day-of-month is
  * smaller than the created day-of-month.
  *
  * Spark's `floor(months_between(...))` is NOT that function: it
  * special-cases "both dates are the last day of their month" to a
  * whole month. Pin: tenure('2025-02-28' ref, '2024-02-29' created) is
  * 11 under age() semantics (28 < 29 borrows) but 12 under
  * months_between (both last-of-month). DatesSpec asserts the
  * divergence; the engine uses the age() formula below, verified
  * against DuckDB's Postgres-compatible age() in q_tenure_months. */
object Dates {

  /** Completed calendar months from `created` to `ref` (both at date
    * precision), Postgres age() semantics. Pure codegen'd date parts —
    * no interval types. */
  def tenureMonths(ref: Column, created: Column): Column =
    ((year(ref) - year(created)) * 12
      + (month(ref) - month(created))
      - when(dayofmonth(ref) < dayofmonth(created), 1).otherwise(0)
      ).cast("long")
}
