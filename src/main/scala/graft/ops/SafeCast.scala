package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Safe-cast column builders — SURVEY.md §2.8 F4-F7.
  *
  * The reference guards every numeric cast of a dirty string column
  * with `NULLIF(REGEXP_REPLACE(x, '[^0-9.]', '', 'g'), '')::TYPE`
  * (reference: dags/SQL/Gold/create_load_data_gold.sql:106,117,120) so
  * the literal 'n/a' and stray units collapse to NULL instead of
  * erroring. These builders are pure `Column => Column` functions —
  * they stay inside whole-stage codegen (regexp_replace/nullif/cast are
  * all codegen'd Catalyst expressions; no UDF).
  */
object SafeCast {

  /** Strip every character that cannot appear in an unsigned decimal
    * literal. Spark's regexp_replace replaces globally by default —
    * equivalent to the reference's 'g' flag. */
  def digitsOnly(c: Column): Column =
    regexp_replace(c.cast("string"), "[^0-9.]", "")

  /** Empty-string → NULL (reference F5:
    * dags/SQL/Bronze/insert_data_into_bronze.sql:28). */
  def emptyToNull(c: Column): Column = nullif(c, lit(""))

  /** The full guard: regex-strip, NULLIF '', cast. Relies on
    * ANSI-off / try-semantics so residual garbage ('1.2.3') becomes
    * NULL like Postgres-after-guard, never an error. */
  def safeNumeric(c: Column, to: DataType): Column =
    try_cast(emptyToNull(digitsOnly(c)), to)

  /** Lenient cast without the digit-strip: pandas
    * `to_numeric(errors='coerce')` (reference F16/P8:
    * dags/Reprocessing.py:86-92). */
  def coerce(c: Column, to: DataType): Column = try_cast(c, to)

  private def try_cast(c: Column, to: DataType): Column =
    c.try_cast(to)
}
