package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Edge-schema normalization — SURVEY.md §2.2 P1, §1.3.
  *
  * The reference canonicalizes inferred CSV headers
  * (`strip().lower().replace(' ','_')`), applies a rename map, and
  * tolerates both missing columns (added as NULL) and extra columns
  * (projected away) so two header dialects land in one fixed layer
  * schema (reference: dags/DataWarehouse.py:615-631,
  * dags/Reprocessing.py:61-67,80-103).
  */
object Normalize {

  def canonName(raw: String): String =
    raw.trim.toLowerCase.replace(" ", "_")

  /** Reference rename map (dags/DataWarehouse.py:618-621). */
  val renameMap: Map[String, String] = Map(
    "customerid"       -> "customer_id",
    "tenure_months"    -> "tenure_in_months",
    "monthly_charges"  -> "monthly_charges_amount")

  def headers(df: DataFrame, renames: Map[String, String] = renameMap): DataFrame = {
    val canon = df.columns.map(canonName)
    df.toDF(canon.toIndexedSeq: _*)
      .withColumnsRenamed(renames.filter { case (k, _) => canon.contains(k) })
  }

  /** Conform to a fixed target schema: missing columns become typed
    * NULLs, extras are dropped, order follows the target (P1 +
    * missing-column tolerance). */
  def conformTo(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(target.fields.toIndexedSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
