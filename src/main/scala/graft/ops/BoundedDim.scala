package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Guard for the "small dim" single-partition window pattern.
  *
  * Combo dims (segment, contract, services…) take dense surrogate keys
  * from `row_number()` over an unpartitioned window — sound ONLY while
  * the distinct-combo cardinality stays far below data size. That
  * boundedness used to be a comment; this makes it executable: the key
  * expression caps at [[MaxCombos]] and raises a loud error pointing at
  * the entity-dim hash path the moment a "small" dim isn't.
  *
  * The cap compiles into the same single pass as the window (a
  * `when(key > max, raise_error(...))` branch), so the guard costs
  * nothing on the happy path — no extra count job, no second scan of
  * the dim input. It fires on the first over-limit key rather than
  * before the window starts, which is the right trade at scale: a
  * pre-count would re-scan the full input on every load to defend
  * against a misuse that should never happen.
  */
object BoundedDim {

  /** Combo dims beyond this are entity-sized by definition. */
  val MaxCombos = 100000L

  /** Wrap a dense surrogate-key expression with the cardinality cap. */
  def cappedKey(key: Column, context: String,
                maxCombos: Long = MaxCombos): Column =
    when(key > maxCombos, raise_error(concat(
      lit(s"$context: dim distinct-combo cardinality exceeded $maxCombos — " +
        "an entity-sized dim must not take keys from a single-partition " +
        "row_number; use the xxhash64 natural-key surrogate path " +
        "(Warehouse.loadEntityDim). Offending key: "),
      key.cast("string"))))
      .otherwise(key)
}
