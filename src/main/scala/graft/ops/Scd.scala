package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension (SCD2) history — the warehouse
  * twin of the reference's upsert family (SURVEY.md §2.3): where
  * [[Upsert.merge]] keeps only the LATEST state per key, SCD2 keeps
  * every state with its validity interval `[valid_from, valid_to)`,
  * so facts can join the dimension "as of" their own time (the
  * reference's bronze layer overwrites history; an analytics engine
  * serving time-travel joins needs it preserved — reference
  * dags/SQL/Bronze/insert_data_into_bronze.sql:60-77 is the
  * latest-state shape this generalizes).
  *
  * Output schema appended to the key+attr columns:
  * `version` (1-based per key), `valid_from`, `valid_to` (null =
  * open), `is_current` (int 0/1).
  *
  * Scale shape: [[fromChangeLog]] is ONE shuffle on the natural key —
  * both windows (change detection, then interval/version numbering
  * over the filtered change rows) share the same partitioning and
  * ordering, so Catalyst plans a single Exchange and the intervening
  * filter preserves sort order (no second sort; plan-asserted in
  * ScdSpec). [[applyChanges]] is one join on the key — broadcast-able
  * when the incoming batch is small (the common incremental tick);
  * its three output projections read the same join via ReusedExchange
  * rather than re-shuffling.
  */
object Scd {

  /** Build the full SCD2 history from a change log (one row per
    * observed state, e.g. CDC events or periodic snapshots).
    * Consecutive rows with identical `attrs` per key collapse into
    * one version (null-safe comparison — a null attr equals a null
    * attr, differs from any value). Rows at equal `ts` are ordered by
    * `tieBreak` and produce zero-length intervals for the superseded
    * states — instant-superseded versions, the standard CDC
    * convention, rather than nondeterministic winner-picking.
    *
    * @param tieBreak columns making (key, ts, tieBreak) a total order
    *        per key (e.g. the CDC sequence / event id). Flat columns,
    *        not a struct: WindowExec sorts lead with the partition
    *        key, and a struct prefix defeats the sort comparator.
    */
  def fromChangeLog(changes: DataFrame, keys: Seq[String], ts: String,
                    attrs: Seq[String],
                    tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "keys and attrs required")
    val ord = col(ts).asc +: tieBreak.map(col(_).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val state = struct(attrs.map(col): _*)
    changes
      .withColumn("_chg", !(state <=> lag(state, 1).over(w)))
      .filter(col("_chg"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .select(keys.map(col) ++ attrs.map(col) ++ Seq(
        col("version"), col("valid_from"), col("valid_to"),
        col("is_current")): _*)
  }

  /** Point-in-time filter over an SCD2 history: the rows whose
    * interval contains `asOf` — inclusive of `valid_from`, exclusive
    * of `valid_to` (so a version superseded AT `asOf` is not
    * returned, and the zero-length intervals [[fromChangeLog]] emits
    * for same-instant supersessions can never match). A pure per-row
    * predicate: pushes to the scan, prunes `valid_from`-partitioned
    * history layouts. */
  def snapshotAsOf(history: DataFrame, asOf: Column,
                   validFrom: String = "valid_from",
                   validTo: String = "valid_to"): DataFrame =
    history.filter(col(validFrom) <= asOf &&
      (col(validTo).isNull || asOf < col(validTo)))

  /** One incremental SCD2 tick: fold a batch of state snapshots
    * (one row per key: the key's attrs observed at `effectiveTs`)
    * into an existing history.
    *
    *  - key present with a current row, attrs unchanged → no-op;
    *  - attrs changed → the current row closes (`valid_to =
    *    effectiveTs`, `is_current = 0`) and a new open version
    *    (`version + 1`) is appended;
    *  - brand-new key → open version 1;
    *  - already-closed history rows pass through untouched.
    *
    * Re-applying the same batch at the same `effectiveTs` is a no-op
    * (attrs now match current), so a retried tick cannot double-close
    * — the same retry discipline as [[Upsert.replaceByKey]].
    *
    * `dim` must carry the [[fromChangeLog]] output schema; `incoming`
    * needs `keys ++ attrs`. `effectiveTs` must be comparable to
    * `valid_from`'s type and later than every open `valid_from` (the
    * tick is append-only in time; out-of-order corrections are
    * [[fromChangeLog]] rebuilds over the corrected log). */
  def applyChanges(dim: DataFrame, incoming: DataFrame,
                   keys: Seq[String], attrs: Seq[String],
                   effectiveTs: Column): DataFrame = {
    val metaCols = Seq("version", "valid_from", "valid_to", "is_current")
    val outCols = keys ++ attrs ++ metaCols
    require(dim.columns.sameElements(outCols),
      s"dim must carry the SCD2 schema ${outCols.mkString(",")}: " +
        dim.columns.mkString(","))
    val closed = dim.filter(col("is_current") === 0)
    val cur = dim.filter(col("is_current") === 1)
      .withColumn("_e", lit(true))
    val inc = incoming
      .select((keys ++ attrs).map(c => col(c).as(s"_i_$c")): _*)
      .withColumn("_i", lit(true))

    // null-safe key join, same discipline as Upsert.merge
    val joined = cur.join(inc,
      keys.map(k => col(k) <=> col(s"_i_$k")).reduce(_ && _),
      "full_outer")
    val changed = attrs.map(a => !(col(a) <=> col(s"_i_$a")))
      .reduce(_ || _)
    val bothSides = col("_e").isNotNull && col("_i").isNotNull

    // currents that survive unchanged (no incoming, or equal attrs)
    val kept = joined.filter(col("_e").isNotNull &&
        (col("_i").isNull || !changed))
      .select(outCols.map(col): _*)
    // currents superseded by this tick: close the interval
    val nowClosed = joined.filter(bothSides && changed)
      .select(outCols.map {
        case "valid_to"   => effectiveTs.as("valid_to")
        case "is_current" => lit(0).as("is_current")
        case c            => col(c)
      }: _*)
    // the tick's new open versions (superseding or brand-new key)
    val opened = joined.filter(col("_i").isNotNull &&
        (col("_e").isNull || changed))
      .select(outCols.map {
        case "version" =>
          (coalesce(col("version"), lit(0L)) + 1L).as("version")
        case "valid_from" => effectiveTs.as("valid_from")
        case "valid_to" =>
          lit(null).cast(dim.schema("valid_to").dataType).as("valid_to")
        case "is_current" => lit(1).as("is_current")
        case c if keys.contains(c) =>
          coalesce(col(s"_i_$c"), col(c)).as(c)
        case c => col(s"_i_$c").as(c)
      }: _*)

    closed.unionByName(kept).unionByName(nowClosed).unionByName(opened)
  }
}
