package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval×point range join — "which points fall inside
  * which time intervals" without an equi-key. Spark plans a bare
  * inequality join as BroadcastNestedLoopJoin (quadratic work even
  * when one side broadcasts, a non-starter once both sides are big).
  *
  * Shape (the 100 TB contract): overlay a fixed bucket grid on the
  * time axis and turn the range predicate into an equi-join —
  *
  *   points:    one row per point, bucket = its grid cell
  *   intervals: exploded to one row per grid cell they overlap
  *   join on the bucket cell, then re-check the exact range predicate
  *
  * Every true (interval, point) pair meets in EXACTLY one cell — the
  * point's — so no dedup pass is needed. The shuffle key is the
  * bucket cell: both sides distribute by time locality instead of a
  * nested loop. Interval replication factor is len/bucketMicros + 1,
  * so pick the grain near the typical interval length: too coarse
  * re-creates per-cell mini nested loops, too fine explodes the
  * interval side. (This is the same trade the Databricks range-join
  * `bin` hint and the classic overlap-interval-join literature make.)
  *
  * Time axis is integer microseconds (`unix_micros`) end-to-end —
  * bucket math is exact integer division, never a double floor.
  * Intervals are half-open [start, end); callers with inclusive ends
  * pass end + 1µs.
  */
object RangeJoin {

  /** Inner range join of `intervals` × `points`: one output row per
    * (interval row, point row) with start <= point < end. All columns
    * of both inputs pass through (names must not collide).
    *
    * @param startCol/endCol interval bounds (TimestampType), half-open
    * @param pointCol        point timestamp (TimestampType)
    * @param bucketMicros    grid grain in microseconds (e.g. 1 hour =
    *                        3_600_000_000L); choose near the typical
    *                        interval length
    * @param maxCellsPerInterval loud guard against pathological rows:
    *                        ONE dirty interval (a '9999-12-31'
    *                        open-end sentinel) would otherwise explode
    *                        `sequence()` into tens of millions of
    *                        in-memory elements and kill the job; an
    *                        interval spanning more cells than this
    *                        raises (same posture as BoundedDim — a
    *                        row that wide is a caller data bug, not a
    *                        row to silently drop)
    */
  def intervalPointJoin(intervals: DataFrame, points: DataFrame,
                        startCol: String, endCol: String,
                        pointCol: String,
                        bucketMicros: Long,
                        maxCellsPerInterval: Long = 100000L): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    require(maxCellsPerInterval > 0,
      s"maxCellsPerInterval must be positive: $maxCellsPerInterval")
    val collisions = intervals.columns.toSet.intersect(points.columns.toSet)
    require(collisions.isEmpty,
      s"interval/point column collision: ${collisions.mkString(", ")}")

    // floor-division in exact integer math (timestamps are positive
    // micros here; `div` truncates toward zero = floor for them)
    def cell(microsExpr: String) = expr(s"($microsExpr) div ${bucketMicros}L")

    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) > col(startCol))
      // in a filter, not a projected column: an unused projection
      // would be pruned and the guard silently vanish
      .filter(
        when(cell(s"unix_micros($endCol) - 1") -
            cell(s"unix_micros($startCol)") + 1 > maxCellsPerInterval,
          raise_error(concat(
            lit(s"interval spans more than $maxCellsPerInterval grid " +
              s"cells (bucketMicros=$bucketMicros): ["),
            col(startCol).cast("string"), lit(", "),
            col(endCol).cast("string"), lit(")"))).cast("boolean"))
          .otherwise(lit(true)))
      .withColumn("_cell", explode(sequence(
        cell(s"unix_micros($startCol)"),
        cell(s"unix_micros($endCol) - 1")))) // half-open end
    val pt = points
      .filter(col(pointCol).isNotNull)
      .withColumn("_cell", cell(s"unix_micros($pointCol)"))

    iv.join(pt, Seq("_cell"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_cell")
  }

  /** Bucketed interval×interval OVERLAP join: pairs with
    * `lStart < rEnd AND rStart < lEnd` (half-open on both sides).
    * Same grid shape as [[intervalPointJoin]], with the overlap
    * twist: an overlapping pair shares EVERY cell both intervals
    * span, so the join would emit it once per shared cell — instead
    * of a distinct pass (a second corpus-sized shuffle), each pair is
    * kept only in its FIRST shared cell, which is exactly the cell
    * where the later-starting interval begins (both intervals
    * provably span it). Dedup becomes a per-row predicate; the plan
    * stays one equi-shuffle plus filters, never a
    * BroadcastNestedLoopJoin and never a distinct.
    *
    * Both sides replicate by len/bucketMicros + 1 — pick the grain
    * near the typical interval length of the DENSER side; the
    * `maxCellsPerInterval` sentinel guard applies to both inputs. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          bucketMicros: Long,
                          maxCellsPerInterval: Long = 100000L): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    require(maxCellsPerInterval > 0,
      s"maxCellsPerInterval must be positive: $maxCellsPerInterval")
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    require(collisions.isEmpty,
      s"left/right column collision: ${collisions.mkString(", ")}")

    def cell(microsExpr: String) = expr(s"($microsExpr) div ${bucketMicros}L")
    def cells(df: DataFrame, s: String, e: String) = df
      .filter(col(s).isNotNull && col(e).isNotNull && col(e) > col(s))
      .filter(
        when(cell(s"unix_micros($e) - 1") - cell(s"unix_micros($s)") + 1
            > maxCellsPerInterval,
          raise_error(concat(
            lit(s"interval spans more than $maxCellsPerInterval grid " +
              s"cells (bucketMicros=$bucketMicros): ["),
            col(s).cast("string"), lit(", "),
            col(e).cast("string"), lit(")"))).cast("boolean"))
          .otherwise(lit(true)))
      .withColumn("_cell", explode(sequence(
        cell(s"unix_micros($s)"), cell(s"unix_micros($e) - 1"))))

    cells(left, lStart, lEnd).join(cells(right, rStart, rEnd), Seq("_cell"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      // first-shared-cell predicate: emit the pair exactly once
      .filter(col("_cell") ===
        greatest(cell(s"unix_micros($lStart)"), cell(s"unix_micros($rStart)")))
      .drop("_cell")
  }
}
