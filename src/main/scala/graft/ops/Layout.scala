package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout clustering for multi-dimensional data
  * skipping — a beyond-reference scale extension (SURVEY.md §7.5).
  *
  * At 100 TB the scan you never run is the cheapest: parquet readers
  * prune whole files from footer min/max stats, but a file layout
  * sorted on ONE column makes every OTHER column's min/max span the
  * full domain — a two-column probe still touches every file. Bit-
  * interleaving the (normalized) dimensions into one z-value and
  * clustering files by z bounds EVERY interleaved dimension per file,
  * so multi-dimensional probes prune (the same reason lakehouse
  * OPTIMIZE clusters by space-filling curves).
  *
  * Everything here is exact integer arithmetic — shifts, masks and
  * integer division only — so the skipping evidence is bit-identical
  * cross-engine (the same design rule as the milli-proportion drift
  * signal and the integer-micros interval family: no float in a
  * cross-engine contract).
  *
  * Scale shape: [[zValue]] is a pure per-row codegen expression (no
  * shuffle); [[writeZOrdered]] is one range Exchange on the z-key —
  * the sanctioned layout-write pattern (sampled range boundaries +
  * in-partition sort), NOT a global sort into one partition; the
  * skipping-evidence math ([[fileOf]] + per-file min/max aggregate)
  * is a per-row expression plus one hash aggregate.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative longs:
    * bit i of `a` lands at z-bit 2i+1, bit i of `b` at 2i (a is the
    * major dimension). Out-of-range inputs raise rather than silently
    * alias distant rows into one cell (the TrainingExport in-
    * expression-assert precedent: a pruned guard is no guard).
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue bits must be in [1,31]: $bits")
    val lim = 1L << bits
    def guarded(c: Column, name: String): Column =
      when(c.isNull || c < 0 || c >= lim,
        raise_error(concat(
          lit(s"zValue: $name outside [0, $lim): "), c.cast("string"))))
        .otherwise(c)
    val ga = guarded(a, "a")
    val gb = guarded(b, "b")
    (0 until bits).map { i =>
      shiftleft(shiftright(ga, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(gb, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** Normalize a value in [0, maxV] onto the dense [0, 2^bits) grid:
    * `v * 2^bits div (maxV+1)`. Interleaving RAW values with unequal
    * ranges wastes the curve (the wider dimension's high bits dominate
    * every split); normalizing first gives each dimension equal say in
    * the file boundaries. Exact: v ≤ maxV ⇒ result < 2^bits.
    *
    * Floor division spelled `(x - x mod d) / d`: the Column `/` is
    * DOUBLE division, and `floor(x / d)` can land one off when the
    * true quotient sits just under an integer — but here the dividend
    * is exactly divisible, so the correctly-rounded IEEE quotient IS
    * the integer (x < 2^52 by the headroom require below).
    */
  def normalize(v: Column, maxV: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"normalize bits must be in [1,20]: $bits")
    require(maxV >= 0, s"normalize maxV must be >= 0: $maxV")
    require(maxV <= (1L << (52 - bits)) - 2,
      s"normalize maxV too large for exact-division headroom: $maxV")
    val num = shiftleft(v, bits)
    val d = lit(maxV + 1)
    ((num - num % d) / d).cast("long")
  }

  /** File id = top `fileBits` bits of a `totalBits`-wide key: equal
    * key-RANGE files (the footer-stats model), a pure per-row shift —
    * no global rank, no sampled boundaries, deterministic cross-engine.
    */
  def fileOf(key: Column, totalBits: Int, fileBits: Int): Column = {
    require(fileBits >= 1 && fileBits < totalBits,
      s"fileOf needs 1 <= fileBits < totalBits: $fileBits / $totalBits")
    shiftright(key, totalBits - fileBits)
  }

  /** Production layout write: cluster parquet files by z. One range
    * Exchange (sampled boundaries) + in-partition sort + write — the
    * plan a lakehouse OPTIMIZE-by-curve runs; never a single-partition
    * global sort. Files then carry tight min/max on every interleaved
    * dimension.
    */
  def writeZOrdered(df: DataFrame, path: String, aCol: String, bCol: String,
                    bits: Int, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    df.withColumn("_z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
