package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Layout

/** Z-order layout clustering + multi-dimensional skipping evidence
  * (SURVEY.md §7.5 beyond-reference; `ops/Layout.scala`).
  *
  * The compared surface is ALL integer: normalized 10-bit dimensions,
  * the 20-bit Morton interleave (generated term-by-term in both
  * engines), equal-z-range file ids by top-bit shift, per-file raw
  * min/max stats, and a 4×4 probe grid with integer-division
  * boundaries. The oracle rebuilds the entire construction from the
  * parquet source — no engine value is trusted.
  *
  * Two queries: [[zorderKey]] pins the per-row z-value itself (sum is
  * order-free and row-exact); [[zorderSkipping]] pins the operational
  * claim — on two-dimensional probes a z-clustered layout touches
  * fewer files/rows than a one-dimensional layout, measured with the
  * footer-min/max pruning model actual parquet readers use.
  */
object LayoutQueries extends QueryPack {

  private val Bits = 10     // per-dimension grid: [0, 1024)
  private val FileBits = 5  // 32 equal-z-range files

  /** DuckDB mirror of [[Layout.zValueN]] over already-normalized
    * expressions — one `(bit << pos)` term per (bit, dim), OR-folded;
    * dim 0 is the major dimension, matching the engine's layout. */
  private def interleaveSqlN(exprs: Seq[String], bits: Int): String = {
    val d = exprs.length
    (for {
      i <- 0 until bits
      (e, j) <- exprs.zipWithIndex
    } yield s"((($e >> $i) & 1) << ${i * d + (d - 1 - j)})")
      .mkString(" | ")
  }

  private def interleaveSql(a: String, b: String): String =
    interleaveSqlN(Seq(a, b), Bits)

  /** Shared oracle scaffolding: normalized dims + z per lineitem row.
    * `// (ma + 1)` is DuckDB integer division — exact, like the
    * engine's mod-subtract floor division in [[Layout.normalize]]. */
  private def zCte: String = s"""
    WITH mx AS (
      SELECT MAX(l_orderkey) AS ma, MAX(l_partkey) AS mb FROM lineitem),
    nrm AS (
      SELECT l_orderkey AS a, l_partkey AS b,
             (l_orderkey * ${1 << Bits}) // (ma + 1) AS an,
             (l_partkey * ${1 << Bits}) // (mb + 1) AS bn
      FROM lineitem, mx),
    zz AS (SELECT a, b, an, bn, (${interleaveSql("an", "bn")}) AS z
           FROM nrm)"""

  /** Null-safe gate-scalar read: MAX over a zero-row table is NULL,
    * and a key domain of [0,0] normalizes every (nonexistent) row to
    * bucket 0 — the honest empty-input layout. */
  private def nzMax(r: org.apache.spark.sql.Row, i: Int): Long =
    if (r.isNullAt(i)) 0L else r.getLong(i)

  /** Engine scaffolding twin: lineitem with an/bn/z columns. The two
    * max values are tiny gate scalars (one 2-column agg row), same
    * driver-metadata posture as the IVF codebook. */
  private def withZ(s: org.apache.spark.sql.SparkSession, d: String) = {
    val li = Tables.lineitem(s, d).select(
      col("l_orderkey").cast("long").as("a"),
      col("l_partkey").cast("long").as("b"))
    val r = li.agg(max("a"), max("b")).head()
    val (maxA, maxB) = (nzMax(r, 0), nzMax(r, 1))
    val z = li
      .withColumn("an", Layout.normalize(col("a"), maxA, Bits))
      .withColumn("bn", Layout.normalize(col("b"), maxB, Bits))
      .withColumn("z", Layout.zValue(col("an"), col("bn"), Bits))
    (z, maxA, maxB)
  }

  /** Per-file z digest: row-exact pin of the interleave expression
    * (SUM(z) is order-free and catches any single-bit divergence) and
    * of the equal-range file split. */
  val zorderKey = GQuery(
    "q_zorder_key",
    (s, d) => {
      val (z, _, _) = withZ(s, d)
      z.withColumn("file_id", Layout.fileOf(col("z"), 2 * Bits, FileBits))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n"), sum("z").as("z_sum"),
          min("z").as("z_min"), max("z").as("z_max"))
        .orderBy("file_id")
    },
    Some(s"""
      $zCte
      SELECT (z >> ${2 * Bits - FileBits}) AS file_id, COUNT(*) AS n,
             CAST(SUM(z) AS BIGINT) AS z_sum,
             MIN(z) AS z_min, MAX(z) AS z_max
      FROM zz GROUP BY file_id ORDER BY file_id
    """),
    eager = true)

  /** Files/rows touched by each probe of a 4×4 grid under the two
    * layouts. The pruning model is the parquet footer's: a file is
    * touched iff its [min,max] box overlaps the probe box on EVERY
    * probed column. The z layout must win on two-dimensional probes
    * (asserted in LayoutSpec; the oracle pins the exact counts). */
  val zorderSkipping = GQuery(
    "q_zorder_skipping",
    (s, d) => {
      val (z, maxA, maxB) = withZ(s, d)
      val zFiles = z
        .withColumn("file_id", Layout.fileOf(col("z"), 2 * Bits, FileBits))
        .withColumn("layout", lit("zorder"))
      val linFiles = z
        .withColumn("file_id", Layout.fileOf(col("an"), Bits, FileBits))
        .withColumn("layout", lit("linear"))
      val stats = zFiles.unionByName(linFiles)
        .groupBy("layout", "file_id")
        .agg(min("a").as("mina"), max("a").as("maxa"),
          min("b").as("minb"), max("b").as("maxb"),
          count(lit(1)).as("n"))
      val probes = s.range(16).toDF("probe_id")
        .withColumn("loa", expr(s"((probe_id % 4) * ${maxA + 1}) div 4"))
        .withColumn("hia", expr(s"((probe_id % 4 + 1) * ${maxA + 1}) div 4 - 1"))
        .withColumn("lob", expr(s"((probe_id div 4) * ${maxB + 1}) div 4"))
        .withColumn("hib", expr(s"((probe_id div 4 + 1) * ${maxB + 1}) div 4 - 1"))
      val hit = col("maxa") >= col("loa") && col("mina") <= col("hia") &&
        col("maxb") >= col("lob") && col("minb") <= col("hib")
      stats.crossJoin(broadcast(probes))
        .groupBy("layout", "probe_id")
        .agg(sum(when(hit, 1L).otherwise(0L)).as("files_touched"),
          sum(when(hit, col("n")).otherwise(0L)).as("rows_scanned"))
        .orderBy("layout", "probe_id")
    },
    Some(s"""
      $zCte,
      files AS (
        SELECT 'zorder' AS layout, (z >> ${2 * Bits - FileBits}) AS file_id,
               MIN(a) AS mina, MAX(a) AS maxa,
               MIN(b) AS minb, MAX(b) AS maxb, COUNT(*) AS n
        FROM zz GROUP BY 1, 2
        UNION ALL
        SELECT 'linear', (an >> ${Bits - FileBits}),
               MIN(a), MAX(a), MIN(b), MAX(b), COUNT(*)
        FROM zz GROUP BY 1, 2),
      probes AS (
        SELECT p AS probe_id,
               ((p % 4) * (ma + 1)) // 4 AS loa,
               ((p % 4 + 1) * (ma + 1)) // 4 - 1 AS hia,
               ((p // 4) * (mb + 1)) // 4 AS lob,
               ((p // 4 + 1) * (mb + 1)) // 4 - 1 AS hib
        FROM range(16) t(p), mx)
      SELECT layout, probe_id,
             CAST(SUM(CASE WHEN maxa >= loa AND mina <= hia
                            AND maxb >= lob AND minb <= hib
                      THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
             CAST(SUM(CASE WHEN maxa >= loa AND mina <= hia
                            AND maxb >= lob AND minb <= hib
                      THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
      FROM files CROSS JOIN probes
      GROUP BY layout, probe_id
      ORDER BY layout, probe_id
    """),
    eager = true)

  /** Three-dimensional z digest ([[Layout.zValueN]]): lineitem's
    * (orderkey, partkey, suppkey) each normalized to a 6-bit grid and
    * interleaved into an 18-bit z, per-file sums/extremes pinned
    * row-exactly — the N-dim generalization gated with the same
    * order-free digest contract as the 2-D key. */
  val zorder3Key = GQuery(
    "q_zorder3_key",
    (s, d) => {
      val B3 = 6
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("a"),
        col("l_partkey").cast("long").as("b"),
        col("l_suppkey").cast("long").as("c"))
      val r = li.agg(max("a"), max("b"), max("c")).head()
      val z3 = li
        .withColumn("an", Layout.normalize(col("a"), nzMax(r, 0), B3))
        .withColumn("bn", Layout.normalize(col("b"), nzMax(r, 1), B3))
        .withColumn("cn", Layout.normalize(col("c"), nzMax(r, 2), B3))
        .withColumn("z", Layout.zValueN(
          Seq(col("an"), col("bn"), col("cn")), B3))
      z3.withColumn("file_id", Layout.fileOf(col("z"), 3 * B3, FileBits))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n"), sum("z").as("z_sum"),
          min("z").as("z_min"), max("z").as("z_max"))
        .orderBy("file_id")
    },
    Some(s"""
      WITH mx AS (
        SELECT MAX(l_orderkey) AS ma, MAX(l_partkey) AS mb,
               MAX(l_suppkey) AS mc
        FROM lineitem),
      nrm AS (
        SELECT (l_orderkey * 64) // (ma + 1) AS an,
               (l_partkey * 64) // (mb + 1) AS bn,
               (l_suppkey * 64) // (mc + 1) AS cn
        FROM lineitem, mx),
      zz AS (SELECT (${interleaveSqlN(Seq("an", "bn", "cn"), 6)}) AS z
             FROM nrm)
      SELECT (z >> ${3 * 6 - FileBits}) AS file_id, COUNT(*) AS n,
             CAST(SUM(z) AS BIGINT) AS z_sum,
             MIN(z) AS z_min, MAX(z) AS z_max
      FROM zz GROUP BY file_id ORDER BY file_id
    """),
    eager = true)

  /** Files/rows touched by each probe of a 2×2×2 grid under a 3-D
    * z-clustered layout vs a one-dimensional layout — the operational
    * evidence for [[Layout.writeZOrderedN]] beyond two dimensions,
    * with the same footer-min/max pruning model: a file is touched iff
    * its [min,max] box overlaps the probe box on EVERY probed column.
    * LayoutSpec asserts the win; the oracle pins the exact counts. */
  val zorder3Skipping = GQuery(
    "q_zorder3_skipping",
    (s, d) => {
      val B3 = 6
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("a"),
        col("l_partkey").cast("long").as("b"),
        col("l_suppkey").cast("long").as("c"))
      val r = li.agg(max("a"), max("b"), max("c")).head()
      val (maxA, maxB, maxC) = (nzMax(r, 0), nzMax(r, 1), nzMax(r, 2))
      val z3 = li
        .withColumn("an", Layout.normalize(col("a"), maxA, B3))
        .withColumn("bn", Layout.normalize(col("b"), maxB, B3))
        .withColumn("cn", Layout.normalize(col("c"), maxC, B3))
        .withColumn("z", Layout.zValueN(
          Seq(col("an"), col("bn"), col("cn")), B3))
      val zFiles = z3
        .withColumn("file_id", Layout.fileOf(col("z"), 3 * B3, FileBits))
        .withColumn("layout", lit("zorder"))
      val linFiles = z3
        .withColumn("file_id", Layout.fileOf(col("an"), B3, 5))
        .withColumn("layout", lit("linear"))
      val stats = zFiles.unionByName(linFiles)
        .groupBy("layout", "file_id")
        .agg(min("a").as("mina"), max("a").as("maxa"),
          min("b").as("minb"), max("b").as("maxb"),
          min("c").as("minc"), max("c").as("maxc"),
          count(lit(1)).as("n"))
      val probes = s.range(8).toDF("probe_id")
        .withColumn("loa", expr(s"((probe_id % 2) * ${maxA + 1}) div 2"))
        .withColumn("hia", expr(s"((probe_id % 2 + 1) * ${maxA + 1}) div 2 - 1"))
        .withColumn("lob", expr(s"((probe_id div 2 % 2) * ${maxB + 1}) div 2"))
        .withColumn("hib", expr(s"((probe_id div 2 % 2 + 1) * ${maxB + 1}) div 2 - 1"))
        .withColumn("loc", expr(s"((probe_id div 4) * ${maxC + 1}) div 2"))
        .withColumn("hic", expr(s"((probe_id div 4 + 1) * ${maxC + 1}) div 2 - 1"))
      val hit = col("maxa") >= col("loa") && col("mina") <= col("hia") &&
        col("maxb") >= col("lob") && col("minb") <= col("hib") &&
        col("maxc") >= col("loc") && col("minc") <= col("hic")
      stats.crossJoin(broadcast(probes))
        .groupBy("layout", "probe_id")
        .agg(sum(when(hit, 1L).otherwise(0L)).as("files_touched"),
          sum(when(hit, col("n")).otherwise(0L)).as("rows_scanned"))
        .orderBy("layout", "probe_id")
    },
    Some(s"""
      WITH mx AS (
        SELECT MAX(l_orderkey) AS ma, MAX(l_partkey) AS mb,
               MAX(l_suppkey) AS mc
        FROM lineitem),
      nrm AS (
        SELECT l_orderkey AS a, l_partkey AS b, l_suppkey AS c,
               (l_orderkey * 64) // (ma + 1) AS an,
               (l_partkey * 64) // (mb + 1) AS bn,
               (l_suppkey * 64) // (mc + 1) AS cn
        FROM lineitem, mx),
      zz AS (SELECT a, b, c, an,
                    (${interleaveSqlN(Seq("an", "bn", "cn"), 6)}) AS z
             FROM nrm),
      files AS (
        SELECT 'zorder' AS layout, (z >> ${3 * 6 - FileBits}) AS file_id,
               MIN(a) AS mina, MAX(a) AS maxa,
               MIN(b) AS minb, MAX(b) AS maxb,
               MIN(c) AS minc, MAX(c) AS maxc, COUNT(*) AS n
        FROM zz GROUP BY 1, 2
        UNION ALL
        SELECT 'linear', (an >> 1),
               MIN(a), MAX(a), MIN(b), MAX(b), MIN(c), MAX(c), COUNT(*)
        FROM zz GROUP BY 1, 2),
      probes AS (
        SELECT p AS probe_id,
               ((p % 2) * (ma + 1)) // 2 AS loa,
               ((p % 2 + 1) * (ma + 1)) // 2 - 1 AS hia,
               ((p // 2 % 2) * (mb + 1)) // 2 AS lob,
               ((p // 2 % 2 + 1) * (mb + 1)) // 2 - 1 AS hib,
               ((p // 4) * (mc + 1)) // 2 AS loc,
               ((p // 4 + 1) * (mc + 1)) // 2 - 1 AS hic
        FROM range(8) t(p), mx)
      SELECT layout, probe_id,
             CAST(SUM(CASE WHEN maxa >= loa AND mina <= hia
                            AND maxb >= lob AND minb <= hib
                            AND maxc >= loc AND minc <= hic
                      THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
             CAST(SUM(CASE WHEN maxa >= loa AND mina <= hia
                            AND maxb >= lob AND minb <= hib
                            AND maxc >= loc AND minc <= hic
                      THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
      FROM files CROSS JOIN probes
      GROUP BY layout, probe_id
      ORDER BY layout, probe_id
    """),
    eager = true)

  /** Hilbert-curve twin of [[zorderKey]]: per-file digest of the
    * Hilbert distance over the same normalized (an, bn) grid — pins
    * [[graft.functions.HilbertIndex]]'s whole per-level walk
    * row-exactly against the oracle's unrolled CTE replay
    * ([[Layout.hilbertLevelsSql]]): any divergence in a quadrant
    * offset, a flip bound, or a swap moves SUM(h). */
  val hilbertKey = GQuery(
    "q_hilbert_key",
    (s, d) => {
      val (z, _, _) = withZ(s, d)
      z.withColumn("h", Layout.hilbertValue(col("an"), col("bn"), Bits))
        .withColumn("file_id", Layout.fileOf(col("h"), 2 * Bits, FileBits))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n"), sum("h").as("h_sum"),
          min("h").as("h_min"), max("h").as("h_max"))
        .orderBy("file_id")
    },
    Some {
      val (levels, fin) = Layout.hilbertLevelsSql(
        "zz", "an", "bn", carry = Seq("a", "b"), bits = Bits)
      s"""
      $zCte,
      $levels
      SELECT (hd >> ${2 * Bits - FileBits}) AS file_id, COUNT(*) AS n,
             CAST(SUM(hd) AS BIGINT) AS h_sum,
             MIN(hd) AS h_min, MAX(hd) AS h_max
      FROM $fin GROUP BY file_id ORDER BY file_id
    """},
    eager = true)

  private val HBits = 8   // 256² grid for the curve comparison
  private val HFiles = 32 // equal-COUNT files along each curve
  private val HGrid = 8   // 8×8 probe boxes

  /** Hilbert vs Morton skipping under PRODUCTION file splits. The
    * decisive detail: with dyadic top-bit file ranges ([[fileOf]])
    * every Morton file is an axis-aligned rectangle too, and the
    * curves tie exactly — measured, not assumed. What a layout write
    * actually produces ([[Layout.writeHilbert]]'s repartitionByRange)
    * is equal-COUNT splits at arbitrary curve offsets, and there
    * Morton's quadrant-seam jumps hand some files two far-apart
    * rectangles (wide min/max boxes) while the seam-continuous
    * Hilbert walk keeps every file compact — 47 vs 64 files touched
    * on a 4×4 probe grid at sf0.01, 123 vs 180 on the 8×8 grid gated
    * here (LayoutSpec asserts the aggregate win; the oracle pins
    * every count).
    *
    * Determinism/scale shape: file boundaries are computed at curve-
    * CELL granularity — per-cell counts, then an exclusive prefix sum
    * over ≤ 4^[[HBits]] cells (the GlobalIndex bounded-prefix
    * posture: the window sees grid-sized metadata, never row-scale
    * data) and `file = rows_before · F div n` — so the split is
    * tie-free, identical cross-engine, and needs no sampling. */
  val hilbertSkipping = GQuery(
    "q_hilbert_skipping",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("a"),
        col("l_partkey").cast("long").as("b"))
      val r = li.agg(max("a"), max("b"), count(lit(1))).head()
      val (maxA, maxB) = (nzMax(r, 0), nzMax(r, 1))
      val total = math.max(r.getLong(2), 1L)
      val base = li
        .withColumn("an", Layout.normalize(col("a"), maxA, HBits))
        .withColumn("bn", Layout.normalize(col("b"), maxB, HBits))
        .withColumn("zkey", Layout.zValue(col("an"), col("bn"), HBits))
        .withColumn("hkey", Layout.hilbertValue(col("an"), col("bn"), HBits))
      def layoutRows(keyCol: String, layout: String) = {
        val w = org.apache.spark.sql.expressions.Window.orderBy("key")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val cmap = base.groupBy(col(keyCol).as("key"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("_before", coalesce(sum("cnt").over(w), lit(0L)))
          .withColumn("file_id", expr(s"(_before * $HFiles) div $total"))
          .select("key", "file_id")
        base.join(broadcast(cmap), col(keyCol) === col("key"))
          .withColumn("layout", lit(layout))
      }
      val stats = layoutRows("zkey", "zorder")
        .unionByName(layoutRows("hkey", "hilbert"))
        .groupBy("layout", "file_id")
        .agg(min("a").as("mina"), max("a").as("maxa"),
          min("b").as("minb"), max("b").as("maxb"),
          count(lit(1)).as("n"))
      val probes = s.range(HGrid.toLong * HGrid).toDF("probe_id")
        .withColumn("loa",
          expr(s"((probe_id % $HGrid) * ${maxA + 1}) div $HGrid"))
        .withColumn("hia",
          expr(s"((probe_id % $HGrid + 1) * ${maxA + 1}) div $HGrid - 1"))
        .withColumn("lob",
          expr(s"((probe_id div $HGrid) * ${maxB + 1}) div $HGrid"))
        .withColumn("hib",
          expr(s"((probe_id div $HGrid + 1) * ${maxB + 1}) div $HGrid - 1"))
      val hit = col("maxa") >= col("loa") && col("mina") <= col("hia") &&
        col("maxb") >= col("lob") && col("minb") <= col("hib")
      stats.crossJoin(broadcast(probes))
        .groupBy("layout", "probe_id")
        .agg(sum(when(hit, 1L).otherwise(0L)).as("files_touched"),
          sum(when(hit, col("n")).otherwise(0L)).as("rows_scanned"))
        .orderBy("layout", "probe_id")
    },
    Some {
      val (levels, fin) = Layout.hilbertLevelsSql(
        "zz8", "an", "bn", carry = Seq("a", "b", "z"), bits = HBits)
      s"""
      WITH mx AS (
        SELECT MAX(l_orderkey) AS ma, MAX(l_partkey) AS mb,
               COUNT(*) AS total
        FROM lineitem),
      nrm8 AS (
        SELECT l_orderkey AS a, l_partkey AS b,
               (l_orderkey * ${1 << HBits}) // (ma + 1) AS an,
               (l_partkey * ${1 << HBits}) // (mb + 1) AS bn
        FROM lineitem, mx),
      zz8 AS (SELECT a, b, an, bn,
                     (${interleaveSqlN(Seq("an", "bn"), HBits)}) AS z
              FROM nrm8),
      $levels,
      base AS (SELECT a, b, z, hd FROM $fin),
      zmap AS (
        SELECT key, (bef * $HFiles) // total AS file_id
        FROM (SELECT z AS key,
                     COALESCE(SUM(COUNT(*)) OVER (ORDER BY z
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS bef
              FROM base GROUP BY z), mx),
      hmap AS (
        SELECT key, (bef * $HFiles) // total AS file_id
        FROM (SELECT hd AS key,
                     COALESCE(SUM(COUNT(*)) OVER (ORDER BY hd
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS bef
              FROM base GROUP BY hd), mx),
      files AS (
        SELECT 'zorder' AS layout, m.file_id,
               MIN(a) AS mina, MAX(a) AS maxa,
               MIN(b) AS minb, MAX(b) AS maxb, COUNT(*) AS n
        FROM base JOIN zmap m ON base.z = m.key GROUP BY 1, 2
        UNION ALL
        SELECT 'hilbert', m.file_id,
               MIN(a), MAX(a), MIN(b), MAX(b), COUNT(*)
        FROM base JOIN hmap m ON base.hd = m.key GROUP BY 1, 2),
      probes AS (
        SELECT p AS probe_id,
               ((p % $HGrid) * (ma + 1)) // $HGrid AS loa,
               ((p % $HGrid + 1) * (ma + 1)) // $HGrid - 1 AS hia,
               ((p // $HGrid) * (mb + 1)) // $HGrid AS lob,
               ((p // $HGrid + 1) * (mb + 1)) // $HGrid - 1 AS hib
        FROM range(${HGrid * HGrid}) t(p), mx)
      SELECT layout, probe_id,
             CAST(SUM(CASE WHEN maxa >= loa AND mina <= hia
                            AND maxb >= lob AND minb <= hib
                      THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
             CAST(SUM(CASE WHEN maxa >= loa AND mina <= hia
                            AND maxb >= lob AND minb <= hib
                      THEN n ELSE 0 END) AS BIGINT) AS rows_scanned
      FROM files CROSS JOIN probes
      GROUP BY layout, probe_id
      ORDER BY layout, probe_id
    """},
    eager = true)

  /** Deterministic probe family for the cover gate: 16 unaligned
    * boxes with varied sizes/offsets on the 256² grid (aligned boxes
    * collapse to one block each and gate nothing). Pure constants —
    * both engines build the same boxes from `p`. */
  private def coverProbes: Seq[(Long, Long, Long, Long)] =
    (0 until 16).map { p =>
      val lox = (p * 37) % 160
      val hix = lox + 40 + (p % 5) * 7
      val loy = (p * 53) % 150
      val hiy = loy + 30 + (p % 7) * 9
      (lox.toLong, hix.toLong, loy.toLong, hiy.toLong)
    }

  /** Hilbert range cover ([[Layout.hilbertCover]]) — the READ side of
    * the curve-clustered layout: each probe box becomes its exact
    * minimal set of contiguous curve ranges (what a reader pushes
    * down as BETWEENs over the clustered key). Engine = dyadic
    * quadrant descent (O(perimeter·bits), driver planning math);
    * oracle = brute force — every cell of every box walked through
    * the unrolled curve CTE, then gaps-and-islands over the sorted
    * positions. The two derivations must agree range-for-range, and
    * `n_cells = hi−lo+1` forces each island to be contiguity-exact.
    * A pure-kernel gate (no table read), the analytic-fixture posture
    * of q_image_phash. */
  val hilbertCover = GQuery(
    "q_hilbert_cover",
    (s, d) => {
      import s.implicits._
      coverProbes.zipWithIndex.flatMap { case ((lox, hix, loy, hiy), p) =>
        Layout.hilbertCover(lox, hix, loy, hiy, HBits).map {
          case (lo, hi) => (p.toLong, lo, hi, hi - lo + 1)
        }
      }.toDF("probe_id", "lo", "hi", "n_cells")
        .orderBy("probe_id", "lo")
    },
    Some {
      val (levels, fin) = Layout.hilbertLevelsSql(
        "cells", "cx", "cy", carry = Seq("probe_id"), bits = HBits)
      s"""
      WITH probes AS (
        SELECT p AS probe_id,
               (p * 37) % 160 AS lox,
               (p * 37) % 160 + 40 + (p % 5) * 7 AS hix,
               (p * 53) % 150 AS loy,
               (p * 53) % 150 + 30 + (p % 7) * 9 AS hiy
        FROM range(16) t(p)),
      ax AS (SELECT unnest(generate_series(0, ${(1 << HBits) - 1})) AS v),
      cells AS (
        SELECT probe_id, x.v AS cx, y.v AS cy
        FROM probes, ax x, ax y
        WHERE x.v BETWEEN lox AND hix AND y.v BETWEEN loy AND hiy),
      $levels,
      isl AS (
        SELECT probe_id, hd,
               hd - ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY hd) AS grp
        FROM $fin)
      SELECT probe_id, MIN(hd) AS lo, MAX(hd) AS hi,
             COUNT(*) AS n_cells
      FROM isl GROUP BY probe_id, grp
      ORDER BY probe_id, lo
    """})

  /** Range-count comparison of the two curves' covers over the SAME
    * probe family — the pushdown-complexity instrument: every curve
    * range a reader can't merge is one more BETWEEN in the scan
    * predicate and one more boundary a file's min/max can straddle.
    * Hilbert's seam-continuity halves the range count (922 vs 1798
    * across the 16 boxes). Oracle: islands COUNT per (curve, box),
    * Morton's cells indexed by the direct interleave expression,
    * Hilbert's by the unrolled walk — both brute force, both
    * independent of the engine's quadrant descent. */
  val curveCoverCompare = GQuery(
    "q_curve_cover_compare",
    (s, d) => {
      import s.implicits._
      coverProbes.zipWithIndex.flatMap { case ((lox, hix, loy, hiy), p) =>
        Seq(
          ("hilbert", p.toLong,
            Layout.hilbertCover(lox, hix, loy, hiy, HBits)),
          ("morton", p.toLong,
            Layout.mortonCover(lox, hix, loy, hiy, HBits))
        ).map { case (layout, pid, cover) =>
          (layout, pid, cover.length.toLong,
            cover.map { case (lo, hi) => hi - lo + 1 }.sum)
        }
      }.toDF("layout", "probe_id", "n_ranges", "n_cells")
        .orderBy("layout", "probe_id")
    },
    Some {
      val (levels, fin) = Layout.hilbertLevelsSql(
        "cells", "cx", "cy", carry = Seq("probe_id"), bits = HBits)
      s"""
      WITH probes AS (
        SELECT p AS probe_id,
               (p * 37) % 160 AS lox,
               (p * 37) % 160 + 40 + (p % 5) * 7 AS hix,
               (p * 53) % 150 AS loy,
               (p * 53) % 150 + 30 + (p % 7) * 9 AS hiy
        FROM range(16) t(p)),
      ax AS (SELECT unnest(generate_series(0, ${(1 << HBits) - 1})) AS v),
      cells AS (
        SELECT probe_id, x.v AS cx, y.v AS cy
        FROM probes, ax x, ax y
        WHERE x.v BETWEEN lox AND hix AND y.v BETWEEN loy AND hiy),
      $levels,
      keyed AS (
        SELECT 'hilbert' AS layout, probe_id, hd AS k FROM $fin
        UNION ALL
        SELECT 'morton', probe_id,
               (${interleaveSqlN(Seq("cx", "cy"), HBits)}) AS k
        FROM cells),
      isl AS (
        SELECT layout, probe_id, k,
               k - ROW_NUMBER() OVER (PARTITION BY layout, probe_id
                 ORDER BY k) AS grp
        FROM keyed),
      ranges AS (
        SELECT layout, probe_id, COUNT(*) AS cells_in_range
        FROM isl GROUP BY layout, probe_id, grp)
      SELECT layout, probe_id,
             COUNT(*) AS n_ranges,
             CAST(SUM(cells_in_range) AS BIGINT) AS n_cells
      FROM ranges GROUP BY layout, probe_id
      ORDER BY layout, probe_id
    """})

  /** End-to-end curve probe: select lineitem rows through the cover —
    * `hkey BETWEEN …` over [[Layout.hilbertValue]] with the ranges
    * from [[Layout.hilbertCover]] — and digest what came back. The
    * oracle filters by the BOX directly on the normalized grid
    * coordinates, entirely blind to the curve: if the key expression,
    * the cover planning, or the predicate composition drops or
    * over-admits one row, the digests diverge. This is the query
    * shape a reader of a Hilbert-clustered table actually runs. */
  val hilbertProbe = GQuery(
    "q_hilbert_probe",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("a"),
        col("l_partkey").cast("long").as("b"))
      val r = li.agg(max("a"), max("b")).head()
      val (maxA, maxB) = (nzMax(r, 0), nzMax(r, 1))
      val base = li
        .withColumn("an", Layout.normalize(col("a"), maxA, HBits))
        .withColumn("bn", Layout.normalize(col("b"), maxB, HBits))
        .withColumn("hkey",
          Layout.hilbertValue(col("an"), col("bn"), HBits))
      // ONE scan for the whole probe batch: each probe's cover
      // predicate becomes a projected flag, aggregated conditionally —
      // the batched-reader plan (a per-probe filter would scan the
      // fact 16 times; a single-probe reader still pushes its
      // coverPredicate into the scan for stats pruning). Projected
      // flags don't push down, so use the binary-search form: ~10²
      // ranges per cover makes the OR chain the whole query's cost
      // (7.5 s → 1.1 s at sf0.1 on this switch).
      val flags = coverProbes.zipWithIndex.map {
        case ((lox, hix, loy, hiy), p) =>
          Layout.coverPredicateCompiled(col("hkey"),
            Layout.hilbertCover(lox, hix, loy, hiy, HBits)).as(s"_m$p")
      }
      val flagged = base.select(col("a") +: col("b") +: flags: _*)
      val aggs = coverProbes.indices.flatMap { p =>
        Seq(
          coalesce(sum(when(col(s"_m$p"), 1L).otherwise(0L)), lit(0L))
            .as(s"_n$p"),
          coalesce(sum(when(col(s"_m$p"), col("a")).otherwise(0L)),
            lit(0L)).as(s"_a$p"),
          coalesce(sum(when(col(s"_m$p"), col("b")).otherwise(0L)),
            lit(0L)).as(s"_b$p"))
      }
      flagged.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(coverProbes.indices.map(p =>
          struct(lit(p.toLong).as("probe_id"), col(s"_n$p").as("n"),
            col(s"_a$p").as("sum_a"), col(s"_b$p").as("sum_b"))): _*))
          .as("s"))
        .select("s.*")
        .orderBy("probe_id")
    },
    Some(s"""
      WITH mx AS (
        SELECT MAX(l_orderkey) AS ma, MAX(l_partkey) AS mb
        FROM lineitem),
      nrm AS (
        SELECT l_orderkey AS a, l_partkey AS b,
               (l_orderkey * ${1 << HBits}) // (ma + 1) AS an,
               (l_partkey * ${1 << HBits}) // (mb + 1) AS bn
        FROM lineitem, mx),
      probes AS (
        SELECT p AS probe_id,
               (p * 37) % 160 AS lox,
               (p * 37) % 160 + 40 + (p % 5) * 7 AS hix,
               (p * 53) % 150 AS loy,
               (p * 53) % 150 + 30 + (p % 7) * 9 AS hiy
        FROM range(16) t(p))
      SELECT probe_id, COUNT(n.a) AS n,
             CAST(COALESCE(SUM(n.a), 0) AS BIGINT) AS sum_a,
             CAST(COALESCE(SUM(n.b), 0) AS BIGINT) AS sum_b
      FROM probes LEFT JOIN nrm n
        ON n.an BETWEEN lox AND hix AND n.bn BETWEEN loy AND hiy
      GROUP BY probe_id
      ORDER BY probe_id
    """),
    eager = true)

  private def manifestFixture(d: String): String =
    s"/tmp/graft_fixtures/hilbert_layer_${new java.io.File(d).getName}/layer"

  /** Idempotent hilbert-clustered layer fixture: lineitem's (a, b)
    * with the curve key KEPT as a column, range-partitioned on it
    * into 8 files (the [[Layout.writeHilbert]] plan, hkey retained so
    * both the footer manifest and the data oracle can read it). */
  private def ensureManifestFixture(s: org.apache.spark.sql.SparkSession,
                                    d: String): Unit = {
    val path = manifestFixture(d)
    Fixtures.ensure(s, path,
      "v1:" + Fixtures.sourceStamp(s, s"$d/lineitem.parquet")) {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("a"),
        col("l_partkey").cast("long").as("b"))
      val r = li.agg(max("a"), max("b")).head()
      li.withColumn("an", Layout.normalize(col("a"), nzMax(r, 0), HBits))
        .withColumn("bn", Layout.normalize(col("b"), nzMax(r, 1), HBits))
        .withColumn("hkey",
          Layout.hilbertValue(col("an"), col("bn"), HBits))
        .drop("an", "bn")
        .repartitionByRange(8, col("hkey"))
        .sortWithinPartitions("hkey")
        .write.mode("overwrite").parquet(path)
    }
  }

  /** Footer-stats manifest gate ([[graft.ops.FooterStats.manifest]]):
    * the engine reads ONLY parquet footers (zero data IO) and emits
    * per-file (rows, min/max of hkey, a, b) ranked by min_hkey; the
    * oracle rebuilds every row from the DATA of the same files
    * (`read_parquet(..., filename=true)` + GROUP BY file). Equality
    * is the contract that makes manifest-driven pruning trustworthy —
    * footer stats that disagree with a full scan would prune wrong
    * files silently. File names are write-run artifacts, so both
    * sides rank by min_hkey (unique: the clustered write makes file
    * hkey-ranges disjoint) and never compare names. */
  val footerManifest = GQuery(
    "q_footer_manifest",
    (s, d) => {
      ensureManifestFixture(s, d)
      val w = org.apache.spark.sql.expressions.Window.orderBy("min_hkey")
      // <= 8 manifest rows through the rank window — planning metadata
      graft.ops.FooterStats
        .manifest(s, manifestFixture(d), Seq("hkey", "a", "b"))
        .drop("file")
        .withColumn("file_ord", row_number().over(w).cast("long"))
        .select("file_ord", "n_rows", "min_hkey", "max_hkey",
          "min_a", "max_a", "min_b", "max_b")
        .orderBy("file_ord")
    },
    oracle = None,
    oracleAt = Some { (d: String) =>
      s"""
      WITH f AS (
        SELECT filename, COUNT(*) AS n_rows,
               MIN(hkey) AS min_hkey, MAX(hkey) AS max_hkey,
               MIN(a) AS min_a, MAX(a) AS max_a,
               MIN(b) AS min_b, MAX(b) AS max_b
        FROM read_parquet('${manifestFixture(d)}/*.parquet',
                          filename=true)
        GROUP BY filename)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY min_hkey) AS BIGINT)
               AS file_ord,
             n_rows, min_hkey, max_hkey, min_a, max_a, min_b, max_b
      FROM f ORDER BY file_ord
    """},
    prepare = Some(ensureManifestFixture _),
    eager = true)

  private def reclusterDir(d: String): String =
    s"/tmp/graft_fixtures/recluster_${new java.io.File(d).getName}/layer"

  /** Appended-batch bounds for the recluster fixture: a narrow curve
    * range in the middle of the 16-bit hkey space, so the append
    * overlaps a couple of the 8 clustered files and leaves the rest
    * disjoint — the exact damage recluster exists to repair. Pure
    * constants, shared with the oracle. */
  private val ReclLo = 4096L
  private val ReclHi = 12287L

  /** Idempotent recluster fixture: write a hilbert-clustered lineitem
    * layer (8 disjoint-range files), append one overlapping
    * narrow-range batch (breaking file disjointness locally), then
    * repair with [[Layout.recluster]] — asserting the maintenance
    * contract in-line: the repair must actually rewrite the damaged
    * region (≥ 2 files merged), must keep ≥ 1 far file un-re-encoded,
    * must restore pairwise-disjoint footer ranges, and a second run
    * must be a no-op. The gated digest then proves the repair lost,
    * duplicated, and mutated NOTHING. */
  private def ensureReclusterFixture(s: org.apache.spark.sql.SparkSession,
                                     d: String): Unit = {
    val path = reclusterDir(d)
    Fixtures.ensure(s, path,
      "v1:" + Fixtures.sourceStamp(s, s"$d/lineitem.parquet")) {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("a"),
        col("l_partkey").cast("long").as("b"))
      val r = li.agg(max("a"), max("b")).head()
      val base = li
        .withColumn("an", Layout.normalize(col("a"), nzMax(r, 0), HBits))
        .withColumn("bn", Layout.normalize(col("b"), nzMax(r, 1), HBits))
        .withColumn("hkey",
          Layout.hilbertValue(col("an"), col("bn"), HBits))
        .drop("an", "bn")
      base.repartitionByRange(8, col("hkey"))
        .sortWithinPartitions("hkey")
        .write.mode("overwrite").parquet(path)
      val appended = base.filter(col("hkey").between(ReclLo, ReclHi))
      if (appended.limit(1).count() > 0) {
        appended.coalesce(1).write.mode("append").parquet(path)
        val r1 = Layout.recluster(s, path, "hkey")
        require(r1.rewritten >= 2,
          s"append overlapped the layer; recluster must repair it: $r1")
        require(r1.kept >= 1,
          s"far files must be kept, not re-encoded: $r1")
        val m = graft.ops.FooterStats.manifest(s, path, Seq("hkey"))
          .collect()
          .map(x => (x.getAs[Long]("min_hkey"), x.getAs[Long]("max_hkey")))
          .sortBy(_._1)
        m.sliding(2).foreach {
          case Array((_, hi1), (lo2, _)) => require(hi1 < lo2,
            s"recluster must restore disjoint file ranges: ${m.toSeq}")
          case _ =>
        }
        val r2 = Layout.recluster(s, path, "hkey")
        require(r2.rewritten == 0,
          s"recluster on a clean layer must be a no-op: $r2")
      }
    }
  }

  /** Incremental-recluster gate ([[Layout.recluster]]): the fixture
    * damages a curve-clustered layer with an overlapping append and
    * repairs it under the contract `require`s above; the timed/gated
    * body digests the repaired layer per hkey bucket while DuckDB
    * predicts the same digest straight from the SOURCE lineitem
    * parquet (curve walk replayed by the unrolled CTE, the appended
    * range double-counted by construction) — a repair that drops,
    * duplicates, or mutates any row, or corrupts the retained hkey
    * column, breaks the hash. The q_compaction two-stack posture
    * applied to the selective-rewrite maintenance path. */
  val recluster = GQuery(
    "q_recluster",
    (s, d) => {
      ensureReclusterFixture(s, d)
      s.read.parquet(reclusterDir(d))
        .groupBy(shiftright(col("hkey"), 11).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum("a").as("sum_a"),
          sum("b").as("sum_b"),
          sum("hkey").as("sum_h"))
        .orderBy("bucket")
    },
    Some {
      val (levels, fin) = Layout.hilbertLevelsSql(
        "nrm8", "an", "bn", carry = Seq("a", "b"), bits = HBits)
      s"""
      WITH mx AS (
        SELECT MAX(l_orderkey) AS ma, MAX(l_partkey) AS mb
        FROM lineitem),
      nrm8 AS (
        SELECT l_orderkey AS a, l_partkey AS b,
               (l_orderkey * ${1 << HBits}) // (ma + 1) AS an,
               (l_partkey * ${1 << HBits}) // (mb + 1) AS bn
        FROM lineitem, mx),
      $levels,
      base AS (SELECT a, b, hd FROM $fin),
      allr AS (
        SELECT * FROM base
        UNION ALL
        SELECT * FROM base WHERE hd BETWEEN $ReclLo AND $ReclHi)
      SELECT CAST(hd >> 11 AS BIGINT) AS bucket, COUNT(*) AS n,
             CAST(SUM(a) AS BIGINT) AS sum_a,
             CAST(SUM(b) AS BIGINT) AS sum_b,
             CAST(SUM(hd) AS BIGINT) AS sum_h
      FROM allr GROUP BY 1 ORDER BY bucket
    """},
    prepare = Some(ensureReclusterFixture _),
    eager = true)

  def all: Seq[GQuery] = Seq(zorderKey, zorderSkipping, zorder3Key,
    zorder3Skipping, hilbertKey, hilbertSkipping, hilbertCover,
    curveCoverCompare, hilbertProbe, footerManifest, recluster)
}
