package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Sketches

/** Sketch-based monitoring queries. An approximate estimate can't
  * hash-match a different engine's approximation, so the oracle
  * contract here is: exact values ARE compared exactly, and the
  * sketch's error bound is compared as a verdict — the Spark side
  * computes `est_ok` from its real HLL estimate, the oracle asserts
  * the bound holds (constant 1). A drifting or broken sketch impl
  * fails the gate; the estimate itself is deterministic (pure hash
  * structure) so the check is stable, not flaky. */
object SketchQueries extends QueryPack {

  /** Per-group distinct-order cardinality: exact count (oracle-exact)
    * next to the HLL estimate's 5 % error verdict. lineitem has ~4
    * lineitems per order, so distinct ≠ count and the sketch does
    * real work. */
  val sketchDistinct = GQuery(
    "q_sketch_distinct",
    (s, d) => {
      // one scan, pre-distinct shape: dedupe (flag, key) first
      // (map-side combinable exchange), then count + sketch the
      // already-distinct keys per flag. HLL updates are idempotent so
      // the sketch is identical to sketching the raw column — and the
      // plan avoids both a second scan (self-join formulation) and
      // countDistinct's Expand + object-hash fallback (measured 8.2 s
      // vs 1.4 s at sf0.1)
      Tables.lineitem(s, d).select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_exact"),
          hll_sketch_agg(col("l_orderkey"), lit(Sketches.DefaultLgK))
            .as("sketch"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(Sketches.estimate(col("sketch")) - col("n_exact")) * 1000 <=
            col("n_exact") * 50).cast("int").as("est_ok"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_orderkey) AS n_exact,
             CAST(1 AS INT) AS est_ok
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag
    """))

  /** Quantile monitoring: exact per-group count/min/max next to an
    * approx-median RANK verdict. percentile_approx guarantees rank
    * error <= 1/accuracy; the query re-ranks the estimate against the
    * raw data (one broadcast join of the 6-row profile) and asserts
    * the returned value's rank INTERVAL [rows strictly below, rows
    * at-or-below] overlaps the 50%±1% band — interval overlap, not a
    * point test, so heavy ties at the median value (which inflate the
    * at-or-below count far past any rank guarantee) cannot flip the
    * verdict. Same contract shape as [[sketchDistinct]]: exact values
    * compare exactly, the approximation compares as a bound the
    * oracle asserts. */
  val quantileProfile = GQuery(
    "q_quantile_profile",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_returnflag", "l_extendedprice")
      val prof = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("_p50"))
      li.join(broadcast(prof), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(max("n").as("n"),
          max("min_price").as("min_price"),
          max("max_price").as("max_price"),
          count(when(col("l_extendedprice") <= col("_p50"), 1))
            .as("_n_le"),
          count(when(col("l_extendedprice") < col("_p50"), 1))
            .as("_n_lt"))
        .select(col("l_returnflag"), col("n"),
          col("min_price"), col("max_price"),
          // [lower rank, upper rank] of the estimate must overlap
          // the 49%..51% band: lower <= 51% AND upper >= 49%
          (col("_n_lt") * 1000 <= col("n") * 510 &&
            col("_n_le") * 1000 >= col("n") * 490)
            .cast("int").as("median_rank_ok"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, COUNT(*) AS n,
             MIN(l_extendedprice) AS min_price,
             MAX(l_extendedprice) AS max_price,
             CAST(1 AS INT) AS median_rank_ok
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag
    """))

  /** Mergeable histogram quantiles ([[Sketches.histogramProfile]]):
    * four per-slice profiles (simulated ingest batches, sliced by
    * l_orderkey % 4) are MERGED, then p50/p95 bins read off the
    * merged histogram. The oracle computes the histogram directly
    * over all rows — equality proves exact mergeability (counts sum
    * associatively; no verdict column needed, unlike the HLL gate,
    * because nothing here is approximate at bin granularity).
    * Binning is floor(price / 500): a single IEEE division + floor,
    * bit-identical in Spark and DuckDB. */
  val histogramQuantile = GQuery(
    "q_histogram_quantile",
    (s, d) => {
      val W = 500.0
      val li = Tables.lineitem(s, d)
        .select("l_returnflag", "l_extendedprice", "l_orderkey")
      val slices = (0 to 3).map(i => Sketches.histogramProfile(
        li.filter(pmod(col("l_orderkey"), lit(4)) === i),
        Seq("l_returnflag"), "l_extendedprice", W))
      val merged = Sketches.mergeHistograms(
        slices.reduce(_ unionByName _), Seq("l_returnflag"))
      val totals = merged.groupBy("l_returnflag")
        .agg(sum("n").as("total"))
      val p50 = Sketches.quantileBin(merged, Seq("l_returnflag"),
        0.5, "p50_bin")
      val p95 = Sketches.quantileBin(merged, Seq("l_returnflag"),
        0.95, "p95_bin")
      totals.join(p50, "l_returnflag").join(p95, "l_returnflag")
        .select(col("l_returnflag"), col("total"),
          col("p50_bin"), col("p95_bin"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH h AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_extendedprice / 500) AS BIGINT) AS bin,
               COUNT(*) AS n
        FROM lineitem GROUP BY 1, 2),
      cum AS (
        SELECT *, SUM(n) OVER (PARTITION BY l_returnflag
                               ORDER BY bin) AS c
        FROM h),
      tot AS (SELECT l_returnflag, SUM(n) AS total FROM h GROUP BY 1)
      SELECT t.l_returnflag, CAST(t.total AS BIGINT) AS total,
             (SELECT MIN(bin) FROM cum
              WHERE cum.l_returnflag = t.l_returnflag
                AND c >= CEIL(t.total * 0.5)) AS p50_bin,
             (SELECT MIN(bin) FROM cum
              WHERE cum.l_returnflag = t.l_returnflag
                AND c >= CEIL(t.total * 0.95)) AS p95_bin
      FROM tot t ORDER BY l_returnflag
    """))

  /** Mergeable Count–Min heavy hitters ([[Sketches.cmsProfile]]):
    * four per-slice CMS profiles (simulated ingest batches, sliced by
    * event_id % 4) are MERGED, then heavy users (exact count ≥ 80)
    * are point-estimated off the merged sketch. The oracle rebuilds
    * the IDENTICAL sketch directly over all rows — the md5-derived
    * bucket hash is engine-portable — so the estimate column compares
    * EXACTLY (equality proves both cell-exact mergeability and the
    * probe arithmetic), a stronger contract than the HLL error
    * verdict. Width 64 ≪ 150+ users forces real collisions: est > n
    * for most rows, est ≥ n for all (the structural CMS guarantee,
    * also pinned in SketchSpec). */
  val cmsHeavyHitters = GQuery(
    "q_cms_heavy_hitters",
    (s, d) => {
      val W = 64
      val ev = Tables.events(s, d).select("event_id", "user_id")
      val slices = (0 to 3).map(i => Sketches.cmsProfile(
        ev.filter(pmod(col("event_id"), lit(4)) === i),
        "user_id", width = W))
      val merged = Sketches.mergeCms(slices.reduce(_ unionByName _))
      val heavy = ev.groupBy("user_id")
        .agg(count(lit(1)).as("n")).filter(col("n") >= 80)
      Sketches.cmsEstimate(heavy, "user_id", merged, W, "est")
        .select(col("user_id"), col("n"),
          col("est").cast("long").as("est"))
        .orderBy("user_id")
    },
    Some(s"""
      WITH dd AS (SELECT * FROM (VALUES (0), (1), (2)) t(d)),
      cells AS (
        SELECT dd.d AS d,
               ${Sketches.cmsBucketSql("e.user_id", "dd.d", 64)} AS bucket,
               COUNT(*) AS n
        FROM events e CROSS JOIN dd GROUP BY 1, 2),
      heavy AS (
        SELECT user_id, COUNT(*) AS n FROM events
        GROUP BY 1 HAVING COUNT(*) >= 80),
      est AS (
        SELECT h.user_id, h.n, MIN(coalesce(c.n, 0)) AS est
        FROM heavy h CROSS JOIN dd
        LEFT JOIN cells c ON c.d = dd.d
          AND c.bucket = ${Sketches.cmsBucketSql("h.user_id", "dd.d", 64)}
        GROUP BY 1, 2)
      SELECT user_id, CAST(n AS BIGINT) AS n, CAST(est AS BIGINT) AS est
      FROM est ORDER BY user_id
    """))

  /** Mergeable Bloom membership ([[Sketches.bloomProfile]]): four
    * per-slice profiles (orders sliced by o_orderkey % 4) merge by
    * distinct union, then EVERY customer is probed for "has ordered"
    * next to the exact semi-join verdict. The oracle rebuilds the
    * identical bit set, so both booleans compare exactly — the gate
    * proves bit-exact mergeability, the no-false-negative invariant
    * (every ordered=true row must be bloom_hit=true), and the
    * expected ~1% false-positive band at width 4096 vs ~1000 distinct
    * buyers, all in one artifact. */
  val bloomMembership = GQuery(
    "q_bloom_membership",
    (s, d) => {
      val W = 4096
      val ord = Tables.orders(s, d).select("o_custkey", "o_orderkey")
      val slices = (0 to 3).map(i => Sketches.bloomProfile(
        ord.filter(pmod(col("o_orderkey"), lit(4)) === i),
        "o_custkey", width = W))
      val merged = Sketches.mergeBloom(slices.reduce(_ unionByName _))
      val buyers = ord.select(col("o_custkey")).distinct()
      Sketches.bloomMightContain(
        Tables.customer(s, d).select("c_custkey"),
        "c_custkey", merged, W, "bloom_hit")
        .join(buyers.withColumn("_o", lit(true)),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("_o"), lit(false)).as("ordered"),
          col("bloom_hit"))
        .orderBy("c_custkey")
    },
    Some(s"""
      WITH dd AS (SELECT * FROM (VALUES (0), (1), (2)) t(d)),
      bits AS (
        SELECT DISTINCT dd.d AS d,
               ${Sketches.cmsBucketSql("o.o_custkey", "dd.d", 4096)} AS bucket
        FROM orders o CROSS JOIN dd),
      probe AS (
        SELECT c.c_custkey, (COUNT(b.d) = 3) AS bloom_hit
        FROM customer c CROSS JOIN dd
        LEFT JOIN bits b ON b.d = dd.d
          AND b.bucket = ${Sketches.cmsBucketSql("c.c_custkey", "dd.d", 4096)}
        GROUP BY 1)
      SELECT p.c_custkey,
             (p.c_custkey IN (SELECT o_custkey FROM orders)) AS ordered,
             p.bloom_hit
      FROM probe p ORDER BY p.c_custkey
    """))

  /** Categorical drift monitor ([[graft.ops.Drift]]): the full event
    * stream vs a biased slice that silently sheds a third of one
    * event type — the "new crawl changed the mix" shape. Exact
    * integer milli-proportions, so the profile (including the
    * squared-difference drift signal) compares byte-exactly. */
  val categoricalDrift = GQuery(
    "q_categorical_drift",
    (s, d) => {
      val ev = Tables.events(s, d)
      graft.ops.Drift.categoricalProfile(
        ev,
        ev.filter(!(col("event_type") === "click" &&
          pmod(col("event_id"), lit(3)) === 0)),
        "event_type")
        .orderBy("category")
    },
    Some(graft.ops.Drift.categoricalProfileSql(
      "SELECT * FROM events",
      "SELECT * FROM events WHERE NOT (event_type = 'click' AND event_id % 3 = 0)",
      "event_type") + " ORDER BY category"))

  /** Stored-profile maintenance ([[graft.ops.Drift.mergeCounts]]):
    * three disjoint ingest-batch profiles (doc_id mod 3 slices of
    * documents, counted per source) folded WITHOUT rescanning, with
    * the direct whole-corpus recount as the oracle — the cross-engine
    * proof that incremental profile maintenance loses nothing vs a
    * full recount, which is the entire point of keeping profiles. */
  val profileMerge = GQuery(
    "q_profile_merge",
    (s, d) => {
      val docs = Tables.documents(s, d)
      def prof(m: Int) = docs
        .filter(pmod(col("doc_id"), lit(3)) === m)
        .select(coalesce(col("source").cast("string"), lit("__null__"))
          .as("category"))
        .groupBy("category").agg(count(lit(1)).as("cnt"))
      graft.ops.Drift.mergeCounts(Seq(prof(0), prof(1), prof(2)))
        .orderBy("category")
    },
    Some("""
      SELECT coalesce(CAST(source AS VARCHAR), '__null__') AS category,
             COUNT(*) AS cnt
      FROM documents GROUP BY 1 ORDER BY 1
    """))

  /** Mergeable second-order sufficient statistics
    * ([[graft.ops.SuffStats]]): three batch profiles of
    * (quantity, extendedprice) per returnflag folded into one, vs the
    * oracle's direct single-pass recount — exact moment parity
    * (int64-overflowing second moments as integer strings) plus the
    * integer micro regression slope with sign factored out of the
    * division (Spark `div` truncates, DuckDB `//` floors; they agree
    * only on non-negatives). */
  val suffStatsMerge = GQuery(
    "q_suffstats_merge",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val batches = (0 until 3).map(i =>
        graft.ops.SuffStats.profile(
          li.filter(pmod(col("l_linenumber"), lit(3)) === i),
          Seq("l_returnflag"), "l_quantity", "l_extendedprice", 2, 2))
      graft.ops.SuffStats.finalize(
        graft.ops.SuffStats.merge(batches.reduce(_ unionByName _),
          Seq("l_returnflag")),
        Seq("l_returnflag"))
        .orderBy("l_returnflag")
    },
    Some("""
      WITH s AS (
        SELECT l_returnflag AS g,
               CAST(ROUND(l_quantity * 1e2) AS BIGINT) AS xi,
               CAST(ROUND(l_extendedprice * 1e2) AS BIGINT) AS yi
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      p AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(xi) AS BIGINT) AS sx,
               CAST(SUM(yi) AS BIGINT) AS sy,
               SUM(xi * xi) AS sxx, SUM(yi * yi) AS syy,
               SUM(xi * yi) AS sxy
        FROM s GROUP BY g)
      SELECT g AS l_returnflag, n, sx, sy,
             CAST(sxx AS VARCHAR) AS sxx_s,
             CAST(syy AS VARCHAR) AS syy_s,
             CAST(sxy AS VARCHAR) AS sxy_s,
             -- sx is widened to HUGEINT BEFORE the products: sx*sx is
             -- BIGINT*BIGINT in DuckDB (errors on overflow, no auto-
             -- promote) and Σx² exceeds int64 once row counts grow —
             -- the engine side is DECIMAL(38) throughout (caught by
             -- the r9 sf1 gate run; the sums themselves were always
             -- HUGEINT)
             CASE WHEN (n * sxx - CAST(sx AS HUGEINT) * sx) = 0 THEN NULL
                  ELSE CAST(
                    (CASE WHEN (n * sxy - CAST(sx AS HUGEINT) * sy) < 0
                          THEN -1 ELSE 1 END)
                    * ((abs(n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000)
                       // abs(n * sxx - CAST(sx AS HUGEINT) * sx)) AS BIGINT)
             END AS slope_micro
      FROM p ORDER BY l_returnflag
    """))

  def all: Seq[GQuery] =
    Seq(sketchDistinct, quantileProfile, histogramQuantile,
      cmsHeavyHitters, bloomMembership, categoricalDrift, profileMerge,
      suffStatsMerge)
}
