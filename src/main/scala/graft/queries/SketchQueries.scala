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

  def all: Seq[GQuery] = Seq(sketchDistinct)
}
