package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Exact, Skew}

/** Skew-join evidence pair — the latency claim behind
  * [[graft.ops.Skew]], measured instead of asserted.
  *
  * Both queries compute the IDENTICAL aggregate over a deliberately
  * skewed join (~90% of lineitem rows share one hot key) against a
  * 51-row dim, so they share one DuckDB oracle — the salted plan must
  * be equivalence-proven by the same hash compare as everything else.
  * The dim carries a `merge` hint in both: at production scale the
  * interesting case is a dim past broadcast range, and the hint models
  * that deterministically at test scale (a broadcast join would make
  * skew invisible — no shuffle of the big side — and prove nothing).
  *
  * q_skew_join_naive: plain sort-merge join — the hot key's entire
  * row mass lands in ONE shuffle partition; one task does ~90% of the
  * work while the rest idle. (AQE's skew split stays dormant at bench
  * scale: partitions sit far under the 256 MB threshold. SkewSpec
  * demonstrates the AQE path with lowered thresholds.)
  *
  * q_skew_join_salted: [[Skew.saltedJoin]] with factor 16 — the hot
  * key spreads across 16 shuffle partitions, the dim replicates 16×
  * (51·16 rows: still nothing), and the join parallelizes. BENCH_r5+
  * records the delta between the two as the operator's evidence.
  */
object SkewQueries extends QueryPack {

  private val Factor = 16

  /** Fact inflation: at sf0.1 the raw lineitem's hot partition sorts
    * in ~0.1 s and scheduler overhead hides the one-task bottleneck
    * the queries exist to measure. ×6 models the fact-to-dim ratio
    * where skew actually bites; the oracle mirrors it verbatim. */
  private val Mult = 6

  /** lineitem ×[[Mult]] with a synthetic 90%-hot join key:
    * multiples-of-10 orderkeys fan out over k0..k49, everything else
    * is 'hot'. `rep` keeps replica rows distinct so the salt (keyed on
    * (l_orderkey, rep)) spreads the inflated hot mass too. */
  private def bigSide(s: SparkSession, dir: String): DataFrame =
    // the ×6 explode + key synthesis is one heavy scan-side pass over
    // a single-row-group file: hash-spread it first (Tables.spread
    // scaladoc; q_skew_join_salted 3.7→2.4 s measured) — shared by
    // all four gates so the naive/salted evidence pair stays
    // like-for-like
    Tables.spread(s, Tables.lineitem(s, dir), "l_orderkey")
      .withColumn("rep", explode(sequence(lit(1), lit(Mult))))
      .select(
        when(col("l_orderkey") % 10 === 0,
          concat(lit("k"),
            (floor(col("l_orderkey") / 10) % 50).cast("string")))
          .otherwise(lit("hot")).as("skew_key"),
        col("l_orderkey"), col("rep"), col("l_quantity"))

  /** 51-row dim: k0..k49 weighted, plus the hot key. */
  private def smallDim(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(0, 50).select(
      concat(lit("k"), col("id").cast("string")).as("skew_key"),
      (col("id") * 10L).as("dim_weight"))
      .unionByName(Seq(("hot", -1L)).toDF("skew_key", "dim_weight"))
  }

  private val oracle = s"""
    WITH dim AS (
      SELECT 'k' || CAST(i AS VARCHAR) AS skew_key,
             CAST(i * 10 AS BIGINT) AS dim_weight
      FROM generate_series(0, 49) t(i)
      UNION ALL SELECT 'hot', CAST(-1 AS BIGINT)
    ), big AS (
      SELECT CASE WHEN l_orderkey % 10 = 0
               THEN 'k' || CAST(CAST(floor(l_orderkey / 10) AS BIGINT) % 50 AS VARCHAR)
               ELSE 'hot' END AS skew_key,
             l_quantity
      FROM lineitem CROSS JOIN generate_series(1, $Mult) reps(rep)
    )
    SELECT skew_key, COUNT(*) AS n_rows,
           ${Exact.fixedSumSql("l_quantity", 2)} AS sum_qty,
           CAST(SUM(dim_weight) AS BIGINT) AS wgt_sum
    FROM big JOIN dim USING (skew_key)
    GROUP BY skew_key ORDER BY skew_key
  """

  private def aggregate(joined: DataFrame): DataFrame =
    joined.groupBy("skew_key").agg(
      count(lit(1)).as("n_rows"),
      Exact.fixedSum(col("l_quantity"), 2).as("sum_qty"),
      sum(col("dim_weight")).as("wgt_sum"))
      .orderBy("skew_key")

  val naive = GQuery(
    "q_skew_join_naive",
    (s, d) => aggregate(
      bigSide(s, d).join(smallDim(s).hint("merge"), Seq("skew_key"))),
    Some(oracle))

  val salted = GQuery(
    "q_skew_join_salted",
    (s, d) => aggregate(
      Skew.saltedJoin(bigSide(s, d), smallDim(s), "skew_key",
        entropy = concat_ws("|", col("l_orderkey"), col("rep")),
        factor = Factor, smallHint = Some("merge"))),
    Some(oracle))

  /** The SELF-SIZING salted join ([[Skew.saltFactorFor]]): the salt
    * factor is derived from a measured [[Skew.keyProfile]] instead of
    * shipped as a constant, so the same pipeline picks 2 at sf0.1, 32
    * at sf1 and 256 at sf10 — the dial the fixed-16 evidence pair
    * says to turn each decade, turned by the data itself. Same oracle
    * as the pair: whatever factor the profile chose, the result must
    * hash-match the unsalted truth. The profile pass is one extra
    * map-side-combinable scan here because the gate is self-contained;
    * operationally the profile is computed once by a monitoring pass
    * and reused. */
  val autoSalted = GQuery(
    "q_skew_join_autosalted",
    (s, d) => {
      val big = bigSide(s, d)
      val factor = Skew.saltFactorFor(
        Skew.keyProfile(big, "skew_key", topK = 1))
      aggregate(Skew.saltedJoin(big, smallDim(s), "skew_key",
        entropy = concat_ws("|", col("l_orderkey"), col("rep")),
        factor = factor, smallHint = Some("merge")))
    },
    Some(oracle),
    eager = true) // the profile collect runs at construction

  /** Skew diagnostics over the same planted-90%-hot fixture the
    * evidence pair joins ([[Skew.keyProfile]]): the profile that tells
    * an operator to take the salted path BEFORE paying for either
    * join. The hot key must surface at rank 1 with its ~900-milli
    * share; the oracle rebuilds counts, shares, rank and the corpus
    * constants from scratch. */
  val profile = GQuery(
    "q_skew_profile",
    (s, d) => Skew.keyProfile(bigSide(s, d), "skew_key", topK = 10)
      .orderBy("rank"),
    Some(s"""
      WITH big AS (
        SELECT CASE WHEN l_orderkey % 10 = 0
                 THEN 'k' || CAST(CAST(floor(l_orderkey / 10) AS BIGINT) % 50 AS VARCHAR)
                 ELSE 'hot' END AS skew_key
        FROM lineitem CROSS JOIN generate_series(1, $Mult) reps(rep)),
      cnt AS (SELECT skew_key, CAST(COUNT(*) AS BIGINT) AS n
              FROM big GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
                     CAST(COUNT(*) AS BIGINT) AS n_keys FROM cnt),
      top AS (SELECT skew_key, n,
                     CAST(ROW_NUMBER() OVER (ORDER BY n DESC, skew_key ASC)
                       AS BIGINT) AS rank
              FROM cnt)
      SELECT rank, skew_key, n,
             CAST((1000 * n) // total_rows AS BIGINT) AS share_milli,
             n_keys, total_rows
      FROM top CROSS JOIN tot
      WHERE rank <= 10
      ORDER BY rank
    """))

  /** Join-size forecast vs reality ([[Skew.joinForecast]]) on a
    * genuinely many-to-many join (events self-joined on user_id): the
    * profile identity `Σ cA·cB` must equal the actual join count
    * exactly — the planning tool and its proof in one row. The
    * actual-count branch exists for the gate; production use is the
    * forecast alone, which never moves payload. */
  val joinForecast = GQuery(
    "q_join_forecast",
    (s, d) => {
      val e = Tables.events(s, d)
      val f = Skew.joinForecast(e, "user_id", e, "user_id")
      val e2 = e.select(col("user_id").as("u2"))
      val actual = e.join(e2, col("user_id") === col("u2"))
        .agg(count(lit(1)).cast("long").as("n_actual"))
      f.crossJoin(broadcast(actual))
    },
    Some("""
      WITH pa AS (
        SELECT user_id AS k, COUNT(*) AS ca FROM events
        WHERE user_id IS NOT NULL GROUP BY 1),
      f AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS shared_keys,
               CAST(SUM(ca * cb) AS BIGINT) AS n_pred
        FROM pa a JOIN (SELECT k, ca AS cb FROM pa) b USING (k)),
      act AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_actual
        FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id)
      SELECT shared_keys, n_pred, n_actual FROM f CROSS JOIN act
    """))

  def all: Seq[GQuery] = Seq(naive, salted, autoSalted, profile,
    joinForecast)
}
