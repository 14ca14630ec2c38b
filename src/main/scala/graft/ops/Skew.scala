package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the manual lever next to AQE's
  * runtime skew-join splitting (GraftSession keeps AQE on; salting is
  * for the planned-ahead case where one key's row count dwarfs the
  * rest and even a split shuffle partition is one task's worth of one
  * key).
  *
  * Shape: the BIG side gets a deterministic salt in [0, factor) per
  * row — xxhash64 of the whole row's representative column, NOT a
  * random() (reruns must partition identically) — widening the hot
  * key across `factor` shuffle partitions. The SMALL side is
  * replicated once per salt value (explode of a literal range: cheap,
  * its size × factor stays broadcast-range). Join on (key, salt)
  * then drop the salt: result ≡ the unsalted join, proven in
  * SkewSpec.
  *
  * Sizing `factor`: it is a dial, not a constant — pick it so the hot
  * key's rows ÷ factor fits one task's comfortable sort/probe budget,
  * i.e. scale it WITH the data (hot-key rows ≈ share × n ⇒ factor ≈
  * share × n / target-rows-per-task, capped by small-side × factor
  * staying broadcastable). The measured sf0.1→1→10 sweep
  * (BASELINE.md) holds factor=16 fixed and shows the win widening
  * every decade precisely because the per-task hot share keeps
  * growing — at the next decade the right move is a bigger factor,
  * not a different operator. [[saltFactorFor]] IS that move wired to
  * the signal: it derives the factor from a measured [[keyProfile]],
  * so the same pipeline self-sizes across decades instead of
  * shipping one scale's constant.
  */
object Skew {

  /** Deterministic per-row salt derived from `entropy` (any column
    * with per-row variation — an id, a line number). */
  def salt(entropy: Column, factor: Int): Column =
    pmod(xxhash64(entropy), lit(factor)).cast("int")

  /** Salt factor derived from a measured [[keyProfile]] — the dial
    * the sizing rule above describes, made executable. The hottest
    * key's exact row count (the profile's rank-1 `n`) divided by the
    * per-task row budget, rounded UP to the next power of two
    * (stable under small profile drift, composes with hash
    * partitioning), clamped to `[1, maxFactor]`.
    *
    *  - flat profile (hot key fits one task) → 1: the salted join
    *    degenerates to the plain join plus a constant column — the
    *    profile said don't pay the replication, and the code agrees;
    *  - 90%-hot at sf1 (~36M fact rows) → 32; at sf10 → 256: the
    *    factor grows with the decade exactly as the measured sweep
    *    says the win does, with the small side's replication
    *    (|dim| × factor) still broadcast-range under the cap.
    *
    * The profile collect is ≤ topK rows — profile-sized, the same
    * planning budget as every driver decision in this engine. Profile
    * once (e.g. a daily monitoring pass over the stored
    * [[keyProfile]]), reuse for every join on that key. */
  def saltFactorFor(profile: DataFrame,
                    targetRowsPerTask: Long = 2000000L,
                    maxFactor: Int = 1024): Int = {
    require(targetRowsPerTask > 0,
      s"targetRowsPerTask must be positive: $targetRowsPerTask")
    require(maxFactor >= 1, s"maxFactor must be >= 1: $maxFactor")
    val top = profile.filter(col("rank") === 1)
      .select(col("n").cast("long")).collect() // ≤ 1 row
    if (top.isEmpty) 1
    else {
      val hotRows = top.head.getLong(0)
      val raw = math.min(
        (hotRows + targetRowsPerTask - 1) / targetRowsPerTask,
        maxFactor.toLong).toInt
      var f = 1
      while (f < raw) f <<= 1
      math.min(f, maxFactor)
    }
  }

  /** Salted equi-join on `key`: `big` spread across `factor` salts,
    * `small` replicated `factor` times. Non-key columns pass through;
    * use for inner/left joins from the big side.
    *
    * `smallHint` (e.g. `Some("merge")`) pins the replicated side's
    * join strategy — salting only matters when the join SHUFFLES the
    * big side, i.e. when the small side is past broadcast range at
    * production scale; at test scale the hint models that reality
    * deterministically instead of depending on size estimates. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 entropy: Column, factor: Int,
                 joinType: String = "inner",
                 smallHint: Option[String] = None): DataFrame = {
    val b = big.withColumn("_salt", salt(entropy, factor))
    val s0 = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    val s = smallHint.fold(s0)(s0.hint(_))
    b.join(s, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Inner-equi-join row-count FORECAST from two key-count profiles —
    * the other half of the join-planning diagnostics next to
    * [[keyProfile]]: `|A ⋈ B on k| = Σ_k cA(k)·cB(k)` exactly, so the
    * cost of a candidate join (and whether its output explodes) is
    * known from profile-sized inputs BEFORE any payload moves. Null
    * keys are excluded on both sides, matching `=` join semantics.
    *
    * One row: shared_keys, n_pred. The per-key products and their sum
    * accumulate in DECIMAL(38,0) (the SuffStats convention) — hot-key
    * cardinalities are exactly what this diagnostic exists to catch,
    * and a long·long product silently wraps in non-ANSI Spark right
    * when the forecast matters most. The surfaced n_pred stays LONG
    * for schema stability, with a loud raise_error if the true count
    * exceeds Long.MaxValue (a 9.2e18-row join forecast is itself the
    * verdict).
    *
    * Scale shape: two map-side-combinable counts, one
    * key-cardinality-sized profile join, one fold — the fact tables'
    * payload columns never enter the plan (scan pruning down to the
    * key column, plan-asserted in SkewSpec).
    */
  def joinForecast(a: DataFrame, aKey: String,
                   b: DataFrame, bKey: String): DataFrame = {
    val pa = a.filter(col(aKey).isNotNull)
      .groupBy(col(aKey).as("_k")).agg(count(lit(1)).as("_ca"))
    val pb = b.filter(col(bKey).isNotNull)
      .groupBy(col(bKey).as("_k")).agg(count(lit(1)).as("_cb"))
    forecastFromProfiles(pa, pb)
  }

  /** [[joinForecast]] from PRE-COMPUTED key-count profiles
    * (`_k`, `_ca`) × (`_k`, `_cb`) — the stored-profile form (the
    * SuffStats count-once-fold-forever convention): profiles persisted
    * by a monitoring pass can forecast any candidate join without
    * rescanning the facts. */
  def forecastFromProfiles(pa: DataFrame, pb: DataFrame): DataFrame =
    pa.join(pb, "_k")
      .agg(count(lit(1)).cast("long").as("shared_keys"),
        sum(col("_ca").cast("decimal(19,0)") *
          col("_cb").cast("decimal(19,0)")).as("_p"))
      .select(col("shared_keys"),
        when(col("_p") <= lit(Long.MaxValue).cast("decimal(38,0)"),
          col("_p").cast("long"))
          .otherwise(raise_error(concat(
            lit("joinForecast n_pred overflows long: "),
            col("_p").cast("string"))).cast("long")).as("n_pred"))

  /** Join-key skew diagnostics — the DECISION INPUT for the salted
    * path: before shipping a pipeline that joins on `key`, measure how
    * concentrated the key actually is. Top-`topK` keys by row count
    * with integer milli shares, plus the corpus-level constants
    * (`n_keys`, `total_rows`) replicated onto every row so one frame
    * carries the whole verdict (a 900-milli top-1 share says salt; a
    * flat profile says don't pay the replication).
    *
    * Scale shape: per-key counts are ONE map-side-combinable
    * aggregate; the top-K cut plans as TakeOrderedAndProject
    * (per-partition heaps — never a global sort of the key space);
    * the totals fold is a second aggregate over the key-cardinality-
    * sized count frame; the final rank window runs on ≤ topK rows
    * (the BoundedDim posture: a bounded frame may sit in one task).
    */
  def keyProfile(df: DataFrame, key: String, topK: Int): DataFrame = {
    require(topK >= 1 && topK <= 10000,
      s"keyProfile topK must be in [1, 10000]: $topK")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum("n").cast("long").as("total_rows"),
      count(lit(1)).cast("long").as("n_keys"))
    counts.orderBy(col("n").desc, col(key).asc).limit(topK)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n").desc, col(key).asc)).cast("long"))
      .crossJoin(broadcast(totals))
      .select(col("rank"), col(key), col("n"),
        expr("(1000 * n) div total_rows").as("share_milli"),
        col("n_keys"), col("total_rows"))
  }
}
