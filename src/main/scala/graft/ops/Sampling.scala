package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()`/`rand()` are seed-dependent on partitioning and
  * re-draw on every retry/re-run — useless for reproducible corpus
  * construction at 100 TB, where a retried stage must not change the
  * sample. The scalable idiom is HASH sampling: a row is in the
  * sample iff a stable hash of its key falls under a threshold. Same
  * key → same decision, on any cluster, any partitioning, any rerun;
  * adjusting the rate upward only ADDS rows (nested samples), which
  * is what incremental corpus growth wants.
  *
  * Portability: the hash is the first 4 hex chars of md5(key),
  * compared LEXICOGRAPHICALLY against a threshold — md5 emits
  * lowercase hex identically in Spark and DuckDB, so the decision
  * (and therefore the oracle) is exact, with rate granularity
  * 1/65536. Pure per-row codegen'd expressions: no shuffle, no UDF,
  * filter pushes down to the scan like any other predicate.
  */
object Sampling {

  val Buckets = 65536 // 16^4

  /** Lowercase 4-hex-digit threshold for a per-65536 rate. The full
    * rate needs a string ABOVE every hex digit — "10000" would
    * compare lexicographically below "2000" and sample 1/16. */
  private def thresholdHex(per65536: Int): String = {
    require(per65536 >= 0 && per65536 <= Buckets,
      s"rate must be in [0, $Buckets]: $per65536")
    if (per65536 == Buckets) "g" else f"$per65536%04x"
  }

  /** The sampling predicate: md5-bucket of `key` under `per65536`. */
  def sampledBy(key: Column, per65536: Int): Column =
    substring(md5(key.cast("string")), 1, 4) < lit(thresholdHex(per65536))

  /** Uniform deterministic sample at rate per65536/65536, keyed on
    * `key` (use the stable row identity — id, url, content hash). */
  def sample(df: DataFrame, key: Column, per65536: Int): DataFrame =
    df.filter(sampledBy(key, per65536))

  /** Stratified deterministic sample: per-stratum rates, e.g.
    * downsample the dominant language while keeping the tail whole.
    * Strata absent from `rates` fall back to `defaultPer65536`.
    * The rate lookup compiles to a broadcast-free CASE chain —
    * `rates` is configuration-sized (a handful of strata). */
  def stratified(df: DataFrame, stratum: Column, key: Column,
                 rates: Map[String, Int],
                 defaultPer65536: Int = 0): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1)
      .foldRight(lit(thresholdHex(defaultPer65536))) {
        case ((s, r), acc) => when(stratum === s, lit(thresholdHex(r)))
          .otherwise(acc)
      }
    df.filter(substring(md5(key.cast("string")), 1, 4) < thr)
  }

  /** Per-row-rate ("weighted") deterministic sampling: each row
    * carries its own keep-rate in per-65536 units — the curation
    * shape where keep probability follows a quality/importance score
    * rather than one global rate. Same md5-bucket decision as
    * [[sampledBy]], so the same guarantees hold: retry-stable,
    * partitioning-invariant, and raising a row's rate can only ever
    * ADD it (never reshuffles the kept set). Rates >= 65536 keep the
    * row unconditionally; rates <= 0 never keep it. */
  def weightedBy(key: Column, ratePer65536: Column): Column = {
    val thr = when(ratePer65536 >= Buckets, lit("g"))
      .otherwise(lower(lpad(hex(greatest(ratePer65536, lit(0))), 4, "0")))
    substring(md5(key.cast("string")), 1, 4) < thr
  }

  def weighted(df: DataFrame, key: Column,
               ratePer65536: Column): DataFrame =
    df.filter(weightedBy(key, ratePer65536))

  /** DuckDB mirror of [[weightedBy]]. */
  def weightedBySql(keyExpr: String, rateExpr: String): String =
    s"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4) < " +
      s"(CASE WHEN ($rateExpr) >= $Buckets THEN 'g' ELSE " +
      s"lower(lpad(to_hex(greatest($rateExpr, 0)), 4, '0')) END)"

  /** Exact per-domain cap: keep at most `cap` rows per domain, chosen
    * deterministically by md5 priority (so reruns, retries, and
    * corpus regrowth keep the SAME representatives — new arrivals
    * only displace rows with worse priority, they never reshuffle the
    * whole selection). The standard curation lever against one domain
    * flooding a web corpus.
    *
    * Scale shape: one shuffle on the domain + a per-domain sorted
    * window with a rank limit — Spark plans the `rn <= cap` filter as
    * WindowGroupLimit, so each partition retains only `cap` rows
    * per domain BEFORE the final window (no full-domain
    * materialization). Caveat for the one-mega-domain extreme (a
    * single domain that alone exceeds an executor): cap it first with
    * a rate-based [[sample]] pre-filter, then exact-cap the
    * remainder.
    */
  def domainCap(df: DataFrame, domain: Column, key: Column,
                cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(domain)
      .orderBy(md5(key.cast("string")).asc, key.asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** DuckDB mirror of [[domainCap]]'s selection predicate (wrap the
    * source in a subquery and filter on this computed rank). */
  def domainCapRankSql(domainExpr: String, keyExpr: String): String =
    s"ROW_NUMBER() OVER (PARTITION BY $domainExpr ORDER BY " +
      s"md5(CAST($keyExpr AS VARCHAR)) ASC, $keyExpr ASC)"

  /** Deterministic train/val/test (or any n-way) split assignment:
    * the md5 bucket of `key` is carved into consecutive ranges, one
    * per named split, remainder to `default`. Same hash discipline as
    * [[sampledBy]], so assignment is retry-stable and partitioning-
    * invariant — and growing one split's share only MOVES keys into
    * it from the default, never reshuffles the others.
    *
    * Leakage control is the caller's key choice: hashing the row id
    * splits rows independently, so near-duplicate documents can
    * straddle train/test (contaminating evaluation); hashing the
    * near-dup CLUSTER id puts every member of a cluster in the same
    * split by construction. See q_leakage_safe_split. */
  def assignSplit(key: Column, splits: Seq[(String, Int)],
                  default: String = "train"): Column = {
    validateSplits(splits, default)
    val bucket = substring(md5(key.cast("string")), 1, 4)
    val (cases, _) = splits.foldLeft((lit(default), 0)) {
      case ((acc, cum), (name, share)) =>
        (when(bucket < lit(thresholdHex(cum + share)) &&
          bucket >= lit(thresholdHex(cum)), lit(name)).otherwise(acc),
          cum + share)
    }
    cases
  }

  /** Shared validation for [[assignSplit]] and its SQL mirror: a
    * NEGATIVE share would make later ranges overlap earlier ones —
    * and the two implementations would then disagree on the overlap
    * (the Column fold is last-when-wins, the SQL CASE first-WHEN-
    * wins), a silent engine/oracle divergence. */
  private def validateSplits(splits: Seq[(String, Int)],
                             default: String): Unit = {
    require(splits.forall(_._2 >= 0),
      s"split shares must be non-negative: $splits")
    require(splits.map(_._2).sum <= Buckets,
      s"split shares exceed $Buckets: ${splits.map(_._2).sum}")
    require(splits.map(_._1).distinct.size == splits.size &&
      !splits.exists(_._1 == default), "split names must be unique")
  }

  /** DuckDB mirror of [[assignSplit]]. */
  def assignSplitSql(keyExpr: String, splits: Seq[(String, Int)],
                     default: String = "train"): String = {
    validateSplits(splits, default)
    val bucket = s"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4)"
    val whens = splits.foldLeft((List.empty[String], 0)) {
      case ((acc, cum), (name, share)) =>
        (acc :+ (s"WHEN $bucket >= '${thresholdHex(cum)}' AND " +
          s"$bucket < '${thresholdHex(cum + share)}' THEN '$name'"),
          cum + share)
    }._1.mkString(" ")
    s"(CASE $whens ELSE '$default' END)"
  }

  /** Seeded per-row shuffle priority: md5 of "seed:key". Training
    * pipelines need a DETERMINISTIC global permutation of the corpus
    * (epoch ordering must be reproducible across reruns and resumes,
    * and re-seedable per epoch without rewriting data) — `rand()`
    * gives neither. Lexicographic order of this hash IS the
    * permutation; changing the seed re-permutes. Null keys yield a
    * NULL priority (concat propagates null — matching the SQL
    * mirror's `||`, where concat_ws would silently collapse every
    * null key onto md5(seed), piling them into one shard); shuffle
    * keys are row identities, fix them upstream if nullable. */
  def shufflePriority(key: Column, seed: String): Column =
    md5(concat(lit(seed), lit(":"), key.cast("string")))

  /** Which of `numShards` training shards a key lands in: the top 16
    * bits of [[shufflePriority]] scaled into shard space, so shard
    * membership AND in-shard order derive from one hash. Shards are
    * balanced to ±(corpus/65536) and stable under reruns. */
  def shardOf(key: Column, seed: String, numShards: Int): Column = {
    require(numShards > 0 && numShards <= Buckets,
      s"numShards must be in [1, $Buckets]: $numShards")
    (conv(substring(shufflePriority(key, seed), 1, 4), 16, 10)
      .cast("long") * numShards / Buckets).cast("int")
  }

  /** The seeded global shuffle, materialization-shaped: ONE shuffle
    * (hash-repartition on the shard id) + an in-partition sort on
    * (shard, priority, key) — never a global range sort. Downstream
    * per-shard windows and aggregations reuse both the partitioning
    * and the sort order (plan-asserted in SamplingSpec), and
    * [[writeShards]] streams each sorted shard straight to its
    * directory. The tie-break on `key` pins the order even if two
    * keys ever collided in the hash. */
  def globalShuffle(df: DataFrame, key: Column, seed: String,
                    numShards: Int): DataFrame = {
    require(!df.columns.contains("_pri") && !df.columns.contains("shard"),
      "globalShuffle reserves the column names 'shard' and '_pri'; " +
        "rename them on the input first")
    df.withColumn("shard", shardOf(key, seed, numShards))
      .withColumn("_pri", shufflePriority(key, seed))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("_pri"), key)
      .drop("_pri")
  }

  /** Export the shuffled corpus as one directory per shard (the
    * training-consumption layout: readers stream shards
    * independently, in priority order). Exactly [[globalShuffle]]'s
    * one shuffle; `partitionBy` only splits the already-sorted
    * partitions into per-shard files. */
  def writeShards(df: DataFrame, key: Column, seed: String,
                  numShards: Int, path: String): Unit =
    globalShuffle(df, key, seed, numShards)
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Budgeted best-first selection — the dataset-MIXING primitive:
    * per group (language, source, domain), take rows in descending
    * `score` order until the group's `budget` of `cost` units
    * (tokens, chars, bytes) is spent. Passing a per-group `budget`
    * expression IS the mixing ratio: "30M tokens of en, 15M of
    * everything else" is one call.
    *
    * A row is kept iff the cost spent on strictly-better rows is
    * still under budget — so the first row to cross the line is
    * INCLUDED (guaranteed progress when a single document exceeds
    * the whole budget) and everything after it is not. Ordering ties
    * break on `key`, so selection is deterministic and, like every
    * op here, retry-stable: raising a group's budget only ADDS rows.
    *
    * Scale shape: one shuffle on the group + a per-group running sum
    * over a ROWS window — no global sort, no collect. The window
    * sorts each group; for a group so large its sort is the
    * bottleneck, pre-thin with [[weighted]]/[[sample]] first (the
    * usual two-phase curation), or bound the group with
    * [[domainCap]]. */
  def selectToBudget(df: DataFrame, group: Column, score: Column,
                     cost: Column, key: Column,
                     budget: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(score.desc, key.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_spent", sum(cost).over(w))
      .filter(coalesce(col("_spent"), lit(0L)) < budget)
      .drop("_spent")
  }

  /** DuckDB mirror of [[selectToBudget]]'s spent-so-far expression
    * (filter `coalesce(<this>, 0) < budget` in a wrapping query). */
  def spentBeforeSql(groupExpr: String, scoreExpr: String,
                     costExpr: String, keyExpr: String): String =
    s"SUM($costExpr) OVER (PARTITION BY $groupExpr " +
      s"ORDER BY $scoreExpr DESC, $keyExpr ASC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"

  /** DuckDB mirror of [[shufflePriority]]. */
  def shufflePrioritySql(keyExpr: String, seed: String): String =
    s"md5('$seed:' || CAST($keyExpr AS VARCHAR))"

  /** DuckDB mirror of [[shardOf]] (hex-prefix parse via the 0x cast). */
  def shardOfSql(keyExpr: String, seed: String, numShards: Int): String =
    s"CAST(CAST('0x' || substr(${shufflePrioritySql(keyExpr, seed)}, 1, 4) " +
      s"AS BIGINT) * $numShards // $Buckets AS INT)"

  /** DuckDB mirror of [[sampledBy]]. */
  def sampledBySql(keyExpr: String, per65536: Int): String =
    s"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4) < '${thresholdHex(per65536)}'"

  /** DuckDB mirror of the stratified threshold CASE chain. */
  def stratifiedSql(stratumExpr: String, keyExpr: String,
                    rates: Map[String, Int],
                    defaultPer65536: Int = 0): String = {
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (s, r) => s"WHEN $stratumExpr = '$s' THEN '${thresholdHex(r)}'" }
      .mkString(" ")
    s"substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4) < " +
      s"(CASE $cases ELSE '${thresholdHex(defaultPer65536)}' END)"
  }

  // ----- temperature rebalancing ------------------------------------

  /** Temperature-based group rebalancing with EXACT integer
    * arithmetic — the multilingual/multi-domain mixing knob: keep
    * each group at rate `(n_min / n_group)^(1 - alpha)` for a
    * rational temperature exponent `alpha = p/q` (alpha=0 equalizes
    * expected group sizes; alpha=1/2 and 2/3 are the standard partial
    * rebalances; the smallest group is always kept whole). The usual
    * implementation computes `pow()` in floating point and rounds to
    * a rate — two engines can disagree by an ulp exactly at a bucket
    * boundary, which is the kind of silent cross-engine drift this
    * repo bans. Instead the keep decision is the INTEGER comparison
    *
    *   u^q * n_group^(q-p)  <=  65536^q * n_min^(q-p)
    *
    * (u = the row's md5 bucket in [0, 65536)), which is algebraically
    * `u/65536 <= (n_min/n_group)^((q-p)/q)` with no floats anywhere —
    * bit-identical in Spark and DuckDB, retry-stable, partitioning-
    * invariant, and nested exactly like [[sampledBy]] (shrinking
    * alpha only removes rows from big groups, never reshuffles).
    *
    * The digit budget keeps every product exact inside DECIMAL(38,0)
    * / HUGEINT: 5 digits per u/65536 factor, 19 per count factor —
    * `5q + 19(q-p) <= 38` admits alpha in {0, 1/2, 2/3}, which
    * validateTemperature enforces loudly. Arbitrary float-derived
    * rates stay available via [[weighted]]; this path is for the
    * count-driven rebalance where exactness is the contract.
    *
    * Scale shape: group counts are group-cardinality-sized metadata
    * (languages, sources) — one tiny aggregate, broadcast back; the
    * data itself never shuffles, and the keep predicate is per-row
    * codegen next to the scan. Feed stored profile counts via
    * [[temperatureWithCounts]] to skip even the counting scan (the
    * same stored-profile posture as Drift.countedDrift). */
  def temperatureKeep(key: Column, nGroup: Column, nMin: Column,
                      p: Int, q: Int): Column = {
    validateTemperature(p, q)
    val u = conv(substring(md5(key.cast("string")), 1, 4), 16, 10)
      .cast("decimal(5,0)")
    val lhs = (Seq.fill(q)(u) ++
      Seq.fill(q - p)(nGroup.cast("decimal(19,0)"))).reduce(_ * _)
    val rhs = (Seq.fill(q)(lit(Buckets).cast("decimal(5,0)")) ++
      Seq.fill(q - p)(nMin.cast("decimal(19,0)"))).reduce(_ * _)
    lhs <= rhs
  }

  /** 5 digits per 65536-bucket factor, 19 per count factor: the
    * product of declared precisions must stay inside DECIMAL(38,0),
    * or Spark's capped-precision arithmetic could round — silently
    * breaking the exactness contract. */
  private def validateTemperature(p: Int, q: Int): Unit = {
    require(p >= 0 && p < q,
      s"temperature exponent must satisfy 0 <= p < q: alpha=$p/$q")
    require(5 * q + 19 * (q - p) <= 38,
      s"alpha=$p/$q needs ${5 * q + 19 * (q - p)} exact decimal digits" +
        " > 38; supported exponents: 0, 1/2, 2/3")
  }

  /** [[temperatureKeep]] against caller-supplied group counts — a
    * two-column frame (group value, count) from a stored profile, so
    * rebalancing a 100 TB corpus reads counts instead of rescanning
    * it. Counts are matched positionally: first column joins the
    * group, second is the count. */
  def temperatureWithCounts(df: DataFrame, counts: DataFrame,
                            group: Column, key: Column,
                            p: Int, q: Int): DataFrame = {
    require(counts.columns.length == 2,
      s"counts must be (group, n): got ${counts.columns.mkString(", ")}")
    Seq("_grp", "_n", "_nmin").foreach(c => require(
      !df.columns.contains(c),
      s"temperature reserves the column name '$c'; rename it first"))
    val c = counts.toDF("_grp", "_n")
    val nMin = c.agg(min(col("_n")).as("_nmin"))
    // null-safe: a null group is a real group (the Drift convention) —
    // plain === would silently DROP every null-group row from the
    // rebalanced corpus
    df.join(broadcast(c), group <=> col("_grp"))
      .crossJoin(broadcast(nMin))
      .filter(temperatureKeep(key, col("_n"), col("_nmin"), p, q))
      .drop("_grp", "_n", "_nmin")
  }

  /** Temperature rebalance computing the group counts itself (one
    * group-cardinality-sized aggregate over `df`). */
  def temperature(df: DataFrame, group: Column, key: Column,
                  p: Int, q: Int): DataFrame =
    temperatureWithCounts(df,
      df.groupBy(group.as("_tgrp")).agg(count(lit(1)).as("_tn")),
      group, key, p, q)

  /** DuckDB mirror of [[temperatureKeep]] (HUGEINT is exact through
    * the same digit budget). */
  /** Exact-integer data-mixture plan by LARGEST-REMAINDER (Hamilton)
    * apportionment: split a token `budget` across domains proportional
    * to integer weights, with every allocation decision exact —
    * `base = (budget·w) div W`, the `budget − Σbase` leftover units
    * going one each to the largest fractional remainders
    * (`(budget·w) mod W`, ties on domain ascending). This is THE
    * standard way to turn float mixture weights into an integer token
    * ledger that sums exactly to the budget — iterative rounding
    * drifts, floor-only under-allocates.
    *
    * Allocations above a domain's available supply are CAPPED and
    * FLAGGED (`capped = 1`, shortfall reported); re-spreading the
    * surplus is a planner-loop decision (re-run with the flagged
    * domain's weight zeroed), deliberately not hidden inside one
    * call — silent redistribution would misreport the requested mix.
    * A weighted domain ABSENT from `avail` is the degenerate cap: it
    * is kept (left join from the weights), reported with
    * `n_avail = 0, alloc_tokens = 0, capped = 1` — never silently
    * dropped, which would under-allocate the budget with no flag.
    *
    * Scale shape: the per-domain count aggregate is the only corpus
    * pass (map-side combinable, domain-width output); the
    * apportionment itself runs on the domain-width frame (a window
    * over remainders of a vocabulary-sized list — driver-safe at any
    * corpus scale because domains are bounded by design).
    *
    * Overflow: `budget·w ≤ Long.Max` requires `budget < 2^63/W`; with
    * milli weights (W ≤ ~10⁶) that is ~9·10¹² tokens — beyond that,
    * widen to DECIMAL(38) (the joinForecast posture). */
  def mixturePlan(avail: DataFrame, domainCol: String, nCol: String,
                  weights: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val w = weights.select(col("domain"),
      col("weight_milli").cast("long").as("weight_milli"))
    val joined = w
      .join(avail.select(col(domainCol).as("domain"),
        col(nCol).cast("long").as("n_avail")), Seq("domain"), "left")
      .withColumn("n_avail", coalesce(col("n_avail"), lit(0L)))
      .crossJoin(broadcast(
        w.agg(sum("weight_milli").cast("long").as("_W"))))
      .withColumn("_base", expr(s"($budget * weight_milli) div _W"))
      .withColumn("_rem", expr(s"($budget * weight_milli) % _W"))
      // consumed twice (leftover total + allocation); checkpoint the
      // domain-width frame so the corpus-side count aggregate under
      // `avail` runs once
      .localCheckpoint()
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("_rem").desc, col("domain").asc)
    joined
      .crossJoin(broadcast(joined.agg(
        (lit(budget) - sum("_base")).cast("long").as("_leftover"))))
      .withColumn("_rank", row_number().over(win))
      .withColumn("_alloc",
        col("_base") + when(col("_rank") <= col("_leftover"), 1L)
          .otherwise(0L))
      .withColumn("alloc_tokens",
        least(col("_alloc"), col("n_avail")).cast("long"))
      .withColumn("capped",
        (col("_alloc") > col("n_avail")).cast("int"))
      .withColumn("keep_milli",
        expr("CASE WHEN n_avail = 0 THEN 0 " +
          "ELSE (1000 * alloc_tokens) div n_avail END").cast("long"))
      .select(col("domain"), col("n_avail"), col("weight_milli"),
        col("alloc_tokens"), col("capped"), col("keep_milli"))
      .orderBy("domain")
  }

  /** DuckDB mirror of [[mixturePlan]]; `weightValues` is the literal
    * VALUES body `('src0',100),…`. */
  def mixturePlanSql(availSql: String, weightValues: String,
                     budget: Long): String =
    s"""
      WITH w(domain, weight_milli) AS (VALUES $weightValues),
      avail AS ($availSql),
      tot AS (SELECT CAST(SUM(weight_milli) AS BIGINT) AS W FROM w),
      base AS (
        SELECT w.domain, CAST(COALESCE(a.n_avail, 0) AS BIGINT) AS n_avail,
               CAST(w.weight_milli AS BIGINT) AS weight_milli,
               ($budget * w.weight_milli) // t.W AS b,
               ($budget * w.weight_milli) % t.W AS rem
        FROM w LEFT JOIN avail a ON a.domain = w.domain CROSS JOIN tot t),
      lo AS (SELECT CAST($budget - SUM(b) AS BIGINT) AS leftover
             FROM base),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, domain) AS rk
        FROM base)
      SELECT r.domain, r.n_avail, r.weight_milli,
             CAST(LEAST(r.b + CASE WHEN r.rk <= l.leftover THEN 1
                                   ELSE 0 END, r.n_avail) AS BIGINT)
               AS alloc_tokens,
             CAST(r.b + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
                  > r.n_avail AS INT) AS capped,
             CAST(CASE WHEN r.n_avail = 0 THEN 0
               ELSE (1000 * LEAST(r.b + CASE WHEN r.rk <= l.leftover
                 THEN 1 ELSE 0 END, r.n_avail)) // r.n_avail END
               AS BIGINT) AS keep_milli
      FROM ranked r CROSS JOIN lo l
      ORDER BY r.domain
    """

  def temperatureKeepSql(keyExpr: String, nExpr: String,
                         nMinExpr: String, p: Int, q: Int): String = {
    validateTemperature(p, q)
    val u = s"CAST(CAST('0x' || substr(md5(CAST($keyExpr AS VARCHAR))," +
      s" 1, 4) AS BIGINT) AS HUGEINT)"
    val lhs = (Seq.fill(q)(u) ++
      Seq.fill(q - p)(s"CAST($nExpr AS HUGEINT)")).mkString(" * ")
    val rhs = (Seq.fill(q)(s"CAST($Buckets AS HUGEINT)") ++
      Seq.fill(q - p)(s"CAST($nMinExpr AS HUGEINT)")).mkString(" * ")
    s"(($lhs) <= ($rhs))"
  }
}
