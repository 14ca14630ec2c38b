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
}
