package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Sampling

/** Deterministic-sampling family — training-data corpus construction
  * ops (see [[graft.ops.Sampling]] for why hash sampling, not rand()).
  * Both queries aggregate the sample to per-group counts so the
  * oracle compares the exact membership decision, not 60k rows. */
object SampleQueries extends QueryPack {

  /** ~10% uniform sample (6554/65536) keyed on the stable row id. */
  private val UniformRate = 6554

  /** Downsample dominant English to ~20%, keep zh whole, half the rest
    * — the canonical language-rebalancing shape. */
  private val StratRates = Map("en" -> 13107, "zh" -> 65536)
  private val StratDefault = 32768

  val hashSample = GQuery(
    "q_hash_sample",
    (s, d) => Sampling
      .sample(Tables.orders(s, d), col("o_orderkey"), UniformRate)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_sampled"), min("o_orderkey").as("min_key"))
      .orderBy("o_orderpriority"),
    Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n_sampled,
             CAST(MIN(o_orderkey) AS BIGINT) AS min_key
      FROM orders WHERE ${Sampling.sampledBySql("o_orderkey", UniformRate)}
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """))

  val stratifiedSample = GQuery(
    "q_stratified_sample",
    (s, d) => Sampling
      .stratified(Tables.documents(s, d), col("lang"), col("doc_id"),
        StratRates, StratDefault)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang"),
    Some(s"""
      SELECT lang, COUNT(*) AS n_docs
      FROM documents
      WHERE ${Sampling.stratifiedSql("lang", "doc_id", StratRates, StratDefault)}
      GROUP BY lang ORDER BY lang
    """))

  /** Exact per-domain cap at 10 docs/source (md5-priority selection —
    * see [[Sampling.domainCap]] for why hash priority, not rand()).
    * The aggregate compares the exact kept-set membership per domain
    * (count + id-sum signature), not just sizes. */
  val domainCap = GQuery(
    "q_domain_cap",
    (s, d) => Sampling
      .domainCap(Tables.documents(s, d), col("source"), col("doc_id"),
        cap = 10)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum("doc_id").as("sum_ids"),
        min("doc_id").as("min_id"))
      .orderBy("source"),
    Some(s"""
      SELECT source, COUNT(*) AS n_kept,
             CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
             CAST(MIN(doc_id) AS BIGINT) AS min_id
      FROM (SELECT source, doc_id,
              ${Sampling.domainCapRankSql("source", "doc_id")} AS rn
            FROM documents)
      WHERE rn <= 10
      GROUP BY source ORDER BY source
    """))

  /** Per-row-rate sampling: keep probability follows document length
    * (a stand-in for any quality score) — docs >= 437 chars always
    * kept, shorter ones proportionally. The aggregate compares exact
    * kept-set membership per lang. */
  val weightedSample = GQuery(
    "q_weighted_sample",
    (s, d) => Sampling
      .weighted(Tables.documents(s, d), col("doc_id"),
        col("n_chars") * 150)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("sum_ids"))
      .orderBy("lang"),
    Some(s"""
      SELECT lang, COUNT(*) AS n_kept,
             CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      FROM documents
      WHERE ${Sampling.weightedBySql("doc_id", "n_chars * 150")}
      GROUP BY lang ORDER BY lang
    """))

  private val ShuffleSeed = "epoch-0"
  private val NumShards = 16

  /** Deterministic global corpus shuffle into training shards
    * ([[Sampling.globalShuffle]]): seeded md5 priority gives the
    * permutation, its top 16 bits give the shard — one hash decides
    * both, one shuffle materializes them. The result is an
    * ORDER-SENSITIVE per-shard signature (rank-weighted id checksum +
    * the first doc in shard order), so the oracle proves the exact
    * permutation, not just shard membership. The per-shard window and
    * aggregate reuse the shuffle's hash partitioning — the query
    * plans exactly one Exchange (plan-asserted in SamplingSpec; the
    * window re-sorts in-partition because the priority column is
    * recomputed, a per-partition cost that never re-shuffles). */
  val corpusShards = GQuery(
    "q_corpus_shards",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val shuffled = Sampling.globalShuffle(
        Tables.documents(s, d).select("doc_id"),
        col("doc_id"), ShuffleSeed, NumShards)
      val w = Window.partitionBy(col("shard"))
        .orderBy(Sampling.shufflePriority(col("doc_id"), ShuffleSeed).asc,
          col("doc_id").asc)
      shuffled
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          max(when(col("rn") === 1L, col("doc_id"))).as("first_doc"),
          sum(col("doc_id") * col("rn")).as("ordered_checksum"))
        .orderBy("shard")
    },
    Some(s"""
      WITH pri AS (
        SELECT doc_id,
               ${Sampling.shufflePrioritySql("doc_id", ShuffleSeed)} AS p,
               ${Sampling.shardOfSql("doc_id", ShuffleSeed, NumShards)}
                 AS shard
        FROM documents),
      ranked AS (
        SELECT shard, doc_id,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY p, doc_id)
                 AS rn
        FROM pri)
      SELECT shard, COUNT(*) AS n_docs,
             CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
               AS first_doc,
             CAST(SUM(doc_id * rn) AS BIGINT) AS ordered_checksum
      FROM ranked GROUP BY shard ORDER BY shard
    """))

  /** Budgeted best-first selection with per-group budgets — the
    * dataset-mixing shape ([[Sampling.selectToBudget]]): fill each
    * language's character budget (en gets 2×) with the longest
    * documents first. First-overrun row included; membership
    * compared exactly via (count, cost-sum, id-sum) per lang. */
  val budgetSelect = GQuery(
    "q_budget_select",
    (s, d) => Sampling
      .selectToBudget(Tables.documents(s, d),
        group = col("lang"), score = col("n_chars"),
        cost = col("n_chars"), key = col("doc_id"),
        budget = when(col("lang") === "en", 40000L).otherwise(20000L))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("chars_kept"),
        sum("doc_id").as("sum_ids"))
      .orderBy("lang"),
    Some(s"""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
             CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      FROM (
        SELECT lang, doc_id, n_chars,
               ${Sampling.spentBeforeSql("lang", "n_chars", "n_chars",
                 "doc_id")} AS spent
        FROM documents)
      WHERE COALESCE(spent, 0) <
            (CASE WHEN lang = 'en' THEN 40000 ELSE 20000 END)
      GROUP BY lang ORDER BY lang
    """))

  /** Temperature rebalancing at alpha = 1/2 over languages
    * ([[Sampling.temperature]]): dominant en is downsampled toward
    * sqrt-proportional, the smallest language is kept whole — with
    * the keep decision an exact integer comparison in BOTH engines
    * (no pow(), no float rounding; see the op's scaladoc). The result
    * compares exact kept-set membership per lang (count + id-sum)
    * against the full before-counts, so a one-row drift anywhere
    * fails the hash. */
  val temperatureSample = GQuery(
    "q_temperature_sample",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val kept = Sampling
        .temperature(docs, col("lang"), col("doc_id"), p = 1, q = 2)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("id_sum"))
      docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
        .join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_before"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("id_sum"), lit(0L)).as("id_sum"))
        .orderBy("lang")
    },
    Some {
      val keep = Sampling.temperatureKeepSql("doc_id", "n", "nmin", 1, 2)
      s"""
      WITH w AS (
        SELECT doc_id, lang, COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents),
      w2 AS (SELECT *, MIN(n) OVER () AS nmin FROM w)
      SELECT lang, COUNT(*) AS n_before,
             CAST(COALESCE(SUM(CASE WHEN $keep THEN 1 END), 0) AS BIGINT)
               AS n_kept,
             CAST(COALESCE(SUM(CASE WHEN $keep THEN doc_id END), 0)
               AS BIGINT) AS id_sum
      FROM w2 GROUP BY lang ORDER BY lang
    """
    })

  /** Mixture weights: source k gets 10·(k+1) milli — a sloped mix so
    * remainders differ — with a 20k-token budget chosen so the
    * heaviest few domains CAP at sf0.01 supply (~1.2k tokens each)
    * while the light ones allocate freely: both branches of the flag
    * are exercised where the oracle can see them. */
  private val MixWeights: Seq[(String, Long)] =
    (0 until 20).map(k => s"src$k" -> (10L * (k + 1)))
  private val MixBudget = 20000L

  /** Largest-remainder token apportionment across sources
    * ([[Sampling.mixturePlan]]): allocations sum exactly to the
    * budget, remainders ranked deterministically, supply caps
    * flagged. Eager: the domain-width frame checkpoints at
    * construction. */
  val mixturePlan = GQuery(
    "q_mixture_plan",
    (s, d) => {
      import s.implicits._
      val avail = Tables.documents(s, d)
        .groupBy(col("source").as("domain"))
        .agg(sum(graft.ops.TextOps.tokenCount(col("text")).cast("long"))
          .cast("long").as("n_tokens"))
      val weights = MixWeights.toDF("domain", "weight_milli")
      Sampling.mixturePlan(avail, "domain", "n_tokens", weights,
        MixBudget)
    },
    Some(Sampling.mixturePlanSql(
      """SELECT source AS domain,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_avail
         FROM documents GROUP BY source""",
      MixWeights.map { case (dm, w) => s"('$dm',$w)" }.mkString(","),
      MixBudget)),
    eager = true)

  def all: Seq[GQuery] =
    Seq(hashSample, stratifiedSample, domainCap, weightedSample,
      corpusShards, budgetSelect, temperatureSample, mixturePlan)
}
