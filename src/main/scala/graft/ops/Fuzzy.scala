package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance near-duplicate discovery — the entity-resolution
  * shape of fuzzy matching, complementing the token-SET family
  * (MinHash/SimHash treat a document as a bag of shingles and are
  * blind to character-level edits inside tokens; Levenshtein sees
  * exactly those: OCR noise, typo variants, template fills that
  * mutate a few characters).
  *
  * Scale shape: the classic blocked comparison. Every document maps
  * to ONE block key (a length band of its canonical form + its first
  * token); candidate pairs form only inside a block, via the same
  * groupBy-and-explode machinery as LSH banding
  * ([[Dedup.bucketPairs]] — one shuffle on the block key, never a
  * self-join, never a cross join), with the same `maxBucket` skew
  * guard for the 100 TB path. The distance itself runs on a bounded
  * PREFIX of the canonical text with Spark's thresholded
  * `levenshtein(l, r, threshold)` — O(prefixLen * threshold) banded
  * DP with early exit, not O(len^2) — so per-pair cost is a small
  * constant regardless of document size.
  *
  * Recall contract (documented, oracle-mirrored): a true fuzzy pair
  * is found iff both sides agree on the block key — pairs whose edits
  * change the first token or push the canonical length across a band
  * boundary are not discovered. That is the standard blocking
  * tradeoff (widen recall by unioning pairs from a second, shifted
  * banding if needed); the gain is that discovery cost scales with
  * bucket sizes, not corpus size squared.
  */
object Fuzzy {

  /** `(_id, _sig, _len, _tok)` projection shared by both bandings. */
  private def sigBase(df: DataFrame, id: Column, text: Column,
                      prefixLen: Int): DataFrame =
    df.select(id.cast("long").as("_id"),
        TextOps.canonicalize(text).as("_norm"))
      .select(col("_id"),
        substring(col("_norm"), 1, prefixLen).as("_sig"),
        length(col("_norm")).cast("long").as("_len"),
        element_at(split(col("_norm"), " "), 1).as("_tok"))

  private def bandedPairs(base: DataFrame, offset: Int, lenBand: Int,
                          maxDist: Int,
                          maxBucket: Option[Int]): DataFrame =
    Dedup
      .bucketPairs(
        // integer band arithmetic (Spark's `/` is double division —
        // a double key would split bands the SQL mirror's `//` keeps)
        base.withColumn("_band",
          floor((col("_len") + offset) / lenBand).cast("long")),
        Seq("_band", "_tok"),
        struct(col("_id"), col("_sig")), maxBucket)
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        levenshtein(col("a._sig"), col("b._sig"), maxDist).as("dist"))
      .filter(col("dist") =!= -1) // thresholded variant: -1 = "beyond"
      .select("id_a", "id_b", "dist")

  /** Blocked Levenshtein pairs: `(id_a, id_b, dist)` with
    * `id_a < id_b` and `dist <= maxDist`, distance measured on the
    * first `prefixLen` chars of [[TextOps.canonicalize]]d text,
    * candidates blocked on (canonical length / `lenBand`, first
    * canonical token). Each id pairs at most once (its block key is a
    * function of its text), so no distinct is needed. */
  def editDistancePairs(df: DataFrame, id: Column, text: Column,
                        prefixLen: Int = 64, lenBand: Int = 16,
                        maxDist: Int = 8,
                        maxBucket: Option[Int] = None): DataFrame = {
    validateParams(prefixLen, lenBand, maxDist)
    bandedPairs(sigBase(df, id, text, prefixLen), 0, lenBand, maxDist,
      maxBucket)
  }

  /** Recall-widened variant: the union of the base banding and a
    * HALF-BAND-SHIFTED banding, distinct'd. Covering guarantee
    * (`lenBand` even): two docs with the same first token whose
    * canonical lengths differ by LESS than `lenBand / 2` share a band
    * in at least one of the two bandings — the two boundary grids
    * interleave every half band, so a pair closer than a half band
    * straddles at most one grid's boundary and the other grid's band
    * around that boundary contains both. Upgrades the base variant's
    * "maybe co-blocked" into a quantified contract at exactly 2× the
    * discovery cost (still bucketed, still capped — never quadratic);
    * first-token edits remain out of scope by design. */
  def editDistancePairsWide(df: DataFrame, id: Column, text: Column,
                            prefixLen: Int = 64, lenBand: Int = 16,
                            maxDist: Int = 8,
                            maxBucket: Option[Int] = None): DataFrame = {
    validateParams(prefixLen, lenBand, maxDist)
    require(lenBand % 2 == 0,
      s"the covering guarantee needs an even lenBand: $lenBand")
    val base = sigBase(df, id, text, prefixLen)
    bandedPairs(base, 0, lenBand, maxDist, maxBucket)
      .unionByName(
        bandedPairs(base, lenBand / 2, lenBand, maxDist, maxBucket))
      .distinct()
  }

  private def validateParams(prefixLen: Int, lenBand: Int,
                             maxDist: Int): Unit =
    require(prefixLen > 0 && lenBand > 0 && maxDist >= 0,
      s"invalid fuzzy parameters: prefixLen=$prefixLen " +
        s"lenBand=$lenBand maxDist=$maxDist")

  private def baseCte(table: String, idExpr: String, textExpr: String,
                      prefixLen: Int, lenBand: Int): String =
    s"""WITH _fz_base AS (
      SELECT CAST($idExpr AS BIGINT) AS _id,
             substr(_norm, 1, $prefixLen) AS _sig,
             CAST(length(_norm) // $lenBand AS BIGINT) AS _band,
             CAST((length(_norm) + ${lenBand / 2}) // $lenBand AS BIGINT)
               AS _band2,
             split_part(_norm, ' ', 1) AS _tok
      FROM (SELECT $idExpr, ${TextOps.canonicalizeSql(textExpr)} AS _norm
            FROM $table))"""

  private def pairSelect(bandCol: String, maxDist: Int): String =
    s"""SELECT a._id AS id_a, b._id AS id_b,
           CAST(levenshtein(a._sig, b._sig) AS INT) AS dist
    FROM _fz_base a JOIN _fz_base b
      ON a.$bandCol = b.$bandCol AND a._tok = b._tok AND a._id < b._id
    WHERE levenshtein(a._sig, b._sig) <= $maxDist"""

  /** DuckDB mirror of [[editDistancePairs]] (no maxBucket — oracle
    * callers pass a cap that cannot bite, same posture as LSH).
    * DuckDB has no thresholded levenshtein, so the mirror filters the
    * full distance — same result set by definition of the
    * threshold. */
  def editDistancePairsSql(table: String, idExpr: String,
                           textExpr: String, prefixLen: Int = 64,
                           lenBand: Int = 16, maxDist: Int = 8): String =
    s"""${baseCte(table, idExpr, textExpr, prefixLen, lenBand)}
    ${pairSelect("_band", maxDist)}"""

  /** DuckDB mirror of [[editDistancePairsWide]]. */
  def editDistancePairsWideSql(table: String, idExpr: String,
                               textExpr: String, prefixLen: Int = 64,
                               lenBand: Int = 16,
                               maxDist: Int = 8): String =
    s"""${baseCte(table, idExpr, textExpr, prefixLen, lenBand)}
    SELECT DISTINCT * FROM (
      ${pairSelect("_band", maxDist)}
      UNION ALL
      ${pairSelect("_band2", maxDist)})"""

  /** Blocking-quality audit — the TUNING INPUT for lenBand/prefixLen
    * on a 100 TB dedup: pairs completeness (what fraction of TRUE
    * fuzzy pairs the blocking discovers) and reduction ratio (what
    * fraction of the quadratic pair space it never prices), measured
    * on a bounded labeled sample (`id < sampleMaxId`).
    *
    * The truth side is deliberately QUADRATIC over the sample — the
    * point is to price what blocking misses, so the truth cannot
    * block (the n-gram Jaccard ground-truth posture: verifier shape,
    * bounded by the sample, never the production path). Discovery is
    * the production [[editDistancePairsWide]]. Candidates pass the
    * same distance filter as the truth, so candidates ⊆ truth and
    * `n_hit = n_candidates` — the semi-join count is kept anyway as
    * the subset-property check rather than assumed.
    *
    * One row: n_docs, all_pairs, n_truth, n_candidates, n_hit,
    * completeness_milli (null if the sample holds no true pairs),
    * reduction_milli. All integer.
    */
  def blockingQuality(df: DataFrame, id: Column, text: Column,
                      sampleMaxId: Long, prefixLen: Int = 64,
                      lenBand: Int = 16, maxDist: Int = 8): DataFrame = {
    validateParams(prefixLen, lenBand, maxDist)
    val sample = df.filter(id.cast("long") < sampleMaxId)
    val base = sigBase(sample, id, text, prefixLen)
    val a = base.select(col("_id").as("_ta"), col("_sig").as("_sa"))
    val b = base.select(col("_id").as("_tb"), col("_sig").as("_sb"))
    val truth = a.join(b, col("_ta") < col("_tb"))
      .filter(levenshtein(col("_sa"), col("_sb"), maxDist) =!= -1)
      .select(col("_ta"), col("_tb"))
    val cand = editDistancePairsWide(sample, id, text, prefixLen,
      lenBand, maxDist, maxBucket = None)
    val hit = cand.join(truth,
      cand("id_a") === truth("_ta") && cand("id_b") === truth("_tb"),
      "left_semi")
    val nDocs = base.agg(count(lit(1)).cast("long").as("n_docs"))
    val nTruth = truth.agg(count(lit(1)).cast("long").as("n_truth"))
    val nCand = cand.agg(count(lit(1)).cast("long").as("n_candidates"))
    val nHit = hit.agg(count(lit(1)).cast("long").as("n_hit"))
    nDocs.crossJoin(broadcast(nTruth))
      .crossJoin(broadcast(nCand))
      .crossJoin(broadcast(nHit))
      .select(col("n_docs"),
        expr("n_docs * (n_docs - 1) div 2").as("all_pairs"),
        col("n_truth"), col("n_candidates"), col("n_hit"),
        expr("(1000 * n_hit) div nullif(n_truth, 0)")
          .as("completeness_milli"),
        expr("(1000 * (n_docs * (n_docs - 1) div 2 - n_candidates)) " +
          "div nullif(n_docs * (n_docs - 1) div 2, 0)")
          .as("reduction_milli"))
  }

  /** DuckDB mirror of [[blockingQuality]]. */
  def blockingQualitySql(table: String, idExpr: String,
                         textExpr: String, sampleMaxId: Long,
                         prefixLen: Int = 64, lenBand: Int = 16,
                         maxDist: Int = 8): String = {
    val sampled =
      s"(SELECT * FROM $table WHERE CAST($idExpr AS BIGINT) < $sampleMaxId)"
    s"""${baseCte(sampled, idExpr, textExpr, prefixLen, lenBand)},
    _bq_truth AS (
      SELECT a._id AS ta, b._id AS tb
      FROM _fz_base a JOIN _fz_base b ON a._id < b._id
      WHERE levenshtein(a._sig, b._sig) <= $maxDist),
    _bq_cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        ${pairSelect("_band", maxDist)}
        UNION ALL
        ${pairSelect("_band2", maxDist)})),
    _bq_hit AS (
      SELECT c.id_a, c.id_b FROM _bq_cand c
      JOIN _bq_truth t ON c.id_a = t.ta AND c.id_b = t.tb),
    _bq_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM _fz_base)
    SELECT n_docs,
           n_docs * (n_docs - 1) // 2 AS all_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM _bq_truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM _bq_cand)
             AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM _bq_hit) AS n_hit,
           (1000 * (SELECT COUNT(*) FROM _bq_hit))
             // nullif((SELECT COUNT(*) FROM _bq_truth), 0)
             AS completeness_milli,
           (1000 * (n_docs * (n_docs - 1) // 2 -
                    (SELECT COUNT(*) FROM _bq_cand)))
             // nullif(n_docs * (n_docs - 1) // 2, 0)
             AS reduction_milli
    FROM _bq_n"""
  }
}
