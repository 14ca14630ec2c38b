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
}
