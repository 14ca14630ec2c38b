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
    require(prefixLen > 0 && lenBand > 0 && maxDist >= 0,
      s"invalid fuzzy parameters: prefixLen=$prefixLen " +
        s"lenBand=$lenBand maxDist=$maxDist")
    val base = df
      .select(id.cast("long").as("_id"),
        TextOps.canonicalize(text).as("_norm"))
      .select(col("_id"),
        substring(col("_norm"), 1, prefixLen).as("_sig"),
        (length(col("_norm")) / lenBand).cast("long").as("_band"),
        element_at(split(col("_norm"), " "), 1).as("_tok"))
    Dedup
      .bucketPairs(base, Seq("_band", "_tok"),
        struct(col("_id"), col("_sig")), maxBucket)
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        levenshtein(col("a._sig"), col("b._sig"), maxDist).as("dist"))
      .filter(col("dist") =!= -1) // thresholded variant: -1 = "beyond"
      .select("id_a", "id_b", "dist")
  }

  /** DuckDB mirror of [[editDistancePairs]] (no maxBucket — oracle
    * callers pass a cap that cannot bite, same posture as LSH).
    * DuckDB has no thresholded levenshtein, so the mirror filters the
    * full distance — same result set by definition of the
    * threshold. */
  def editDistancePairsSql(table: String, idExpr: String,
                           textExpr: String, prefixLen: Int = 64,
                           lenBand: Int = 16, maxDist: Int = 8): String =
    s"""WITH _fz_base AS (
      SELECT CAST($idExpr AS BIGINT) AS _id,
             substr(_norm, 1, $prefixLen) AS _sig,
             CAST(length(_norm) // $lenBand AS BIGINT) AS _band,
             split_part(_norm, ' ', 1) AS _tok
      FROM (SELECT $idExpr, ${TextOps.canonicalizeSql(textExpr)} AS _norm
            FROM $table))
    SELECT a._id AS id_a, b._id AS id_b,
           CAST(levenshtein(a._sig, b._sig) AS INT) AS dist
    FROM _fz_base a JOIN _fz_base b
      ON a._band = b._band AND a._tok = b._tok AND a._id < b._id
    WHERE levenshtein(a._sig, b._sig) <= $maxDist"""
}
