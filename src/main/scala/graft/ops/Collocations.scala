package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI collocation mining — adjacent token pairs that co-occur far
  * more often than their unigram frequencies predict. The standard
  * corpus-analysis signal for tokenizer/vocab induction (merge-pair
  * candidates), boilerplate phrase discovery, and multi-word-entity
  * spotting. Reference scope: none — training-data extension family.
  *
  * Arithmetic contract: the PMI `log2(N·c(ab) / (c(a)·c(b)))` uses the
  * repo's integer bitlen surrogate (`length(bin(x))` is exact in both
  * engines; libm `ln` is not):
  *
  *   `pmi_bit = bitlen(N · c_ab) − bitlen(c_a · c_b)`
  *
  * which is log2 within ±1 — enough to rank collocations, exactly
  * hashable. Products stay in BIGINT: with N bigram instances total,
  * `N·c_ab ≤ N²` and `c_a·c_b ≤ N²`, so the math is safe to N ≈ 3·10⁹
  * bigrams (~25 GB of text per partition-global count — far beyond any
  * single gate; at 100 TB the counts themselves still fit BIGINT but
  * the products would need the DECIMAL(38) widening documented on
  * [[Skew.joinForecast]]).
  *
  * Scale shape: one bigram explode → (a,b) groupBy (map-side
  * combinable, output bounded by the pair-vocabulary), unigram counts
  * re-aggregated FROM the pair frame (no second corpus scan: c(a) =
  * Σ_b c(a,b) over the left slot and symmetrically for the right slot
  * — the final bigram of each doc is the one instance missing from
  * the left-slot margin, a deliberate margin convention the oracle
  * mirrors), then two vocabulary-sized joins keyed on the token (AQE
  * absorbs hot-token skew). The min-count filter prunes the long tail
  * BEFORE the joins; the final global rank is TakeOrderedAndProject.
  */
object Collocations {

  /** Top-`k` collocations among bigrams seen at least `minCount`
    * times: (term_a, term_b, c_ab, c_a, c_b, pmi_bit), ranked by
    * (pmi_bit DESC, c_ab DESC, term_a, term_b). Margins c_a / c_b are
    * the left-slot / right-slot totals of the bigram frame itself. */
  def topPmi(docs: DataFrame, textCol: String, minCount: Int,
             k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1,
      s"topPmi needs minCount/k >= 1, got $minCount/$k")
    val pairs = docs
      .select(explode(TextOps.bigrams(col(textCol))).as("_bg"))
      .select(split(col("_bg"), " ").as("_p"))
      .select(col("_p").getItem(0).as("term_a"),
        col("_p").getItem(1).as("term_b"))
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).cast("long").as("c_ab"))
    val leftM = pairs.groupBy(col("term_a"))
      .agg(sum("c_ab").cast("long").as("c_a"))
    val rightM = pairs.groupBy(col("term_b"))
      .agg(sum("c_ab").cast("long").as("c_b"))
    val total = pairs.agg(sum("c_ab").cast("long").as("_n"))
    pairs
      .filter(col("c_ab") >= minCount)
      .join(leftM, "term_a")
      .join(rightM, "term_b")
      .crossJoin(total)
      .withColumn("pmi_bit",
        (length(bin(col("_n") * col("c_ab"))) -
          length(bin(col("c_a") * col("c_b")))).cast("int"))
      .select("term_a", "term_b", "c_ab", "c_a", "c_b", "pmi_bit")
      .orderBy(col("pmi_bit").desc, col("c_ab").desc,
        col("term_a").asc, col("term_b").asc)
      .limit(k)
  }

  /** DuckDB mirror of [[topPmi]]. */
  def topPmiSql(minCount: Int, k: Int): String =
    s"""
      WITH bg AS (
        SELECT unnest(${TextOps.bigramsSql("text")}) AS bg
        FROM documents),
      pairs AS (
        SELECT string_split(bg, ' ')[1] AS term_a,
               string_split(bg, ' ')[2] AS term_b,
               CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY 1, 2),
      lm AS (SELECT term_a, CAST(SUM(c_ab) AS BIGINT) AS c_a
             FROM pairs GROUP BY term_a),
      rm AS (SELECT term_b, CAST(SUM(c_ab) AS BIGINT) AS c_b
             FROM pairs GROUP BY term_b),
      tot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM pairs)
      SELECT p.term_a, p.term_b, p.c_ab, lm.c_a, rm.c_b,
             CAST(length(bin(t.n * p.c_ab)) -
                  length(bin(lm.c_a * rm.c_b)) AS INT) AS pmi_bit
      FROM pairs p
      JOIN lm USING (term_a)
      JOIN rm USING (term_b)
      CROSS JOIN tot t
      WHERE p.c_ab >= $minCount
      ORDER BY pmi_bit DESC, p.c_ab DESC, p.term_a, p.term_b
      LIMIT $k
    """
}
