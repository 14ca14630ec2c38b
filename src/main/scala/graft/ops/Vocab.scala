package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary building + out-of-vocabulary coverage — the
  * tokenizer-prep loop: build the top-N word list from the corpus,
  * then score every document's OOV rate against it (high-OOV docs
  * are noise/foreign/garbled candidates; the aggregate OOV curve
  * tells you whether N is big enough).
  *
  * Scale shape: the vocab is ONE token-explode → word groupBy
  * (map-side combined, output = distinct-word cardinality) → global
  * top-N, which Spark plans as TakeOrderedAndProject — per-partition
  * heaps of N, never a global sort (N is the vocab size, bounded by
  * design). The OOV pass broadcasts the N-row vocab and pays one
  * Exchange on the doc key for the per-doc counts. Ranking ties are
  * broken (count DESC, word ASC) so the vocab — and therefore every
  * downstream OOV number — is deterministic cross-engine.
  */
object Vocab {

  /** Top-`n` words by corpus frequency: (word, n_occurrences, rank),
    * rank 1-based by (count DESC, word ASC). */
  def topWords(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n > 0, s"vocab size must be positive: $n")
    docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("word").asc)
      .limit(n)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_occurrences").desc, col("word").asc)))
  }

  /** Per-document OOV stats against `vocab` (a [[topWords]] result or
    * any one-column word list): token count, OOV count, and the OOV
    * milli-rate by integer division. Empty-string tokens (collapsed
    * whitespace artifacts) are not counted. */
  def oovStats(docs: DataFrame, textCol: String, idCol: String,
               vocab: DataFrame): DataFrame = {
    val v = vocab.select(col("word").as("_v_word")).distinct()
    docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol)))
        .as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(v), col("word") === col("_v_word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("_v_word").isNull, 1)).as("n_oov"))
      .withColumn("oov_milli",
        expr("CAST(1000 * n_oov DIV n_tokens AS BIGINT)"))
  }

  /** DuckDB mirror: the vocab CTE (same tie-break) and the per-doc
    * OOV arithmetic, over `table`. */
  def oovStatsSql(table: String, textExpr: String, idExpr: String,
                  n: Int): String = s"""
    WITH tok AS (
      SELECT $idExpr AS id, unnest(string_split($textExpr, ' ')) AS word
      FROM $table),
    tok2 AS (SELECT * FROM tok WHERE word <> ''),
    vocab AS (
      SELECT word FROM tok2 GROUP BY word
      ORDER BY COUNT(*) DESC, word ASC LIMIT $n),
    perdoc AS (
      SELECT t.id, COUNT(*) AS n_tokens,
             COUNT(CASE WHEN v.word IS NULL THEN 1 END) AS n_oov
      FROM tok2 t LEFT JOIN vocab v USING (word)
      GROUP BY t.id)
    SELECT id AS $idExpr, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CAST(1000 * n_oov // n_tokens AS BIGINT) AS oov_milli
    FROM perdoc"""
}
