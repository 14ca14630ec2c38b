package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection — the training-data hygiene
  * operator: find corpus documents that overlap an evaluation set's
  * n-grams, so eval answers don't leak into training data. (The
  * standard recipe — exact n-gram collision against the benchmark,
  * as in the GPT-3/PaLM decontamination appendices — not fuzzy
  * similarity: a single shared long n-gram is already a leak signal.)
  *
  * Shape (the 100 TB contract): the eval side is SMALL by nature
  * (benchmarks are thousands of documents, not billions), so its
  * distinct shingle set is broadcast — the corpus is scanned ONCE,
  * exploded to distinct per-doc shingles, hash-joined against the
  * broadcast set, and re-aggregated by doc id. One wide shuffle (the
  * per-doc agg, map-side combinable), no corpus self-join, no driver
  * collect. At production scale key the join on `xxhash64(shingle)`
  * instead of the raw string to keep shuffle rows fixed-width; the
  * oracle-gated query joins on the string so DuckDB can mirror it
  * exactly.
  */
object Contamination {

  /** Per-document overlap stats of `docs` against `evalDocs`:
    * `n_ngrams` distinct word-k-gram count, `n_hits` of them found in
    * the eval set, exact per-mille ratio, and the contamination flag
    * at `flagAtMille`. Uses [[Dedup.shingles]] (distinct k-grams, same
    * degenerate-short-doc convention as the dedup family).
    *
    * Contract for NULL text: such documents carry no n-grams, so they
    * are excluded from the stats output (filtered explicitly here,
    * not dropped as an explode() side effect) and survive
    * [[decontaminate]] unflagged — a null document cannot leak eval
    * content. Callers joining stats back to the corpus must expect
    * null-text ids to be absent.
    */
  def overlapStats(docs: DataFrame, evalDocs: DataFrame,
                   idCol: String, textCol: String,
                   k: Int, flagAtMille: Int): DataFrame = {
    val evalShingles = evalDocs
      .filter(col(textCol).isNotNull)
      .select(explode(Dedup.shingles(col(textCol), k)).as("_sh"))
      .distinct()
      .withColumn("_hit", lit(1))
    val docShingles = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(Dedup.shingles(col(textCol), k)).as("_sh"))
    docShingles
      .join(broadcast(evalShingles), Seq("_sh"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_ngrams"),
        count(col("_hit")).as("n_hits"))
      .withColumn("contaminated_milli",
        expr("n_hits * 1000 div n_ngrams"))
      .withColumn("is_contaminated",
        (col("contaminated_milli") >= flagAtMille).cast("int"))
  }

  /** Decontaminate: drop every document the stats flag. Returns the
    * surviving documents unchanged (all columns pass through). */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame,
                    idCol: String, textCol: String,
                    k: Int, flagAtMille: Int): DataFrame = {
    val flagged = overlapStats(docs, evalDocs, idCol, textCol, k, flagAtMille)
      .filter(col("is_contaminated") === 1)
      .select(idCol)
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}
