package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over the document corpus — the ranking
  * primitive behind retrieval-based corpus curation (dedup against a
  * query set, topical subset extraction, retrieval-filtered training
  * mixes). Reference scope: the reference engine has no retrieval
  * surface; this is part of the training-data extension family
  * (SURVEY.md north star), same posture as TF-IDF
  * (`q_tfidf_top_terms`).
  *
  * Arithmetic contract: every quantity is BIGINT with integral `div`
  * (floor on the all-positive domain), so the score hashes identically
  * cross-engine — the repo-wide no-floats-in-gates rule. The classic
  * float BM25 maps onto integer milli-fixed-point:
  *
  *  - `idf_milli(t) = (1000·N) div df(t) − 1000` — a linear rarity
  *    surrogate for `log((N−df+0.5)/(df+0.5))`. Monotone in 1/df
  *    (the only property ranking needs), exact in integers, and it
  *    keeps resolution on this corpus's small uniform vocabulary where
  *    a bitlen-log surrogate (the unigram-surprisal trick) would
  *    collapse every common term to 0.
  *  - `lennorm_milli(d) = (1000−b) + (b·1000·dl) div avgdl_milli`
  *    with `b = 750` — the standard length normalization.
  *  - `sat_milli = (1000·tf·(k1+1000)) div (1000·tf + (k1·lennorm) div 1000)`
  *    with `k1 = 1200` — tf saturation.
  *  - contribution `= (idf_milli · sat_milli) div 1000`, summed over
  *    matched query terms.
  *
  * Scale shape (the part that matters at 100 TB): the corpus is
  * scanned ONCE and tokens are filtered to the query-term set —
  * a broadcast of the few-row term list — BEFORE the (doc, term)
  * aggregation, so the full term-frequency matrix is never built for
  * a k-term query workload. Document length is a per-row `size()`
  * projection carried through the explode (no doc-keyed join, no
  * second shuffle); df comes from the already-matched tf frame; the
  * corpus-global (N, total-token) stats are a one-row aggregate
  * cross-joined in (auto-broadcast). The only exchanges are the
  * matched (doc, term) partial-aggregated groupBy and the bounded
  * [[Similarity.TopKAgg]] top-k (≤ k rows per query per partition
  * enter the shuffle).
  */
object Retrieval {

  /** tf-saturation strength (milli). */
  val K1Milli = 1200L
  /** length-normalization strength (milli). */
  val BMilli = 750L

  /** BM25 top-`k` documents per query. `queryTerms` is a
    * (query_id: Int, term: String) relation — distinct terms per
    * query; duplicate terms would double-count. Output:
    * (query_id, doc_id, score_milli, rank) ordered by (query_id,
    * rank); ties break on doc_id ascending. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    // corpus-global stats: one row, auto-broadcast on the cross join
    val stats = docs.agg(
      count(lit(1)).cast("long").as("_n"),
      sum(TextOps.tokenCount(col(textCol)).cast("long")).cast("long")
        .as("_tot"))
    val qt = broadcast(
      queryTerms.select(col("term").cast("string").as("_qterm")).distinct())
    // dl rides the explode as a per-row projection — no doc-keyed join.
    // The matched tf frame is consumed TWICE (df re-aggregation +
    // scoring join); without materialization each consumer replays the
    // full corpus scan+explode — the dominant cost at scale. Its size
    // is |matching docs| × |query terms| (corpus-independent for a
    // fixed workload), so an eager localCheckpoint is cheap and makes
    // the corpus text read happen exactly once.
    val matched = docs
      .select(col(idCol).as("_doc"),
        TextOps.tokenCount(col(textCol)).cast("long").as("_dl"),
        explode(TextOps.tokens(col(textCol))).as("_term"))
      .join(qt, col("_term") === col("_qterm"))
      .groupBy("_doc", "_dl", "_term")
      .agg(count(lit(1)).cast("long").as("_tf"))
      .localCheckpoint()
    val df = matched.groupBy("_term")
      .agg(count(lit(1)).cast("long").as("_df"))
    val q = broadcast(queryTerms.select(
      col("query_id").cast("int").as("query_id"),
      col("term").cast("string").as("_t2")))
    val lennorm: Column =
      lit(1000L - BMilli) +
        expr(s"($BMilli * 1000 * _dl) div ((1000 * _tot) div _n)")
    val scored = matched
      .join(broadcast(df), "_term")
      .join(q, col("_term") === col("_t2"))
      .crossJoin(stats)
      .withColumn("_lennorm", lennorm)
      .withColumn("_idf", expr("(1000 * _n) div _df - 1000"))
      .withColumn("_sat", expr(
        s"(1000 * _tf * ($K1Milli + 1000)) div " +
          s"(1000 * _tf + ($K1Milli * _lennorm) div 1000)"))
      .groupBy(col("query_id"), col("_doc"))
      .agg(sum(expr("(_idf * _sat) div 1000")).cast("long").as("_score"))
      .select(col("query_id"), col("_doc").as("neighbour_id"),
        col("_score").as("sim_scaled"))
    Similarity.topKPerQuery(scored, k)
      .select(col("query_id"), col("neighbour_id").as("doc_id"),
        col("sim_scaled").as("score_milli"), col("rank"))
  }

  /** Inverted-index construction: for every corpus term, document
    * frequency plus the first `cap` postings (doc ascending) in
    * relational form — (term, df, rank, doc_id, tf). The capped
    * posting shape is the search-index build step; df rides along as
    * the scoring metadata.
    *
    * Scale shape: one (doc, term) tf aggregation (map-side
    * combinable), then the cap via the bounded [[Similarity.TopKAgg]]
    * partial aggregate — ≤ cap postings per term per partition enter
    * the term-keyed exchange, so a hot stopword term ships `cap·P`
    * rows, not its full posting list (a window row_number would
    * materialize the whole hot-term partition before ranking — the
    * exact hot-key failure the bounded heap exists to avoid). df is
    * re-aggregated from the tf frame (no second corpus scan) and
    * joined at vocabulary width.
    *
    * The heap element is (sort key, doc id) only, so tf is re-joined
    * from the tf frame at (term, doc) — posting-width, not
    * corpus-width, because the heap already capped the left side. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    cap: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).cast("long").as("_doc"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "_doc")
      .agg(count(lit(1)).cast("long").as("tf"))
      .localCheckpoint() // consumed by df, the heap, and the tf join
    val df = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    // ascending doc order through the (desc, asc)-ordered heap:
    // negate the doc id for the sort slot
    val postings = Similarity.topKPerQuery(
      tf.select(col("term").as("query_id"), col("_doc").as("neighbour_id"),
        (-col("_doc")).as("sim_scaled")), cap)
      .select(col("query_id").as("term"), col("rank"),
        col("neighbour_id").as("doc_id"))
    postings
      .join(df, "term")
      .join(tf.select(col("term"), col("_doc").as("doc_id"), col("tf")),
        Seq("term", "doc_id"))
      .select(col("term"), col("df"), col("rank"), col("doc_id"), col("tf"))
      .orderBy("term", "rank")
  }

  /** DuckDB mirror of [[invertedIndex]] (window rank vs the engine's
    * bounded heap). */
  def invertedIndexSql(cap: Int): String =
    s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      tf AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE term <> '' GROUP BY term, doc_id),
      dfreq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      ranked AS (
        SELECT term, doc_id, tf,
               CAST(ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id)
                 AS INT) AS rank
        FROM tf)
      SELECT r.term, d.df, r.rank, r.doc_id, r.tf
      FROM ranked r JOIN dfreq d USING (term)
      WHERE r.rank <= $cap
      ORDER BY r.term, r.rank
    """

  /** DuckDB mirror of [[bm25TopK]] over `documents`; `queryValues` is
    * the literal VALUES body, e.g. `(1,'hash'),(2,'scan')`. */
  def bm25TopKSql(queryValues: String, k: Int): String =
    s"""
      WITH q(query_id, term) AS (VALUES $queryValues),
      qt AS (SELECT DISTINCT term FROM q),
      stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot
        FROM documents),
      tok AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
               unnest(string_split(text, ' ')) AS term
        FROM documents),
      mtf AS (
        SELECT t.doc_id, t.dl, t.term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok t JOIN qt USING (term)
        GROUP BY t.doc_id, t.dl, t.term),
      dfreq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM mtf GROUP BY term),
      base AS (
        SELECT q.query_id, m.doc_id,
               (1000 * s.n) // d.df - 1000 AS idf_milli,
               (1000 * m.tf * ($K1Milli + 1000)) //
                 (1000 * m.tf + ($K1Milli *
                   ((1000 - $BMilli) +
                    ($BMilli * 1000 * m.dl) // ((1000 * s.tot) // s.n)))
                  // 1000) AS sat_milli
        FROM mtf m
        JOIN dfreq d USING (term)
        JOIN q ON m.term = q.term
        CROSS JOIN stats s),
      scored AS (
        SELECT query_id, doc_id,
               CAST(SUM((idf_milli * sat_milli) // 1000) AS BIGINT)
                 AS score_milli
        FROM base GROUP BY query_id, doc_id),
      ranked AS (
        SELECT query_id, doc_id, score_milli,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY score_milli DESC, doc_id) AS INT) AS rank
        FROM scored)
      SELECT query_id, doc_id, score_milli, rank
      FROM ranked WHERE rank <= $k
      ORDER BY query_id, rank
    """
}
