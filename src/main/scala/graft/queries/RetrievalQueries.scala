package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Collocations, Graph, Retrieval}

/** Retrieval / graph-centrality / collocation gates — the corpus-
  * curation ranking family (keyword retrieval for topical filtering,
  * link centrality for crawl quality weighting, PMI for tokenizer
  * merge-pair induction). All-integer scores per the repo arithmetic
  * contract; every result carries a total ORDER BY in both forms. */
object RetrievalQueries extends QueryPack {

  /** Fixed keyword workload: three 3-term queries over the corpus
    * vocabulary (mixed common/rare so idf and length-norm both bite).
    * One source of truth for both engines' literal term lists. */
  private val BmQueries: Seq[(Int, String)] = Seq(
    1 -> "hash", 1 -> "join", 1 -> "merge",
    2 -> "customer", 2 -> "query", 2 -> "window",
    3 -> "vector", 3 -> "scan", 3 -> "slow")

  private def bmValues: String =
    BmQueries.map { case (q, t) => s"($q,'$t')" }.mkString(",")

  val bm25 = GQuery(
    "q_bm25_topk",
    (s, d) => {
      import s.implicits._
      val q = BmQueries.toDF("query_id", "term")
      // hash-spread: the tokenize/tf explode is one heavy scan-side
      // pass over a single-row-group file (Tables.spread scaladoc)
      Retrieval.bm25TopK(Tables.spread(s, Tables.documents(s, d),
          "doc_id"), "doc_id", "text", q, k = 5)
        .orderBy("query_id", "rank")
    },
    Some(Retrieval.bm25TopKSql(bmValues, k = 5)),
    eager = true) // matched-tf localCheckpoint runs jobs at construction

  /** 5 damped rounds over the deterministic synthetic link graph
    * (outdeg ∈ {2,3} permutation edges over the contiguous doc-id
    * space — stands in for crawl hyperlink extraction, which this
    * corpus does not carry). Eager: the iteration loop materializes
    * each round at construction time. */
  val pagerank = GQuery(
    "q_pagerank",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val edges = Graph.syntheticEdges(docs, "doc_id")
      Graph.pagerank(docs, "doc_id", edges, iters = 5)
        .select(col("node"), col("rank_micro"))
        .orderBy("node")
    },
    Some(Graph.pagerankSql(iters = 5)),
    eager = true)

  val pmi = GQuery(
    "q_token_pmi",
    (s, d) => Collocations.topPmi(
      Tables.documents(s, d), "text", minCount = 5, k = 40),
    Some(Collocations.topPmiSql(minCount = 5, k = 40)))

  /** Capped posting lists (first 8 docs per term) + df, relational
    * form — the bounded-heap cap ships ≤ cap·partitions rows per hot
    * term where a window rank would materialize the full posting.
    * Eager: the tf localCheckpoint runs jobs at construction. */
  val index = GQuery(
    "q_inverted_index",
    // measured r15: spreading was flat (0.94→0.99 s); left unspread
    (s, d) => Retrieval.invertedIndex(
      Tables.documents(s, d), "doc_id", "text", cap = 8),
    Some(Retrieval.invertedIndexSql(cap = 8)),
    eager = true)

  /** Triangle census of the synthetic link graph via degree-ordered
    * orientation (each triangle counted once; out-degree bounded by
    * O(√m) on skew-free orientation). The oracle recomputes triangles
    * by the independent a<b<c canonical triple join. Eager: the
    * counts collect at construction. */
  val triangles = GQuery(
    "q_triangle_count",
    (s, d) => Graph.triangleCount(
      Graph.syntheticEdges(Tables.documents(s, d), "doc_id")),
    Some(Graph.triangleCountSql),
    eager = true)

  def all: Seq[GQuery] = Seq(bm25, pagerank, pmi, index, triangles)
}
