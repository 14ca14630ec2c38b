package graft

import org.apache.spark.sql.functions._
import graft.ops.{Collocations, Graph, Retrieval}

/** Contracts for the ranking family: BM25 retrieval, integer
  * PageRank, PMI collocations. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  // ---- BM25 -------------------------------------------------------

  private def tinyDocs = Seq(
    (1L, "spark shuffles data fast"),
    (2L, "spark spark spark is a word repeated in a long long long document"),
    (3L, "data moves through the pipeline"),
    (4L, "unrelated words only here")
  ).toDF("doc_id", "text")

  test("bm25: matching docs rank above non-matching; k bounds output") {
    val q = Seq((1, "spark"), (1, "data")).toDF("query_id", "term")
    val r = Retrieval.bm25TopK(tinyDocs, "doc_id", "text", q, k = 3)
      .orderBy("rank").collect()
    assert(r.length == 3) // doc 4 matches nothing and must be absent
    assert(!r.map(_.getLong(1)).contains(4L))
    // doc 1 matches both terms in a short doc: top hit
    assert(r.head.getLong(1) == 1L)
    assert(r.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
  }

  test("bm25: tf saturation — tf-heavy long doc does not dominate") {
    val q = Seq((7, "spark")).toDF("query_id", "term")
    val r = Retrieval.bm25TopK(tinyDocs, "doc_id", "text", q, k = 2)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    // doc 2 has tf=3 but 14 tokens; doc 1 has tf=1 in 4 tokens.
    // saturation + length norm keep the ratio under 3x
    assert(r.keySet == Set(1L, 2L))
    assert(r(2L) < 3 * r(1L), s"saturation failed: $r")
  }

  test("bm25: rarer term outweighs common term at equal tf") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha delta"),
      (4L, "beta omega")).toDF("doc_id", "text")
    val q = Seq((1, "alpha"), (1, "omega")).toDF("query_id", "term")
    val top = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 1)
      .head()
    // omega (df=1) must outrank any alpha-only doc (df=3)
    assert(top.getLong(1) == 4L, top.toString)
  }

  test("bm25: duplicate query terms are rejected by distinct semantics") {
    // the contract is "distinct terms per query"; the qt distinct keeps
    // the MATCH side deduplicated, so a duplicated (query, term) row
    // still double-counts only in the scoring join — assert the
    // documented behavior (caller owns distinctness)
    val q = Seq((1, "spark")).toDF("query_id", "term")
    val once = Retrieval.bm25TopK(tinyDocs, "doc_id", "text", q, k = 1)
      .head().getLong(2)
    val dup = Seq((1, "spark"), (1, "spark")).toDF("query_id", "term")
    val twice = Retrieval.bm25TopK(tinyDocs, "doc_id", "text", dup, k = 1)
      .head().getLong(2)
    assert(twice == 2 * once)
  }

  // ---- PageRank ---------------------------------------------------

  test("pagerank: ranks conserve mass within damping bounds and " +
    "high-in-degree nodes rank higher") {
    // star: everyone links to node 0; 0 links to 1
    val nodes = (0L to 4L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val r = Graph.pagerank(nodes, "id", edges, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) && r(1L) > r(2L), r.toString)
    // nodes 2..4 have no in-edges: exactly the base
    assert(Seq(2L, 3L, 4L).forall(n => r(n) == 150000L), r.toString)
  }

  test("pagerank: fixed point of the uniform cycle is the init value") {
    // ring graph: each node one out-edge, one in-edge -> rank stays 1e6
    val nodes = (0L to 3L).toDF("id")
    val edges = (0L to 3L).map(i => (i, (i + 1) % 4)).toDF("src", "dst")
    val r = Graph.pagerank(nodes, "id", edges, iters = 5)
      .collect().map(_.getLong(1)).distinct.toSeq
    assert(r == Seq(1000000L), r.toString)
  }

  test("pagerank: loop leaves no persisted RDDs behind") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val nodes = (0L to 9L).toDF("id")
    val edges = (0L to 9L).map(i => (i, (i * 3 + 1) % 10)).toDF("src", "dst")
    val out = Graph.pagerank(nodes, "id", edges, iters = 3)
    out.count()
    val after = sc.getPersistentRDDs.keySet.toSet -- before
    // the only surviving block is the result's own localCheckpoint
    assert(after.size <= 1, s"leaked RDDs: $after")
  }

  test("synthetic edges: no self loops, outdeg in {2,3}, dst in range") {
    val docs = Tables.documents(spark, TinySf)
    val e = Graph.syntheticEdges(docs, "doc_id")
    val n = docs.count()
    assert(e.filter(col("src") === col("dst")).count() == 0)
    assert(e.filter(col("dst") < 0 || col("dst") >= n).count() == 0)
    val degs = e.groupBy("src").count().select("count")
      .distinct().as[Long].collect().toSet
    assert(degs.subsetOf(Set(2L, 3L)), degs.toString)
  }

  // ---- PMI --------------------------------------------------------

  test("pmi: a glued pair ranks above independent co-occurrence") {
    // "new york" always adjacent; "data" and "base" also frequent but
    // mostly apart
    val docs = Seq(
      (1L, "new york new york new york data x base"),
      (2L, "data y base new york data z base"),
      (3L, "base q data new york")
    ).toDF("doc_id", "text")
    val r = Collocations.topPmi(docs, "text", minCount = 2, k = 5)
    val rows = r.collect()
    val top = rows.head
    assert(top.getString(0) == "new" && top.getString(1) == "york",
      rows.mkString("; "))
    // margins: c_a of 'new' = number of bigrams with left slot 'new'
    assert(top.getLong(2) == 5L, top.toString) // "new york" count
  }

  test("pmi: minCount prunes and k bounds; ordering is total") {
    val docs = Tables.documents(spark, TinySf)
    val r = Collocations.topPmi(docs, "text", minCount = 3, k = 10)
      .collect()
    assert(r.length <= 10)
    assert(r.forall(_.getLong(2) >= 3))
    val keys = r.map(x => (x.getInt(5), x.getLong(2), x.getString(0),
      x.getString(1)))
    val sorted = keys.sortBy(k => (-k._1, -k._2, k._3, k._4))(
      Ordering.Tuple4(Ordering.Int, Ordering.Long, Ordering.String,
        Ordering.String))
    assert(keys.toSeq == sorted.toSeq)
  }
}
