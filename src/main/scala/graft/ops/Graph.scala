package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over a link graph — the web-corpus
  * quality-weighting primitive (centrality-weighted sampling of a
  * crawled corpus; Common-Crawl-style curation ranks hosts/pages by
  * link centrality before quality filtering). Reference scope: none —
  * training-data extension family.
  *
  * Arithmetic contract: ranks live in integer MICRO units
  * (`r0 = 1 000 000` per node) and every update is BIGINT with
  * integral `div`:
  *
  *   `r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div outdeg(u))) div 100`
  *
  * i.e. damping 0.85 with the per-node base convention (ranks sum to
  * ≈ N·1e6). Integer div makes the fixed-point value bit-identical
  * cross-engine — floats would drift in the 5th iteration's last ulp.
  *
  * Scale shape: each iteration is exactly ONE shuffle — the
  * contribution aggregate keyed on dst (map-side combinable) — plus a
  * broadcast-or-shuffle join back to the node list for the base term.
  * The edge frame (with outdeg folded in, so the per-iteration join
  * multiplies no aggregates) is persisted once and reused by every
  * iteration; each rank frame is persisted and the previous one
  * evicted as soon as its successor materializes (the
  * connected-components loop discipline, `ops/Dedup.scala`). Lineage
  * is truncated by the persist, so iteration count never compounds
  * the plan. At 1000 executors the edges partition by src once and
  * stay put; only the (dst, contribution) pairs move per round.
  */
object Graph {

  /** Deterministic synthetic link graph over a contiguous id space
    * [0, N): node d links to `(d·31+7) mod N`, `(d·17+3) mod N`,
    * `(d·101+11) mod N`, self-loops dropped (so outdeg ∈ {2,3}).
    * Stands in for a crawl's hyperlink extraction, which this corpus
    * does not carry; N is computed from the node frame (one-row
    * aggregate, auto-broadcast on the cross join). */
  def syntheticEdges(nodes: DataFrame, idCol: String): DataFrame = {
    val n = nodes.agg(count(lit(1)).cast("long").as("_n"))
    val base = nodes.select(col(idCol).cast("long").as("src")).crossJoin(n)
    Seq((31L, 7L), (17L, 3L), (101L, 11L))
      .map { case (a, b) =>
        base.select(col("src"),
          pmod(col("src") * a + b, col("_n")).as("dst"))
      }
      .reduce(_ unionByName _)
      .filter(col("dst") =!= col("src"))
  }

  /** `iters` rounds of integer PageRank; returns
    * (node, rank_micro) for every node in `nodes` (nodes with no
    * in-edges settle at the 150000 base). The edge frame (outdeg
    * folded in) is checkpointed once and read by every round; the
    * loop's caches and the edge checkpoint are released on every exit
    * path, and the result hands back TRUNCATED lineage (the
    * connectedComponents discipline, `ops/Dedup.scala:424-498`). */
  def pagerank(nodes: DataFrame, idCol: String, edges: DataFrame,
               iters: Int): DataFrame = {
    require(iters >= 1, s"pagerank needs iters >= 1, got $iters")
    // Adaptive strategy choice (the components union-find posture):
    // integer PageRank is exact long arithmetic — per-edge
    // `rank div deg` contributions summed, both order-independent —
    // so when graph and node set fit a driver bound the whole loop
    // runs as driver hash-map math, bit-identical by construction.
    // Each distributed round was 4-5 small Spark jobs of almost pure
    // scheduler latency; at real scale the limit probes below
    // early-exit past the bound and the distributed loop runs
    // unchanged.
    val DriverBound = 1 << 20
    val smallEdges: Option[Array[(Long, Long)]] = {
      val rows = edges
        .select(col("src").cast("long"), col("dst").cast("long"))
        .limit(DriverBound + 1).collect()
      if (rows.length > DriverBound) None
      else Some(rows.map(r => (r.getLong(0), r.getLong(1))))
    }
    val smallNodes: Option[Array[Long]] = smallEdges.flatMap { _ =>
      val rows = nodes.select(col(idCol).cast("long"))
        .limit(DriverBound + 1).collect()
      if (rows.length > DriverBound) None
      else Some(rows.map(_.getLong(0)))
    }
    smallNodes.foreach { nodeArr =>
      val es = smallEdges.get
      val nodeSet = new java.util.HashSet[java.lang.Long](nodeArr.length)
      nodeArr.foreach(nodeSet.add(_))
      val deg = new scala.collection.mutable.HashMap[Long, Long]()
      es.foreach { case (s, _) => deg(s) = deg.getOrElse(s, 0L) + 1L }
      var ranks = new scala.collection.mutable.HashMap[Long, Long]()
      nodeArr.foreach(n => ranks(n) = 1000000L)
      for (_ <- 1 to iters) {
        val in = new scala.collection.mutable.HashMap[Long, Long]()
        es.foreach { case (s, d) =>
          // mirror the distributed shape exactly: contributions flow
          // from ranked srcs to dsts that are nodes; `div` on
          // non-negative longs is plain truncating division
          ranks.get(s).foreach { r =>
            if (nodeSet.contains(d)) in(d) = in.getOrElse(d, 0L) + r / deg(s)
          }
        }
        val next = new scala.collection.mutable.HashMap[Long, Long]()
        nodeArr.foreach(n =>
          next(n) = 150000L + (85L * in.getOrElse(n, 0L)) / 100L)
        ranks = next
      }
      val spark = nodes.sparkSession
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank_micro",
          org.apache.spark.sql.types.LongType)))
      val out: Seq[org.apache.spark.sql.Row] = nodeArr.toSeq.map(n =>
        org.apache.spark.sql.Row(n, ranks(n)))
      return spark.createDataFrame(
        new java.util.ArrayList(
          scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
        schema)
    }
    val outdeg = edges.groupBy("src")
      .agg(count(lit(1)).cast("long").as("_deg"))
    val e = edges.join(outdeg, "src").localCheckpoint()
    // release tracks the checkpointed RDD directly through the plan
    // (Checkpoints) — a registry diff here would capture any RDD a
    // concurrent query persisted in the same window
    def releaseEdges(): Unit = Checkpoints.release(e)
    val nodeIds = nodes.select(col(idCol).cast("long").as("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodeIds.select(col("node"), lit(1000000L).as("rank_micro"))
    try {
      for (_ <- 1 to iters) {
        val contrib = e
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("rank_micro div _deg")).cast("long").as("_in"))
        val next = nodeIds
          .join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + expr("(85 * coalesce(_in, 0L)) div 100"))
              .cast("long").as("rank_micro"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before evicting the predecessor
        ranks.unpersist()
        ranks = next
      }
      val result = ranks.localCheckpoint()
      ranks.unpersist()
      nodeIds.unpersist()
      releaseEdges()
      result
    } catch { case t: Throwable =>
      ranks.unpersist(); nodeIds.unpersist(); releaseEdges()
      throw t
    }
  }

  /** Triangle count over the undirected closure of `edges` — the
    * clustering-coefficient numerator (community density of a link
    * graph; spam-farm detection flags anomalous triangle density).
    *
    * Algorithm: canonicalize to undirected (min,max) edges, then
    * count via DEGREE-ORDERED ORIENTATION — orient every edge from
    * the (degree, id)-smaller endpoint to the larger, join oriented
    * wedges a→b, b→c, and probe a→c. Each triangle is counted
    * exactly once, and on skew-free orientation every node's
    * out-degree is O(√m) on real graphs, which bounds the wedge
    * join's fan-out — the standard trick that makes the count
    * feasible where the naive triple-join explodes on hub nodes.
    * Returns ONE row: (n_nodes_touched, n_edges, n_wedges,
    * n_triangles). */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // Adaptive strategy choice (the pagerank/union-find posture):
    // every output is an exact integer count, so when the distinct
    // undirected edge set fits a driver bound the census runs as
    // driver array math — degree-ordered orientation, wedge total
    // from per-node in×out degree products, triangles from sorted
    // out-adjacency intersections (cost ≤ m·√(2m) set probes at the
    // bound, sub-second). Over the bound the distributed
    // orient/join/probe below runs unchanged.
    val EdgeDriverBound = 1 << 17
    val smallUnd: Option[Array[(Long, Long)]] = {
      val rows = und.limit(EdgeDriverBound + 1).collect()
      if (rows.length > EdgeDriverBound) None
      else Some(rows.map(r =>
        (r.get(0).asInstanceOf[Number].longValue,
          r.get(1).asInstanceOf[Number].longValue)))
    }
    smallUnd.foreach { es =>
      val deg = new scala.collection.mutable.HashMap[Long, Long]()
      es.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1L
        deg(b) = deg.getOrElse(b, 0L) + 1L
      }
      // orient from the (degree, id)-smaller endpoint to the larger
      val oriented = es.map { case (a, b) =>
        val (da, db) = (deg(a), deg(b))
        if (da < db || (da == db && a < b)) (a, b) else (b, a)
      }
      val out = new scala.collection.mutable.HashMap[Long,
        scala.collection.mutable.ArrayBuffer[Long]]()
      val cIn = new scala.collection.mutable.HashMap[Long, Long]()
      oriented.foreach { case (lo, hi) =>
        out.getOrElseUpdate(lo,
          new scala.collection.mutable.ArrayBuffer[Long]()) += hi
        cIn(hi) = cIn.getOrElse(hi, 0L) + 1L
      }
      val adj = out.map { case (v, buf) => v -> buf.toArray.sorted }
      // wedges x->y->z = Σ_y in(y)·out(y); no enumeration needed
      val nWedges = adj.iterator.map { case (y, outs) =>
        cIn.getOrElse(y, 0L) * outs.length
      }.sum
      // a triangle's orientation has exactly one 2-out-degree source
      // x with x->y->z and x->z: count |N⁺(x) ∩ N⁺(y)| per edge (x,y)
      def inter(xs: Array[Long], ys: Array[Long]): Long = {
        var i = 0; var j = 0; var c = 0L
        while (i < xs.length && j < ys.length) {
          if (xs(i) < ys(j)) i += 1
          else if (xs(i) > ys(j)) j += 1
          else { c += 1; i += 1; j += 1 }
        }
        c
      }
      val empty = Array.empty[Long]
      val nTriangles = oriented.iterator.map { case (x, y) =>
        inter(adj.getOrElse(x, empty), adj.getOrElse(y, empty))
      }.sum
      val nNodes = deg.size.toLong
      val nEdges = es.length.toLong
      val spark = edges.sparkSession
      import spark.implicits._
      return Seq((nNodes, nEdges, nWedges, nTriangles))
        .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles")
    }
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).cast("long").as("d"))
    // orientation key: (degree, id) total order
    val withDeg = und
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"),
        Seq("a"))
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"),
        Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("lo"), col("b").as("hi")))
        .otherwise(struct(col("b").as("lo"), col("a").as("hi")))
        .as("_e"))
      .select(col("_e.lo").as("lo"), col("_e.hi").as("hi"))
    // the oriented frame is consumed three times (both wedge sides +
    // the closing probe); checkpoint so the canonicalize/degree join
    // runs once, not per consumer
    val ori = oriented.localCheckpoint()
    val wedges = ori.as("e1")
      .join(ori.as("e2"), col("e1.hi") === col("e2.lo"))
      .select(col("e1.lo").as("x"), col("e1.hi").as("y"),
        col("e2.hi").as("z"))
    // one pass over the wedge stream: total wedges + closed wedges
    val counts = wedges
      .join(ori, col("x") === col("lo") && col("z") === col("hi"), "left")
      .agg(count(lit(1)).cast("long").as("n_wedges"),
        count(col("lo")).cast("long").as("n_triangles"))
      .head()
    val nNodes = ori.select(col("lo").as("v"))
      .unionAll(ori.select(col("hi").as("v"))).distinct().count()
    val nEdges = ori.count()
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nNodes, nEdges, counts.getLong(0), counts.getLong(1)))
      .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles")
  }

  /** DuckDB mirror of [[triangleCount]] over the [[syntheticEdges]]
    * graph — independently formulated as the a<b<c canonical triple
    * join (no orientation; feasible at oracle scale), with the wedge
    * count re-derived from the orientation definition. */
  def triangleCountSql: String =
    s"""
      WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      e0 AS (
        SELECT doc_id AS src, (doc_id * 31 + 7) % n AS dst FROM documents, s
        UNION ALL
        SELECT doc_id, (doc_id * 17 + 3) % n FROM documents, s
        UNION ALL
        SELECT doc_id, (doc_id * 101 + 11) % n FROM documents, s),
      und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e0 WHERE src <> dst),
      deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
          SELECT a AS v FROM und UNION ALL SELECT b FROM und)
        GROUP BY v),
      ori AS (
        SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                    THEN u.a ELSE u.b END AS lo,
               CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                    THEN u.b ELSE u.a END AS hi
        FROM und u
        JOIN deg da ON u.a = da.v
        JOIN deg db ON u.b = db.v),
      wedge AS (
        SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
        FROM ori e1 JOIN ori e2 ON e1.hi = e2.lo),
      tri AS (
        SELECT COUNT(*) AS c
        FROM und ab
        JOIN und bc ON ab.b = bc.a
        JOIN und ac ON ac.a = ab.a AND ac.b = bc.b)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM wedge) AS n_wedges,
             (SELECT CAST(c AS BIGINT) FROM tri) AS n_triangles
    """

  /** DuckDB mirror: the same graph and `iters` update rounds as
    * explicitly chained CTE levels (aggregation per round is not
    * expressible inside a recursive CTE), each level one join +
    * group-by over its predecessor. */
  def pagerankSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
        SELECT n.node,
               150000 + (85 * COALESCE(c.s, 0)) // 100 AS rank_micro
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node, CAST(SUM(r.rank_micro // e.outdeg) AS BIGINT) AS s
          FROM e JOIN r${i - 1} r ON e.src = r.node
          GROUP BY e.dst) c USING (node))"""
    }.mkString(",\n")
    s"""
      WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      e0 AS (
        SELECT doc_id AS src, (doc_id * 31 + 7) % n AS dst FROM documents, s
        UNION ALL
        SELECT doc_id, (doc_id * 17 + 3) % n FROM documents, s
        UNION ALL
        SELECT doc_id, (doc_id * 101 + 11) % n FROM documents, s),
      e1 AS (SELECT src, dst FROM e0 WHERE dst <> src),
      deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
              FROM e1 GROUP BY src),
      e AS (SELECT e1.src, e1.dst, deg.outdeg FROM e1 JOIN deg USING (src)),
      nodes AS (SELECT doc_id AS node FROM documents),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
      $rounds
      SELECT node, CAST(rank_micro AS BIGINT) AS rank_micro
      FROM r$iters ORDER BY node
    """
  }
}
