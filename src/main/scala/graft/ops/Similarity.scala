package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Similarity search over embedding columns (`array<float>`).
  *
  * Numeric discipline: float vectors are quantized to scaled BIGINTs
  * (round(x·10^6)) *before* any arithmetic, so every dot product is an
  * exact int64 sum — order-independent, bit-identical on 32 threads or
  * 1000 executors, and reproducible by the DuckDB oracle. For
  * unit-normalized embeddings the scaled dot product IS the cosine
  * score times 10^12; no float fold ever happens. (Products are
  * ≤ dim·(scale·|x|)² — 64-dim unit vectors peak ≈ 6.4e13, far inside
  * int64.)
  *
  * Scale shapes:
  *  - [[bruteTopK]]: broadcast the (small) query set, scan the corpus
  *    once, then a bounded-heap [[TopKAgg]] aggregation whose map-side
  *    partial step prunes to k rows per (query, partition) *before*
  *    the only shuffle, so the exchange carries O(queries·k·partitions),
  *    never the full pairwise score matrix. This is the exact baseline.
  *  - [[hyperplaneBuckets]] + [[annTopK]]: random-hyperplane LSH — a
  *    per-row signature over deterministic pseudo-random planes;
  *    candidates = bucket collisions (shuffle key: bucket), exact
  *    re-scoring only on candidates. The 100 TB path: corpus bucketing
  *    is one pass, queries probe their own bucket (multi-probe = flip
  *    one signature bit at a time).
  */
object Similarity {

  val Scale = 1000000L // 10^6 per component

  /** Quantize float vector → exact scaled BIGINT vector. */
  def scaledVec(v: Column): Column =
    transform(v, x => round(x.cast("double") * Scale).cast("long"))

  /** Exact dot product of two pre-scaled BIGINT vectors. */
  def dotScaled(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** DuckDB mirror: quantize + exact integer dot, via list_zip
    * (unnamed struct → numeric element access). The outer CAST matters:
    * DuckDB's list_sum over a BIGINT list returns HUGEINT (int128),
    * which materializes as float64 and breaks the driver's typed hash
    * against Spark's int64 — values identical, type different. */
  def dotScaledSql(aExpr: String, bExpr: String): String =
    s"""CAST(list_sum(list_transform(list_zip($aExpr, $bExpr),
        p -> CAST(ROUND(p[1] * 1e6) AS BIGINT) * CAST(ROUND(p[2] * 1e6) AS BIGINT))) AS BIGINT)"""

  /** Bounded top-k accumulator: keeps the k best (sim desc, id asc)
    * pairs. As a registered UDAF it aggregates with map-side partial
    * aggregation, so each partition ships AT MOST k entries per query
    * key into the shuffle — a genuine pre-exchange prune (a window
    * rank, by contrast, must exchange every scored row before ranking).
    * Buffer is a sorted list bounded at k; merge is a bounded merge. */
  final case class TopKAgg(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    // element = (sim_scaled, neighbour_id); best first
    private def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    def zero: Seq[(Long, Long)] = Nil
    def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
      if (buf.lengthCompare(k) >= 0 && better(buf.last, x)) buf
      else ((x +: buf).sortWith(better)).take(k)
    def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      (a ++ b).sortWith(better).take(k)
    def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    def bufferEncoder = ExpressionEncoder[Seq[(Long, Long)]]()
    def outputEncoder = ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Rank the k best rows per query_id from a (query_id, neighbour_id,
    * sim_scaled) frame via [[TopKAgg]]: one hash exchange carrying
    * ≤ k·partitions rows per query, never the full score matrix. */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(TopKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    scored
      .groupBy("query_id")
      .agg(topk(col("sim_scaled"), col("neighbour_id")).as("_tk"))
      .select(col("query_id"), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col("query_id"), col("_e._2").as("neighbour_id"),
        col("_e._1").as("sim_scaled"),
        (col("_pos") + 1).cast("int").as("rank"))
  }

  /** Exact top-k neighbours per query vector by scaled dot product
    * (= cosine·10^12 on unit vectors). Deterministic tie-break on
    * neighbour id. The query side broadcasts, the corpus is scanned
    * once, and the only exchange is the bounded [[TopKAgg]] partial
    * aggregation (≤ k entries per query per partition). */
  def bruteTopK(queries: DataFrame, qId: String, qVec: String,
                corpus: DataFrame, cId: String, cVec: String,
                k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(qId).as("query_id"), scaledVec(col(qVec)).as("_qv")))
    val c = corpus.select(col(cId).as("neighbour_id"), scaledVec(col(cVec)).as("_cv"))
    val scored = c.join(q) // broadcast nested-loop: corpus scanned once
      .withColumn("sim_scaled", dotScaled(col("_qv"), col("_cv")))
      .select("query_id", "neighbour_id", "sim_scaled")
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim d): an integer mix mapped to [-1000, 1000]. Same constants
    * are reproducible anywhere — no RNG state. */
  private def planeWeight(p: Int, d: Column): Column = {
    val mixed = (d.cast("long") * lit(2654435761L) +
      lit(p.toLong * 40503L + 104729L)) % lit(1000003L)
    (mixed % lit(2001L)) - lit(1000L)
  }

  /** LSH signature: one bit per hyperplane = sign of Σ_d v[d]·w(p,d),
    * packed into a BIGINT bucket key. Pure per-row compute on the
    * scaled vector (exact integer arithmetic throughout). */
  def hyperplaneBuckets(vec: Column, planes: Int): Column = {
    val sv = scaledVec(vec)
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(sv, sequence(lit(0), size(sv) - 1),
          (x, d) => x * planeWeight(p, d)),
        lit(0L), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k: bucket corpus and queries with the same hyperplanes,
    * join on the bucket (plus single-bit multi-probe neighbours of the
    * query bucket for recall), exact-score candidates, rank. Returns
    * the same schema as [[bruteTopK]] — recall measured against it in
    * tests. */
  def annTopK(queries: DataFrame, qId: String, qVec: String,
              corpus: DataFrame, cId: String, cVec: String,
              k: Int, planes: Int): DataFrame = {
    val c = corpus.select(col(cId).as("neighbour_id"),
      scaledVec(col(cVec)).as("_cv"),
      hyperplaneBuckets(col(cVec), planes).as("bucket"))
    // multi-probe: the query's own bucket + all 1-bit flips
    val probes = (0 until planes).foldLeft(array(col("_b"))) { (acc, p) =>
      array_union(acc, array(col("_b").bitwiseXOR(lit(1L << p))))
    }
    val q = broadcast(
      queries.select(col(qId).as("query_id"), scaledVec(col(qVec)).as("_qv"),
          hyperplaneBuckets(col(qVec), planes).as("_b"))
        .withColumn("bucket", explode(probes))
        .select("query_id", "_qv", "bucket"))
    val scored = c.join(q, "bucket")
      .withColumn("sim_scaled", dotScaled(col("_qv"), col("_cv")))
      .select("query_id", "neighbour_id", "sim_scaled")
    topKPerQuery(scored, k)
  }

  /** DuckDB mirror of [[planeWeight]]: same pure integer arithmetic,
    * all operands non-negative so `%` agrees between engines. */
  private def planeWeightSql(p: Int, dExpr: String): String =
    s"((($dExpr * 2654435761 + ${p.toLong * 40503L + 104729L}) % 1000003) % 2001 - 1000)"

  /** DuckDB mirror of [[hyperplaneBuckets]]. DuckDB list lambdas carry
    * a 1-based index, Spark's sequence is 0-based — hence `i - 1`. */
  def hyperplaneBucketsSql(vecExpr: String, planes: Int): String = {
    val sv = s"list_transform($vecExpr, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
    (0 until planes).map { p =>
      val proj = s"list_sum(list_transform($sv, (x, i) -> x * ${planeWeightSql(p, "(i - 1)")}))"
      s"CASE WHEN $proj > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("CAST((", " + ", ") AS BIGINT)")
  }

  /** DuckDB mirror of the 1-bit multi-probe expansion in [[annTopK]]:
    * the query's own bucket plus every single-bit flip. */
  def probesSql(bucketExpr: String, planes: Int): String =
    s"""list_prepend($bucketExpr, list_transform(range(0, $planes),
        p -> xor($bucketExpr, CAST(1 AS BIGINT) << p)))"""
}
