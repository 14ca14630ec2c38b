package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
  *    once, two-phase top-k — partition-local rank prunes to k rows
  *    per (query, partition) *before* the only shuffle, so the
  *    exchange carries O(queries·k·partitions), never the full
  *    pairwise score matrix. This is the exact baseline.
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
    * (unnamed struct → numeric element access). */
  def dotScaledSql(aExpr: String, bExpr: String): String =
    s"""list_sum(list_transform(list_zip($aExpr, $bExpr),
        p -> CAST(ROUND(p[1] * 1e6) AS BIGINT) * CAST(ROUND(p[2] * 1e6) AS BIGINT)))"""

  /** Exact top-k neighbours per query vector by scaled dot product
    * (= cosine·10^12 on unit vectors). Deterministic tie-break on
    * neighbour id. Two-phase: local rank inside each corpus partition
    * (no shuffle — window over spark_partition_id), keep k, then the
    * global rank runs on ≤ k·numPartitions rows per query. */
  def bruteTopK(queries: DataFrame, qId: String, qVec: String,
                corpus: DataFrame, cId: String, cVec: String,
                k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(qId).as("query_id"), scaledVec(col(qVec)).as("_qv")))
    val c = corpus.select(col(cId).as("neighbour_id"), scaledVec(col(cVec)).as("_cv"))
    val scored = c.join(q) // broadcast nested-loop: corpus scanned once
      .withColumn("sim_scaled", dotScaled(col("_qv"), col("_cv")))
      .select("query_id", "neighbour_id", "sim_scaled")
    val localW = Window
      .partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("sim_scaled").desc, col("neighbour_id"))
    val globalW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_scaled").desc, col("neighbour_id"))
    scored
      .withColumn("_lr", row_number().over(localW)).filter(col("_lr") <= k)
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select("query_id", "neighbour_id", "sim_scaled", "rank")
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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_scaled").desc, col("neighbour_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbour_id", "sim_scaled", "rank")
  }
}
