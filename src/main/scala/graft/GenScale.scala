package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic decade-up testdata synthesis: `sfN × replicas` from a
  * driver-generated sf directory, used ONLY for scale-evidence bench
  * runs above the largest driver-provided sf (BASELINE.md "one decade
  * up"). The driver's generator isn't published, so this scales the
  * TPC-H way: each replica is a DISJOINT key sub-universe (all
  * entity keys offset by `replica * stride`), which preserves every
  * join fanout, group-size distribution, and time range exactly while
  * multiplying row counts — more customers placing orders over the
  * same year, the same way TPC-H sf grows.
  *
  * Two columns need more than key offsets, and both perturbations are
  * pure deterministic column expressions (no RNG, no UDF):
  *
  *  - `documents.text`: replica i>0 renames ~half the words
  *    (`xxhash64(word, i)` parity picks which; renamed = word+i) so
  *    cross-replica Jaccard lands ~1/3 — far below every near-dup
  *    threshold in the engine — while any two docs WITHIN a replica
  *    keep their original similarity (the map depends only on
  *    (word, replica), so planted near-dup structure survives and the
  *    dedup-rate-per-replica is invariant). Vocabulary grows with
  *    corpus size, as a real corpus's does. `n_chars` is recomputed.
  *  - `embeddings.embedding`: replica i rotates the 64-dim vector by
  *    i positions — norm-preserving and bit-exact (element reuse, no
  *    arithmetic), but the direction changes enough that replicas
  *    don't collapse into the same ANN cells.
  *
  * region/nation stay fixed (TPC-H scales facts, not the geography).
  *
  * Usage: runMain graft.GenScale <inSfDir> <outDir> [replicas=10]
  */
object GenScale {

  private def offset(df: DataFrame, keys: (String, Long)*)(i: Int): DataFrame =
    keys.foldLeft(df) { case (d, (k, stride)) =>
      d.withColumn(k, col(k) + lit(stride * i))
    }

  private def replicate(spark: SparkSession, out: String, name: String,
                        base: DataFrame, replicas: Int,
                        f: Int => DataFrame => DataFrame): Unit = {
    val parts = (0 until replicas).map(i => f(i)(base))
    parts.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/$name.parquet")
    println(s"gen $name x$replicas")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenScale <inSfDir> <outDir> [replicas]")
    val replicas = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-genscale")
    build(spark, args(0), args(1), replicas)
    spark.stop()
  }

  def build(spark: SparkSession, in: String, out: String,
            replicas: Int): Unit = {
    require(replicas >= 1, s"replicas must be >= 1: $replicas")

    def mx(df: DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).head().getLong(0) + 1L

    val cust = Tables.customer(spark, in)
    val supp = Tables.supplier(spark, in)
    val part = Tables.part(spark, in)
    val ord  = Tables.orders(spark, in)
    val li   = Tables.lineitem(spark, in)
    val evt  = Tables.t(spark, in, "events") // raw: preserve physical ts
    val doc  = Tables.documents(spark, in)
    val emb  = Tables.embeddings(spark, in)

    val kCust = mx(cust, "c_custkey");  val kSupp = mx(supp, "s_suppkey")
    val kPart = mx(part, "p_partkey");  val kOrd  = mx(ord, "o_orderkey")
    val kEvt  = mx(evt, "event_id");    val kUser = mx(evt, "user_id")
    val kDoc  = mx(doc, "doc_id");      val kVec  = mx(emb, "vec_id")

    // fixed dims: copy through unchanged
    Tables.region(spark, in).write.mode("overwrite")
      .parquet(s"$out/region.parquet")
    Tables.nation(spark, in).write.mode("overwrite")
      .parquet(s"$out/nation.parquet")

    replicate(spark, out, "customer", cust, replicas,
      i => offset(_, "c_custkey" -> kCust)(i))
    replicate(spark, out, "supplier", supp, replicas,
      i => offset(_, "s_suppkey" -> kSupp)(i))
    replicate(spark, out, "part", part, replicas,
      i => offset(_, "p_partkey" -> kPart)(i))
    replicate(spark, out, "orders", ord, replicas,
      i => offset(_, "o_orderkey" -> kOrd, "o_custkey" -> kCust)(i))
    replicate(spark, out, "lineitem", li, replicas,
      i => offset(_, "l_orderkey" -> kOrd, "l_partkey" -> kPart,
        "l_suppkey" -> kSupp)(i))
    replicate(spark, out, "events", evt, replicas,
      i => offset(_, "event_id" -> kEvt, "user_id" -> kUser)(i))

    replicate(spark, out, "documents", doc, replicas, i => d => {
      val shifted = offset(d, "doc_id" -> kDoc)(i)
      if (i == 0) shifted
      else shifted
        .withColumn("text", array_join(transform(
          split(col("text"), " "),
          w => when(pmod(xxhash64(w, lit(i)), lit(2)) === 0,
            concat(w, lit(i.toString))).otherwise(w)), " "))
        .withColumn("n_chars", length(col("text")).cast("long"))
    })

    replicate(spark, out, "embeddings", emb, replicas, i => d => {
      val shifted = offset(d, "vec_id" -> kVec)(i)
      // rotation repeats every 64 replicas (dim = 64); the second
      // 64-block negates components so replicas 64..127 stay distinct
      // from 0..63 (both transforms are norm-preserving + bit-exact)
      val r = i % 64
      val rotated =
        if (r == 0) shifted
        else shifted.withColumn("embedding", concat(
          slice(col("embedding"), r + 1, 64 - r),
          slice(col("embedding"), 1, r)))
      if ((i / 64) % 2 == 0) rotated
      else rotated.withColumn("embedding",
        transform(col("embedding"), x => -x))
    })
  }
}
