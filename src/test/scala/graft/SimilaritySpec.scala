package graft

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Similarity

/** ANN quality: hyperplane-LSH top-k recall vs the exact brute-force
  * baseline on real testdata embeddings — the assertion the
  * SimilarityQueries scaladoc promises.
  */
class SimilaritySpec extends SparkSpec {

  private val K = 10

  private def neighbourSets(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbour_id")).toSet).toMap

  test("ANN recall ≥ 0.5 vs exact top-10 on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, TinySf)
    val queries = emb.filter(expr("vec_id % 100 = 3"))
    val exact = neighbourSets(
      Similarity.bruteTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", K))
    val ann = neighbourSets(
      Similarity.annTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", K,
        planes = graft.queries.SimilarityQueries.Planes,
        tables = graft.queries.SimilarityQueries.NTables,
        probeBits = graft.queries.SimilarityQueries.ProbeBits))
    assert(exact.nonEmpty)
    val recalls = exact.map { case (q, ex) =>
      ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean ANN recall@$K over ${recalls.size} queries: $mean%.3f")
    assert(mean >= 0.5)
  }

  test("IVF recall matches the scanned fraction on uniform embeddings") {
    val emb = Tables.embeddings(spark, TinySf)
    val queries = emb.filter(expr("vec_id % 100 = 3"))
    val exact = neighbourSets(
      Similarity.bruteTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", K))
    val ivf = neighbourSets(
      Similarity.ivfTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", K,
        graft.queries.SimilarityQueries.NumCentroids,
        graft.queries.SimilarityQueries.NProbe))
    val recalls = exact.map { case (q, ex) =>
      ivf.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean IVF recall@$K: $mean%.3f (uniform corpus: expect ≈ nProbe/C = 0.25)")
    // uniform embeddings are the adversarial case: cells carry no
    // signal, so recall ≈ scanned fraction; clustered real-world data
    // concentrates neighbours in probed cells
    assert(mean >= 0.15)
  }

  test("scaled dot product is exact and symmetric") {
    val s = spark; import s.implicits._
    val df = Seq((Array(0.5f, -0.25f), Array(0.1f, 0.4f)))
      .toDF("a", "b")
      .select(Similarity.dotScaled(
        Similarity.scaledVec(col("a")), Similarity.scaledVec(col("b"))).as("d"),
        Similarity.dotScaled(
          Similarity.scaledVec(col("b")), Similarity.scaledVec(col("a"))).as("d2"))
    val r = df.head()
    // 0.5*0.1 + (-0.25)*0.4 = -0.05 → scaled by 10^12
    assert(r.getLong(0) === -50000000000L)
    assert(r.getLong(0) === r.getLong(1))
  }

  test("bruteTopK returns exactly k ranked rows per query, ties broken by id") {
    val s = spark; import s.implicits._
    val corpus = (1L to 20L).map(i => (i, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", 5).orderBy("rank").collect()
    assert(out.length === 5)
    // all sims equal → neighbour ids 1..5 in rank order
    assert(out.map(_.getAs[Long]("neighbour_id")).toSeq === (1L to 5L))
    assert(out.map(_.getAs[Int]("rank")).toSeq === (1 to 5))
  }
}
