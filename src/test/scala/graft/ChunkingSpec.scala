package graft

import org.apache.spark.sql.functions._
import graft.ops.Chunking

/** Sliding-window chunking: hand-checked boundaries, the short-doc /
  * short-tail edges, the exact-overlap invariant, lossless
  * reconstruction, and the no-shuffle plan contract.
  */
class ChunkingSpec extends SparkSpec {

  private def chunksOf(text: String, size: Int, overlap: Int) = {
    val s = spark; import s.implicits._
    Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "text", Seq("doc_id"), size, overlap)
      .orderBy("chunk_id")
      .collect().map(r => (r.getAs[String]("chunk_text"),
        r.getAs[Int]("chunk_tokens")))
  }

  test("hand-checked windows: stride walks, tail shortens") {
    // 7 tokens, size 3, overlap 1 → stride 2 → [abc][cde][efg]
    assert(chunksOf("a b c d e f g", 3, 1).toSeq ==
      Seq(("a b c", 3), ("c d e", 3), ("e f g", 3)))
    // 8 tokens → one more start at 6, short tail [g h]
    assert(chunksOf("a b c d e f g h", 3, 1).toSeq ==
      Seq(("a b c", 3), ("c d e", 3), ("e f g", 3), ("g h", 2)))
    // zero overlap degenerates to disjoint blocks
    assert(chunksOf("a b c d e", 2, 0).toSeq ==
      Seq(("a b", 2), ("c d", 2), ("e", 1)))
  }

  test("a doc at or under the window is exactly one chunk: itself") {
    assert(chunksOf("a b c", 3, 1).toSeq == Seq(("a b c", 3)))
    assert(chunksOf("a", 3, 1).toSeq == Seq(("a", 1)))
  }

  test("consecutive chunks share exactly `overlap` tokens") {
    val s = spark; import s.implicits._
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val ch = Chunking.chunk(docs, "text", Seq("doc_id"), 32, 8)
    val bad = ch
      .withColumn("_toks", split(col("chunk_text"), " "))
      .withColumn("_head", slice(col("_toks"), 1, 8))
      .withColumn("_tail_prev", lag(
        slice(col("_toks"), greatest(size(col("_toks")) - 7, lit(1)), lit(8)), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("chunk_id")))
      .filter(col("_tail_prev").isNotNull &&
        !(col("_head") === col("_tail_prev")) &&
        // a short tail may overlap MORE than 8 of the previous chunk;
        // the invariant binds only full-stride continuations
        size(col("_toks")) === 32)
      .count()
    assert(bad == 0, s"$bad chunks break the 8-token overlap invariant")
  }

  test("reconstruction: drop each continuation's overlap, get the doc back") {
    val s = spark; import s.implicits._
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val rebuilt = Chunking.chunk(docs, "text", Seq("doc_id"), 32, 8)
      .withColumn("_toks", split(col("chunk_text"), " "))
      .withColumn("_piece", when(col("chunk_id") === 0, col("_toks"))
        .otherwise(slice(col("_toks"), 9, 1000000)))
      .groupBy("doc_id")
      // chunk_id is the in-doc order; collect in that order explicitly
      .agg(concat_ws(" ", flatten(array_sort(
        collect_list(struct(col("chunk_id"), col("_piece"))))
        .getField("_piece"))).as("rebuilt"))
    val diff = rebuilt.join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("text")).count()
    assert(diff == 0, s"$diff documents fail lossless reconstruction")
  }

  test("plan contract: chunking is explode-only — NO Exchange") {
    val docs = Tables.documents(spark, TinySf).select("doc_id", "text")
    val plan = Chunking.chunk(docs, "text", Seq("doc_id"), 64, 16)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"chunking plan shuffles:\n${plan.take(2000)}")
  }

  test("a 100k-token document chunks by arithmetic, not by memory") {
    val s = spark; import s.implicits._
    val doc = Seq((1L, (1 to 100000).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ch = Chunking.chunk(doc, "text", Seq("doc_id"), 4096, 128)
      .agg(count(lit(1)).as("n"), sum(col("chunk_tokens")).as("tok"))
      .head()
    // stride 3968: 1 + ceil((100000-4096)/3968) = 1 + 25 = 26 chunks;
    // token sum = 25 full strides re-counted once each in overlap:
    // 100000 + 25*128 = 103200
    assert(ch.getLong(0) == 26, s"chunks: ${ch.getLong(0)}")
    assert(ch.getLong(1) == 103200L, s"token sum: ${ch.getLong(1)}")
  }

  test("guards: overlap must leave a positive stride") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunk(df, "text", Seq("doc_id"), 4, 4)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunk(df, "text", Seq("doc_id"), 0, 0)
    }
  }
}
