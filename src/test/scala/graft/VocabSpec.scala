package graft

import org.apache.spark.sql.functions._
import graft.ops.Vocab

/** Vocabulary build + OOV: hand-checked ranking with tie-breaks, the
  * boundary between in- and out-of-vocab, and the top-N plan shape.
  */
class VocabSpec extends SparkSpec {

  test("topWords ranks by count desc then word asc; limit cuts exactly") {
    val s = spark; import s.implicits._
    val docs = Seq("b b b a a c", "a c d").toDF("text")
    // counts: a=3, b=3, c=2, d=1 → rank: a(1), b(2), c(3), d(4)
    val top3 = Vocab.topWords(docs, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(top3.toSeq == Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)),
      s"got: ${top3.toSeq}")
  }

  test("oovStats counts exactly the tokens outside the vocab") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b x"), (2L, "x y z"), (3L, "a a")).toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("word")
    val out = Vocab.oovStats(docs, "text", "doc_id", vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 3L, 1L, 333L), (2L, 3L, 3L, 1000L),
      (3L, 2L, 0L, 0L)), s"got: ${out.toSeq}")
  }

  test("plan contract: vocab is a bounded top-N, never a global sort") {
    val docs = Tables.documents(spark, TinySf)
    val plan = Vocab.topWords(docs, "text", 50)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-N is not heap-based:\n${plan.take(2000)}")
  }
}
