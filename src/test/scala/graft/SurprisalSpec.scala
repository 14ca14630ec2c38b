package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Unigram-surprisal scoring: hand-computed integer values, the
  * rare-vs-boilerplate ordering the score exists to produce, and the
  * Expand-free plan shape (the q_sketch_distinct lesson: never let a
  * mixed distinct/non-distinct aggregate double the input).
  */
class SurprisalSpec extends SparkSpec {

  test("hand-computed bitlen arithmetic on a tiny corpus") {
    val s = spark; import s.implicits._
    // corpus: a:1, b:3, c:1 -> N=5, bitlen(5)=3
    // s(a)=3-1=2 (bitlen 1 = 1), s(b)=3-2=1 (bitlen 3 = 2), s(c)=2
    val docs = Seq((1L, "a b b"), (2L, "b c")).toDF("id", "text")
    val out = TextOps.unigramSurprisal(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // doc1: (2+1+1)*1000 div 3 = 1333 ; doc2: (1+2)*1000 div 2 = 1500
    assert(out(1L) == ((3L, 1333L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((2L, 1500L)), s"doc2: ${out(2L)}")
  }

  test("empty corpus fails with the documented message, not an NPE") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.unigramSurprisal(empty, "id", "text")
    }
    assert(e.getMessage.contains("empty corpus"), e.getMessage)
  }

  test("boilerplate scores below rare-token docs") {
    val s = spark; import s.implicits._
    val boiler = Seq.fill(20)("same same same same")
    val rare = "zq xv jk wq"
    val docs = (boiler :+ rare).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = TextOps.unigramSurprisal(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rareId = 20L
    assert((0L until 20L).forall(b => out(b) < out(rareId)),
      s"rare doc must outscore boilerplate: $out")
  }

  test("plan: no Expand, no global-N branch — at most the " +
    "boilerplateScore two-branch explode shape") {
    val df = TextOps.unigramSurprisal(
      Tables.documents(spark, TinySf), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Expand"), plan.take(1500))
    // N is folded in as a literal: no third corpus branch, and no
    // one-row cross join in the plan at all
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val generates = plan.linesIterator.count(_.contains("Generate explode"))
    assert(generates <= 2, s"expected the two-branch tf/cnt shape, " +
      s"found $generates explodes:\n${plan.take(2500)}")
  }

  test("bigram surprisal spikes on a shuffled-word salad that the " +
    "unigram score cannot distinguish") {
    val s = spark; import s.implicits._
    // 8 fluent docs establish the bigram LM; doc 100 is doc 1's exact
    // words shuffled — same unigram profile, broken bigrams
    val fluent = "the quick brown fox jumps over the lazy dog"
    val salad = "fox the dog quick over jumps brown lazy the"
    val docs = ((1L to 8L).map(i => (i, fluent)) :+ (100L, salad))
      .toDF("doc_id", "text")
    val uni = TextOps.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uni(1L) == uni(100L),
      s"unigram must be blind to order: ${uni(1L)} vs ${uni(100L)}")
    val bi = TextOps.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bi(100L) > bi(1L),
      s"salad must score higher: fluent=${bi(1L)} salad=${bi(100L)}")
  }

  test("bigram surprisal: hand-computed on a two-doc corpus; " +
    "single-token docs are absent") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    // bigrams: doc1 = [a b, b a, a b], doc2 = [a b]
    // c(a b)=4? no: doc1 contributes 2×"a b"+1×"b a"; doc2 1×"a b"
    // c_ab: "a b"=3, "b a"=1; c_a: a=3, b=1
    // s("a b") = bitlen(3)-bitlen(3) = 0; s("b a") = bitlen(1)-bitlen(1) = 0
    val r = TextOps.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    assert(r(1L) == (3L, 0L), r.toString)
    assert(r(2L) == (1L, 0L), r.toString)
    assert(!r.contains(3L), "a 1-token doc has no bigram row")
  }
}
