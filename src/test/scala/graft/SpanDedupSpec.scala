package graft

import org.apache.spark.sql.functions._
import graft.ops.SpanDedup

/** Sub-document exact-span dedup: rolling-window geometry, the
  * occurs-twice-anywhere criterion (within-doc repeats count), the
  * overlapping-window island merge, and surviving-text hashing. */
class SpanDedupSpec extends SparkSpec {

  private def md5hex(s: String) =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def mk(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("spanHashes: n-k+1 rolling windows, short docs emit nothing") {
    val spans = SpanDedup.spanHashes(
      mk((1L, "a b c d e"), (2L, "x y")), "doc_id", "text", k = 3)
    val got = spans.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"))).toSet
    assert(got == Set((1L, 0), (1L, 1), (1L, 2))) // 5-3+1 windows, doc 2 dropped
  }

  test("identical spans hash equal across docs; distinct spans differ") {
    val spans = SpanDedup.spanHashes(
      mk((1L, "p q r s"), (2L, "z p q r")), "doc_id", "text", k = 3)
      .collect().map(r => ((r.getAs[Long]("doc_id"), r.getAs[Int]("pos")),
        r.getAs[Long]("h"))).toMap
    assert(spans((1L, 0)) == spans((2L, 1))) // both "p q r"
    assert(spans((1L, 1)) != spans((2L, 0)))
  }

  test("scrub removes a cross-doc duplicated span, merges overlap") {
    // "w1 w2 w3" duplicated across docs 1/2; in doc 1 positions 1 and
    // 2 both hit via the longer shared run "w0 w1 w2 w3" vs doc 2's
    // "w1 w2 w3" — overlapping windows must merge to ONE interval.
    val docs = mk(
      (1L, "a w1 w2 w3 b c"),
      (2L, "w1 w2 w3 x y z"),
      (3L, "u v w q r s"))
    val out = SpanDedup.scrub(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_spans") == 1L)
    assert(r1.getAs[Long]("n_removed") == 3L)
    assert(r1.getAs[String]("clean_md5") == md5hex("a b c"))
    val r2 = out(1)
    assert(r2.getAs[Long]("n_removed") == 3L)
    assert(r2.getAs[String]("clean_md5") == md5hex("x y z"))
    val r3 = out(2)
    assert(r3.getAs[Long]("n_spans") == 0L)
    assert(r3.getAs[Long]("n_removed") == 0L)
    assert(r3.getAs[String]("clean_md5") == md5hex("u v w q r s"))
  }

  test("within-doc repeat counts as duplicated; islands merge runs") {
    // "m n o" occurs twice INSIDE doc 1 (positions 0 and 4,
    // disjoint) — both removed, two islands.
    val docs = mk((1L, "m n o q m n o r"), (2L, "j k l f g h"))
    val out = SpanDedup.scrub(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_spans") == 2L)
    assert(r1.getAs[Long]("n_removed") == 6L)
    assert(r1.getAs[String]("clean_md5") == md5hex("q r"))
  }

  test("fully-duplicated doc scrubs to the empty-string hash") {
    val docs = mk((1L, "s t u"), (2L, "s t u"))
    val out = SpanDedup.scrub(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[String]("clean_md5") == md5hex("")))
    assert(out.forall(_.getAs[Long]("n_removed") == 3L))
  }

  test("adjacent duplicated windows coalesce: n_removed spans the union") {
    // docs 1/2 share the 4-token run "c1 c2 c3 c4": k=3 windows at
    // pos 0 and 1 overlap -> one island of length 4.
    val docs = mk(
      (1L, "c1 c2 c3 c4 d e"),
      (2L, "f g c1 c2 c3 c4"))
    val out = SpanDedup.scrub(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_spans") == 1L)
    assert(out(0).getAs[Long]("n_removed") == 4L)
    assert(out(0).getAs[String]("clean_md5") == md5hex("d e"))
    assert(out(1).getAs[String]("clean_md5") == md5hex("f g"))
  }

  test("scrubKeepFirst: canonical first occurrence survives") {
    // "p q r" in doc 1 @0 (canonical) and doc 2 @1: only the doc-2
    // copy is removed.
    val docs = mk((1L, "p q r a b"), (2L, "z p q r y"))
    val out = SpanDedup.scrubKeepFirst(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_removed") == 0L)
    assert(out(0).getAs[String]("clean_md5") == md5hex("p q r a b"))
    assert(out(1).getAs[Long]("n_removed") == 3L)
    assert(out(1).getAs[String]("clean_md5") == md5hex("z y"))
  }

  test("scrubKeepFirst within one doc: first copy stays, second goes") {
    val docs = mk((1L, "m n o q m n o"), (2L, "j k l f g"))
    val out = SpanDedup.scrubKeepFirst(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_md5") == md5hex("m n o q"))
  }

  test("incremental scrub equals one-shot scrub restricted to the batch") {
    val docs = mk(
      (1L, "dup a b c d e f g"), (2L, "x dup a b c d e f"),
      (3L, "only once in corpus u v w"), (4L, "x dup a b c d e z"),
      (5L, "totally fresh text here q r"), (6L, "x y z w u v t s"))
    val dir = graft.TempRoots
      .create("graft_spanst_spec") + "/spans"
    val hist1 = docs.filter(col("doc_id") <= 2)
    val hist2 = docs.filter(col("doc_id") > 2 && col("doc_id") <= 4)
    val batch = docs.filter(col("doc_id") > 4)
    SpanDedup.updateSpanStore(hist1, "doc_id", "text", 4, dir, 0L)
    SpanDedup.updateSpanStore(hist2, "doc_id", "text", 4, dir, 1L)
    val inc = SpanDedup.incrementalScrub(
        SpanDedup.readSpanStore(spark, dir), batch, "doc_id", "text", 4)
      .orderBy("doc_id").collect().map(_.toSeq)
    val full = SpanDedup.scrub(docs, "doc_id", "text", 4)
      .where(col("doc_id") > 4)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(inc.toSeq == full.toSeq)
  }

  test("plan contract: tokenization materializes once before the explode") {
    // The TokenSegments lesson: if CollapseProject inlines split()
    // into the gram lambda, the split re-evaluates per element —
    // O(tokens^2) per doc, the measured 12x/decade class. Pin that
    // the Generate's input projection carries ONE split and the
    // lambda references the materialized array, not the split.
    val docs = mk((1L, "a b c d e f g h i j"))
    val plan = SpanDedup.spanHashes(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString()
    val generateLine = plan.linesIterator
      .find(_.contains("Generate")).getOrElse(fail("no Generate node"))
    assert(!generateLine.contains("split("),
      s"split() inlined into the gram lambda:\n$generateLine")
    // and the whole scrub never degenerates to a cartesian product
    val scrubPlan = SpanDedup.scrub(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString()
    assert(!scrubPlan.contains("CartesianProduct"))
  }

  test("zero-row input yields an honest empty frame") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = SpanDedup.scrub(empty, "doc_id", "text", k = 3)
    assert(out.count() == 0L)
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_tokens", "n_spans", "n_removed", "clean_md5"))
  }
}
