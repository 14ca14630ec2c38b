package graft

import org.apache.spark.sql.functions._
import graft.ops.LineDedup

/** Cross-document boilerplate removal: segmentation geometry, the
  * distinct-doc frequency contract, and ordinal-ordered reassembly. */
class LineDedupSpec extends SparkSpec {

  private def mk(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("segments: fixed width, ragged tail, w=1 degenerates to tokens") {
    val s = spark; import s.implicits._
    val df = mk((1L, "a b c d e f g"))
    val segs = df.select(LineDedup.segments(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(segs == Seq("a b c", "d e f", "g"))
    val one = df.select(LineDedup.segments(col("text"), 1).as("s"))
      .as[Seq[String]].head()
    assert(one == Seq("a", "b", "c", "d", "e", "f", "g"))
  }

  test("within-doc repeats count once toward document frequency") {
    // "x y" appears twice in doc 1 but only doc 1 and 2 carry it:
    // df = 2, so minDocs = 3 must NOT flag it.
    val docs = mk(
      (1L, "x y x y"), (2L, "x y a b"), (3L, "c d e f"))
    val ex = LineDedup.explodeSegments(docs, "doc_id", "text", 2)
    val bp = LineDedup.boilerplate(ex, "doc_id", minDocs = 3)
    assert(bp.count() == 0L)
    val bp2 = LineDedup.boilerplate(ex, "doc_id", minDocs = 2)
    assert(bp2.select("seg").as(spark.implicits.newStringEncoder)
      .collect().toSet == Set("x y"))
  }

  test("scrub drops boilerplate, keeps ordinal order, hashes rebuilt text") {
    // "the cookie banner" (w=3 segment) is in all 3 docs -> stripped.
    val docs = mk(
      (1L, "the cookie banner alpha beta gamma"),
      (2L, "the cookie banner delta epsilon zeta"),
      (3L, "the cookie banner eta theta iota"))
    val out = LineDedup.scrub(docs, "doc_id", "text", w = 3, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val r1 = out.head
    assert(r1.getAs[Long]("n_segs") == 2L)
    assert(r1.getAs[Long]("kept_segs") == 1L)
    // rebuilt text for doc 1 is exactly the surviving segment
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r1.getAs[String]("new_md5") == expected)
  }

  test("fully-boilerplate doc scrubs to the empty-string hash") {
    val docs = mk((1L, "x y"), (2L, "x y"), (3L, "x y z w"))
    val out = LineDedup.scrub(docs, "doc_id", "text", w = 2, minDocs = 3)
      .orderBy("doc_id").collect()
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert(out(0).getAs[Long]("kept_segs") == 0L)
    assert(out(0).getAs[String]("new_md5") == emptyMd5)
    // doc 3 keeps its non-boilerplate tail segment
    assert(out(2).getAs[Long]("kept_segs") == 1L)
  }

  test("chain equivalence: incremental scrub over a segment store == " +
    "one-shot scrub of the union, restricted to the batch") {
    val all = mk(
      (1L, "the cookie banner alpha beta gamma"),
      (2L, "the cookie banner delta epsilon zeta"),
      (4L, "the cookie banner eta theta iota"),
      (5L, "unique one two three four five"),
      (3L, "the cookie banner kappa lambda mu"),
      (6L, "the cookie banner nu xi omicron"))
    val hist0 = all.filter(col("doc_id") % 3 === 1)
    val hist1 = all.filter(col("doc_id") % 3 === 2)
    val batch = all.filter(col("doc_id") % 3 === 0)
    val dir = graft.TempRoots
      .create("graft_segdf_spec") + "/segdf"
    LineDedup.updateSegmentStore(hist0, "doc_id", "text", 3, dir, 0L)
    LineDedup.updateSegmentStore(hist1, "doc_id", "text", 3, dir, 1L)
    val inc = LineDedup.incrementalScrub(
        LineDedup.readSegmentStore(spark, dir), batch,
        "doc_id", "text", w = 3, minDocs = 3)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val oneShot = LineDedup.scrub(all, "doc_id", "text", 3, 3)
      .filter(col("doc_id") % 3 === 0)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(inc == oneShot)
    // and the store really fed the lexicon: the batch alone has only
    // 2 "the cookie banner" docs, under minDocs - without history the
    // segment would survive
    val noHist = LineDedup.scrub(batch, "doc_id", "text", 3, 3)
      .orderBy("doc_id").collect()
    assert(noHist.forall(_.getAs[Long]("kept_segs") == 2L))
    assert(inc.forall(r => r(2) == 1L), s"history DF must scrub: $inc")
  }

  test("retried store batch is idempotent (dynamic partition overwrite)") {
    val docs = mk((1L, "x y z w"), (2L, "x y q r"))
    val dir = graft.TempRoots
      .create("graft_segdf_retry") + "/segdf"
    LineDedup.updateSegmentStore(docs, "doc_id", "text", 2, dir, 7L)
    LineDedup.updateSegmentStore(docs, "doc_id", "text", 2, dir, 7L)
    val store = LineDedup.readSegmentStore(spark, dir)
    assert(store.count() == store.select("seg").distinct().count(),
      "replayed batch must not duplicate its partition")
    assert(store.filter(col("seg") === "x y")
      .head().getAs[Long]("n_docs") == 2L)
  }

  test("plan: scrub join is hash-based (never nested-loop) and the " +
    "DF aggregate is two-phase partial") {
    val docs = mk((1L, "a b c d"), (2L, "a b e f"), (3L, "a b g h"))
    val plan = LineDedup.scrub(docs, "doc_id", "text", 2, 3)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"scrub must join on the segment key, not loop:\n$plan")
    // partial countDistinct: two HashAggregate pairs around Exchanges,
    // never a single-node distinct
    assert(plan.contains("HashAggregate"), plan)
  }

  test("reassembly orders by ordinal even when collection order differs") {
    // many segments per doc so collect_list arrival order is unlikely
    // to accidentally equal ordinal order across 4 shuffle partitions
    val body = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = mk((1L, body), (2L, "q r s t"))
    val out = LineDedup.scrub(docs, "doc_id", "text", w = 2, minDocs = 2)
      .filter(col("doc_id") === 1L).collect().head
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.getAs[String]("new_md5") == expected)
    assert(out.getAs[Long]("n_segs") == 20L)
  }
}
