package graft

import org.apache.spark.sql.functions._
import graft.ops.Contamination

/** Contamination semantics on a hand-built corpus: verbatim leaks
  * flag, partial overlap scores proportionally, clean docs pass, and
  * decontaminate removes exactly the flagged ids.
  */
class ContaminationSpec extends SparkSpec {

  private lazy val fixture = {
    val s = spark; import s.implicits._
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim copy of the eval doc -> every 5-gram hits
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      // shares one 5-gram window out of many
      (2L, "alpha beta gamma delta epsilon completely different tail words here now"),
      // same vocabulary, different order -> no shared 5-gram
      (3L, "theta eta zeta epsilon delta gamma beta alpha"),
      // unrelated
      (4L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    (corpus, evalDocs)
  }

  test("overlap stats: verbatim=1000 milli, partial proportional, clean=0") {
    val (corpus, evalDocs) = fixture
    val got = Contamination.overlapStats(corpus, evalDocs,
        "doc_id", "text", k = 5, flagAtMille = 500)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("contaminated_milli"), r.getAs[Int]("is_contaminated")))).toMap
    assert(got(1L) == ((1000L, 1)))
    assert(got(3L) == ((0L, 0)))
    assert(got(4L) == ((0L, 0)))
    // doc 2: 11 tokens -> 7 distinct 5-grams, exactly 1 in the eval set
    assert(got(2L) == ((1000L / 7, 0)))
  }

  test("decontaminate drops exactly the flagged docs, others untouched") {
    val (corpus, evalDocs) = fixture
    val survivors = Contamination.decontaminate(corpus, evalDocs,
      "doc_id", "text", k = 5, flagAtMille = 500)
    assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L, 4L))
    // all columns pass through unchanged
    assert(survivors.columns.toSeq == corpus.columns.toSeq)
  }
}
